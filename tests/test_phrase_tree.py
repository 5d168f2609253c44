"""Phrase-tree post-processing (T2-T5, P7, P8) vs the reference semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from boilerplate_buster_spark.operators.phrase_tree import (
    build_tree,
    generate_html_tree,
    link_parents,
    normalize_phrase,
    with_viz_score,
)

PHRASES = [
    ("please notify the sender", 4, 4),
    ("notify the sender", 5, 3),
    ("the sender", 9, 2),
    ("completely unrelated words here", 2, 4),
]


def test_normalize_phrase(spark):
    df = spark.createDataFrame([("  Foo   BAR baz ",)], ["phrase"])
    assert df.select(normalize_phrase().alias("p")).first()["p"] == "foo bar baz"


def test_link_parents_longest_suffix_preferred(spark):
    df = spark.createDataFrame(PHRASES, ["phrase", "freq", "length"])
    got = {r["phrase"]: r["parent"] for r in link_parents(df).collect()}
    # longest proper suffix present wins (drop=1)
    assert got["please notify the sender"] == "notify the sender"
    assert got["notify the sender"] == "the sender"
    # 2-word phrase: drop range empty -> no parent (parent must keep >=2 words)
    assert got["the sender"] is None
    assert got["completely unrelated words here"] is None


def test_link_parents_prefix_fallback(spark):
    df = spark.createDataFrame(
        [("a b c d", 1, 4), ("a b c", 1, 3)], ["phrase", "freq", "length"]
    )
    got = {r["phrase"]: r["parent"] for r in link_parents(df).collect()}
    # suffix 'b c d' absent; prefix 'a b c' present at the same drop
    assert got["a b c d"] == "a b c"


def test_build_tree_levels_match_link_parents(spark):
    items = build_tree(PHRASES)
    by_phrase = {r["phrase"]: r for r in items}
    assert by_phrase["the sender"]["level"] == 0
    assert by_phrase["notify the sender"]["level"] == 1
    assert by_phrase["please notify the sender"]["level"] == 2
    df = spark.createDataFrame(PHRASES, ["phrase", "freq", "length"])
    linked = {r["phrase"]: r["parent"] for r in link_parents(df).collect()}
    for r in items:
        want = linked[r["phrase"]]
        got = items[r["parent_id"]]["phrase"] if r["parent_id"] is not None else None
        assert got == want, r["phrase"]


def test_viz_score_matches_reference_formula(spark):
    df = spark.createDataFrame(PHRASES, ["phrase", "freq", "length"])
    rows = with_viz_score(df).collect()
    import math

    max_l, max_f = 4, 9
    for r in rows:
        want = math.sqrt(
            (1 - r["length"] / max_l) ** 2
            + (1 - math.log1p(r["freq"]) / math.log1p(max_f)) ** 2
        )
        assert abs(r["score"] - want) < 1e-12


def test_html_tree_renders():
    # linear chain -> ladder compression collapses to the deepest node
    html = generate_html_tree(PHRASES)
    assert "please notify the sender" in html
    assert "<details>" not in html  # nothing branches after compression
    # branching node -> <details> stays, children render inside
    branching = [
        ("the sender", 9, 2),
        ("notify the sender", 5, 3),
        ("dear the sender", 4, 3),
    ]
    html2 = generate_html_tree(branching)
    assert "<details>" in html2
    assert "notify" in html2 and "dear" in html2
