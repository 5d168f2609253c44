"""Gopher / C4 heuristic filter suites and integer HITS.

The dialect-shared expression generators are proven by the driver oracle
(gopher_filters / c4_filters / hits_scores in __spark_entry__); these tests
pin the RULE SEMANTICS on hand-built documents where every expected value
is computable by eye, plus plan-shape and normalization invariants.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from boilerplate_buster_spark.operators.filters import (
    GOPHER_MIN_WORDS,
    c4_filters,
    gopher_filters,
)
from boilerplate_buster_spark.operators.weblinks import hits_scaled


def _doc(spark, text):
    return spark.createDataFrame([(0, text)], "doc_id: long, text: string")


GOOD = (
    "the quick brown fox jumps over the lazy dog and that was fine to "
    "watch because it did have style with plenty of room to spare "
) * 3  # 78 words, all alphabetic, stopword types: the/and/that/to/have/with/of


def test_gopher_clean_doc_keeps(spark):
    row = gopher_filters(_doc(spark, GOOD)).first()
    assert row["n_words"] == 78 >= GOPHER_MIN_WORDS
    assert row["alpha_frac_e6"] == 1_000_000
    assert row["symbol_ratio_e6"] == 0
    assert row["stopword_types"] >= 2
    assert row["keep"] is True


@pytest.mark.parametrize(
    "mutate, col, bad",
    [
        (lambda t: "word " * 10, "n_words", 10),  # under min word count
        (lambda t: t + " #" * 20, "symbol_ratio_e6", None),  # 20/98 > 10%
        (  # 10 of 11 non-blank lines start with a bullet: 909090 > 900000
            lambda t: t + ("\n- item" * 10),
            "bullet_frac_e6",
            909_090,
        ),
        (  # 2 of 4 lines end with ellipsis: 500000 > 300000
            lambda t: t + "\nplain line\nwait for it...\nmore to come…",
            "ellipsis_frac_e6",
            500_000,
        ),
        (  # numeric tokens dilute the alphabetic fraction below 80%
            lambda t: t + (" 12345" * 40),
            "alpha_frac_e6",
            None,
        ),
    ],
)
def test_gopher_rules_fire(spark, mutate, col, bad):
    row = gopher_filters(_doc(spark, mutate(GOOD))).first()
    assert row["keep"] is False
    if bad is not None:
        assert row[col] == bad


def test_gopher_mean_word_length_bounds(spark):
    long_words = " ".join(["extraordinarily"] * 60)  # mean 15 chars > 10
    row = gopher_filters(_doc(spark, long_words)).first()
    assert row["mean_word_len_e6"] == 15_000_000
    assert row["keep"] is False
    short = " ".join(["a", "ab"] * 30)  # mean 1.5 chars < 3
    row = gopher_filters(_doc(spark, short)).first()
    assert row["mean_word_len_e6"] == 1_500_000
    assert row["keep"] is False


C4_PAGE = (
    "A first proper sentence sits right here.\n"
    "short line.\n"  # only 2 words: dropped
    "no terminal punctuation on this line\n"  # dropped
    "This line needs javascript to render sadly.\n"  # dropped (javascript)
    "Another complete sentence follows the first!\n"
    "And a third one wraps the page up nicely.\n"
)


def test_c4_line_retention_and_keep(spark):
    row = c4_filters(_doc(spark, C4_PAGE)).first()
    assert row["n_kept_lines"] == 3
    assert row["n_sentences"] == 3  # . ! .
    assert not row["has_brace"] and not row["has_lorem"]
    assert row["keep"] is True


@pytest.mark.parametrize(
    "suffix, flag",
    [
        ("\nif (x) { y(); }", "has_brace"),
        ("\nLorem Ipsum dolor sit amet.", "has_lorem"),
    ],
)
def test_c4_page_drop_flags(spark, suffix, flag):
    row = c4_filters(_doc(spark, C4_PAGE + suffix)).first()
    assert row[flag] is True
    assert row["keep"] is False


def test_c4_badword_is_space_bounded(spark):
    bw = ("crust",)
    # substring inside a word must NOT match; the bare word must
    clean = c4_filters(_doc(spark, C4_PAGE + "\ncrusty bread is good."), badwords=bw)
    assert clean.first()["has_badword"] is False
    dirty = c4_filters(_doc(spark, C4_PAGE + "\nthe crust was burnt."), badwords=bw)
    assert dirty.first()["has_badword"] is True


def test_c4_badword_with_apostrophe_and_backslash(spark):
    # caller-supplied blocklist entries must be escaped, not interpolated
    # raw: "ain't" (apostrophe) and a literal backslash word both parse
    bw = ("ain't", "back\\slash")
    dirty = c4_filters(
        _doc(spark, C4_PAGE + "\nthat ain't right at all."), badwords=bw
    )
    assert dirty.first()["has_badword"] is True
    clean = c4_filters(_doc(spark, C4_PAGE), badwords=bw)
    assert clean.first()["has_badword"] is False
    # the duckdb rendering of the same rule must be valid SQL too
    import duckdb

    from boilerplate_buster_spark.operators.filters import c4_exprs

    exprs = dict(c4_exprs("text", bw, "duckdb"))
    got = duckdb.sql(
        f"SELECT {exprs['has_badword']} AS b FROM "
        "(SELECT 'so that ain''t good folks' AS text)"
    ).fetchone()[0]
    assert got is True


def test_c4_too_few_sentences_drops(spark):
    row = c4_filters(_doc(spark, "Just one good sentence lives here.\n")).first()
    assert row["n_sentences"] == 1
    assert row["keep"] is False


def test_filters_are_pure_maps(spark):
    # no Exchange anywhere: the whole suite must stay a scan-side projection
    for op in (gopher_filters, c4_filters):
        plan = op(_doc(spark, GOOD))._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


def _edges(spark, rows):
    return spark.createDataFrame(
        [(s, d, "") for s, d in rows], "url: string, href: string, anchor: string"
    )


def test_hits_hub_and_authority_separate(spark):
    # classic bipartite: h1,h2 each link to a1,a2 (h* pure hubs, a* pure
    # authorities); one stray edge a1->h1 gives the other side tiny mass
    rows = [("h1", "a1"), ("h1", "a2"), ("h2", "a1"), ("h2", "a2"), ("a1", "h1")]
    out = {r["node"]: r for r in hits_scaled(_edges(spark, rows), iters=2).collect()}
    assert out["h1"]["hub"] > out["a1"]["hub"]
    assert out["a1"]["auth"] > out["h1"]["auth"]
    assert out["a1"]["auth"] >= out["a2"]["auth"]  # a1 has the extra in-edge? no: equal in-degree
    assert out["h2"]["auth"] <= out["a2"]["auth"]


def test_hits_l1_normalized_to_base(spark):
    rows = [("u", f"v{i}") for i in range(5)] + [("w", "v0"), ("v0", "u")]
    base = 1_000_000
    out = hits_scaled(_edges(spark, rows), iters=3, base=base).collect()
    s_hub = sum(r["hub"] for r in out)
    s_auth = sum(r["auth"] for r in out)
    # integer div floors each share: sums land within n_nodes of base
    assert base - len(out) <= s_hub <= base
    assert base - len(out) <= s_auth <= base


def test_hits_deterministic_across_partitionings(spark):
    rows = [(f"s{i % 7}", f"t{(i * 3) % 11}") for i in range(40)]
    e = _edges(spark, rows)
    a = sorted(map(tuple, hits_scaled(e.repartition(1), iters=2).collect()))
    b = sorted(map(tuple, hits_scaled(e.repartition(16), iters=2).collect()))
    assert a == b


# --- script mix + corpus composition (same round-5 curation batch) --------

def test_script_mix_counts_and_dominant(spark):
    from boilerplate_buster_spark.operators.text_stats import script_mix

    row = script_mix(_doc(spark, "abc привет")).first()
    assert row["n_chars"] == 9
    assert row["latin_frac_e6"] == 3_000_000 // 9 * 1  # 333333
    assert row["cyrillic_frac_e6"] == 6_000_000 // 9
    assert row["dominant_script"] == "cyrillic"
    # tie resolves to _SCRIPT_ORDER (latin first)
    tie = script_mix(_doc(spark, "ab яю")).first()
    assert tie["dominant_script"] == "latin"
    none = script_mix(_doc(spark, "123 456")).first()
    assert none["dominant_script"] == "other"


def test_script_mix_is_pure_map(spark):
    from boilerplate_buster_spark.operators.text_stats import script_mix

    plan = script_mix(_doc(spark, "x"))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_corpus_composition_exact_shares(spark):
    from boilerplate_buster_spark.operators.corpus_stats import corpus_composition

    df = spark.createDataFrame(
        [(0, "a b c", "en", "s1"), (1, "d e", "en", "s1"), (2, "f", "de", "s2")],
        "doc_id: long, text: string, lang: string, source: string",
    )
    rows = {(r["lang"], r["source"]): r for r in corpus_composition(df).collect()}
    en = rows[("en", "s1")]
    assert (en["n_docs"], en["n_tokens"]) == (2, 5)
    assert en["doc_share_e6"] == 666_666  # 2/3 floored
    assert en["token_share_e6"] == 833_333  # 5/6 floored
    de = rows[("de", "s2")]
    assert (de["n_docs"], de["n_tokens"]) == (1, 1)
    # floored shares never exceed the whole
    assert sum(r["doc_share_e6"] for r in rows.values()) <= 1_000_000


# --- ccnet buckets + crawl frontier ---------------------------------------

def test_ccnet_buckets_exact_thirds(spark):
    from boilerplate_buster_spark.operators.lm import ccnet_buckets

    rows = [(i, "en", i * 10_000) for i in range(1, 10)]  # 9 docs, 9 buckets
    scores = spark.createDataFrame(rows, "doc_id: long, lang: string, lik_e6: long")
    out = {r["doc_id"]: r["bucket"] for r in ccnet_buckets(scores).collect()}
    assert [out[i] for i in range(1, 10)] == (
        ["tail"] * 3 + ["middle"] * 3 + ["head"] * 3
    )


def test_ccnet_boundary_bucket_resolves_down(spark):
    from boilerplate_buster_spark.operators.lm import ccnet_buckets

    # every doc in ONE bucket: t_lo = t_hi = that bucket -> all 'tail'
    rows = [(i, "en", 42) for i in range(6)]
    scores = spark.createDataFrame(rows, "doc_id: long, lang: string, lik_e6: long")
    assert {r["bucket"] for r in ccnet_buckets(scores).collect()} == {"tail"}


def test_ccnet_buckets_per_language_thresholds(spark):
    from boilerplate_buster_spark.operators.lm import ccnet_buckets

    # de scores sit far below en scores; a global threshold would dump all
    # of de into tail — per-lang thresholds must still split de into thirds
    rows = [(i, "en", 1_000_000 + i * 10_000) for i in range(9)] + [
        (100 + i, "de", i * 10_000) for i in range(9)
    ]
    scores = spark.createDataFrame(rows, "doc_id: long, lang: string, lik_e6: long")
    out = {r["doc_id"]: r["bucket"] for r in ccnet_buckets(scores).collect()}
    assert out[108] == "head" and out[100] == "tail"
    assert out[8] == "head" and out[0] == "tail"


def test_crawl_frontier_stages(spark):
    from boilerplate_buster_spark.operators.urls import (
        crawl_frontier,
        parse_robots_df,
    )

    cands = spark.createDataFrame(
        [
            ("https://a.com/ok", 5),
            ("https://a.com/ok?utm_source=x", 9),  # collapses, max prio wins
            ("https://a.com/private/x", 9),  # robots-disallowed
            ("https://b.com/page", 3),  # blocklisted host
            ("https://a.com/p1", 2),
            ("https://a.com/p2", 1),
            ("https://a.com/p3", 1),  # prio tie, url asc: rank 4 > cap 3
        ],
        "url: string, priority_e1: long",
    )
    rules = parse_robots_df(
        spark.createDataFrame(
            [("a.com", "User-agent: *\nDisallow: /private\n")],
            "host: string, robots_txt: string",
        )
    )
    blocked = spark.createDataFrame([("b.com",)], "host: string")
    out = crawl_frontier(cands, rules, blocked, "AnyBot", per_host_cap=3)
    rows = {r["url"]: r for r in out.collect()}
    assert set(rows) == {"https://a.com/ok", "https://a.com/p1", "https://a.com/p2"}
    assert rows["https://a.com/ok"]["priority_e1"] == 9  # max over variants
    assert rows["https://a.com/ok"]["rank"] == 1


def test_code_signals_hand_computed(spark):
    from boilerplate_buster_spark.operators.filters import code_signals

    docs = spark.createDataFrame(
        [
            (1, "def f(x) { return x; } x = 1; import os"),
            (2, "plain prose about the weather today"),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in code_signals(docs).collect()}
    c = got[1]
    # tokens: def f(x) { return x; } x = 1; import os -> 12 words
    assert (c.n_braces, c.n_semicolons, c.n_equals) == (2, 2, 1)
    assert c.kw_hits == 3  # def, return, import ('x;' and '1;' don't count)
    assert c.code_score_e6 == (1000000 * (2 + 2 + 3)) // c.n_words
    assert c.is_code
    p = got[2]
    assert (p.n_braces, p.kw_hits, p.code_score_e6, bool(p.is_code)) == (
        0, 0, 0, False)
