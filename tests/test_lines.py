"""CCNet-style line dedup + Gopher repetition signals: hand-computed
fixtures, one-row-per-doc guarantee, order preservation, exact integer
ratios."""

from pyspark.sql import functions as F

from boilerplate_buster_spark.operators.lines import (
    line_doc_freq,
    remove_boilerplate_lines,
    repetition_signals,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "unique alpha\ncookie banner\nunique beta"),
            (2, "cookie banner\nunique gamma\ncookie banner"),
            (3, "cookie banner"),
            (4, "unique delta\n\nunique epsilon"),
        ],
        ["doc_id", "text"],
    )


def test_line_doc_freq_distinct_docs(spark):
    got = {r["line"]: r["df"] for r in line_doc_freq(_docs(spark)).collect()}
    # intra-doc repeat in doc 2 counts once; empty line in doc 4 ignored
    assert got["cookie banner"] == 3
    assert got["unique alpha"] == 1 and got["unique epsilon"] == 1
    assert "" not in got


def test_remove_boilerplate_lines_order_and_sentinel(spark):
    out = {
        r["doc_id"]: r["clean_text"]
        for r in remove_boilerplate_lines(_docs(spark), min_df=3).collect()
    }
    assert out[1] == "unique alpha\nunique beta"  # order preserved
    assert out[2] == "unique gamma"
    assert out[3] == ""  # all-boilerplate doc keeps its row
    assert out[4] == "unique delta\nunique epsilon"  # empty line dropped
    assert set(out) == {1, 2, 3, 4}


def test_remove_no_frequent_lines_is_identity_modulo_empties(spark):
    out = {
        r["doc_id"]: r["clean_text"]
        for r in remove_boilerplate_lines(_docs(spark), min_df=10).collect()
    }
    assert out[1] == "unique alpha\ncookie banner\nunique beta"


def test_repetition_signals_exact(spark):
    docs = spark.createDataFrame(
        [
            # lines: [a, a, b] -> dup frac = 1e6 * 1 div 3
            # tokens: x y x y -> top 2-gram "x y" cnt 2... grams: "x y","y x","x y"
            (1, "a\na\nb", ["x", "y", "x", "y"]),
            # no dup lines; single token -> no grams -> 0
            (2, "only", ["solo"]),
        ],
        ["doc_id", "text", "tokens"],
    )
    got = {r["doc_id"]: r for r in repetition_signals(docs, ngram=2).collect()}
    assert got[1]["dup_line_frac_e6"] == 1000000 // 3
    # top gram "x y" (cnt 2, ties none), chars = len("xy")*2... formula:
    # 1e6 * token-chars("x y")=2 * 2 div len("xyxy") = 1e6*2*2 div 4
    assert got[1]["top_ngram_char_frac_e6"] == (1000000 * 2 * 2) // 4
    assert got[2]["dup_line_frac_e6"] == 0
    assert got[2]["top_ngram_char_frac_e6"] == 0


def test_repetition_tie_breaks_lexicographic(spark):
    # grams "b b" and "a a" both cnt 1 -> smallest gram "a a" wins
    docs = spark.createDataFrame(
        [(1, "t", ["a", "a", "b", "b"])], ["doc_id", "text", "tokens"]
    )
    r = repetition_signals(docs, ngram=2).collect()[0]
    # grams: "a a", "a b", "b b" each cnt 1 -> top = "a a" (token-chars 2, cnt 1)
    assert r["top_ngram_char_frac_e6"] == (1000000 * 2 * 1) // 4


def test_contamination_flags_exact(spark):
    from boilerplate_buster_spark.operators.lines import contamination_flags

    docs = spark.createDataFrame(
        [
            (1, ["the", "quick", "brown", "fox"]),
            (2, ["quick", "brown", "cat", "runs"]),
            (3, ["totally", "clean", "doc", "here"]),
        ],
        ["doc_id", "tokens"],
    )
    out = {
        r["doc_id"]: (r["n_contaminated"], r["contaminated"])
        for r in contamination_flags(
            docs, ["the quick brown", "quick brown cat"], ngram=3
        ).collect()
    }
    assert out[1] == (1, True)
    assert out[2] == (1, True)
    assert out[3] == (0, False)
    # overlapping matches each count per POSITION
    d2 = spark.createDataFrame([(9, ["a", "b", "a", "b", "a", "b"])], ["doc_id", "tokens"])
    r = contamination_flags(d2, ["a b"], ngram=2).collect()[0]
    assert r["n_contaminated"] == 3


def test_line_dedup_plan_shape(spark):
    """Scale posture, plan-asserted: the anti-join side is broadcast (no
    shuffle of the corpus for matching) and the whole operator has at most
    two Exchanges (line-DF aggregate + per-doc rebuild)."""
    docs = _docs(spark)
    plan = (
        remove_boilerplate_lines(docs, min_df=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    # shuffle exchanges only: one for the line-DF aggregate, one for the
    # per-doc rebuild; the corpus is never shuffled for the matching
    assert plan.count("Exchange hashpartitioning") <= 2


def test_separator_with_regex_metachar_is_literal(spark):
    # split()'s second arg is a Java regex: a '.' separator must split on
    # literal dots only, not on every character
    docs = spark.createDataFrame(
        [(1, "dup.dup.keep", ["x"]), (2, "a|b.a|b", ["x"])],
        ["doc_id", "text", "tokens"],
    )
    out = {
        r["doc_id"]: r["clean_text"]
        for r in remove_boilerplate_lines(
            docs, min_df=2, sep="."
        ).collect()
    }
    # "dup" appears in one doc twice (counts once) -> df 1; "a|b" df 1; no
    # line reaches df>=2, so reconstruction is identity with '.' separator
    assert out[1] == "dup.dup.keep"
    assert out[2] == "a|b.a|b"


def test_dedup_lines_in_doc_first_occurrence_order(spark):
    from boilerplate_buster_spark.operators.lines import dedup_lines_in_doc

    df = spark.createDataFrame(
        [
            (1, "a\nb\na\nc\nb\nd"),  # dups out of order
            (2, "x\nx\nx"),           # all-dup run
            (3, ""),                  # empty doc survives as a row
            (4, "one"),               # single line untouched
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in dedup_lines_in_doc(df).collect()}
    assert len(got) == 4  # one row per input doc
    assert (got[1].n_lines, got[1].n_dup_lines, got[1].clean_text) == (
        6, 2, "a\nb\nc\nd")
    assert (got[2].n_lines, got[2].n_dup_lines, got[2].clean_text) == (
        3, 2, "x")
    assert (got[3].n_lines, got[3].n_dup_lines, got[3].clean_text) == (
        0, 0, "")
    assert (got[4].n_lines, got[4].n_dup_lines, got[4].clean_text) == (
        1, 0, "one")


def test_dedup_lines_in_doc_is_pure_projection(spark):
    from boilerplate_buster_spark.operators.lines import dedup_lines_in_doc

    df = spark.createDataFrame([(1, "a\nb")], ["doc_id", "text"])
    plan = dedup_lines_in_doc(df)._jdf.queryExecution().executedPlan().toString()
    # within-row semantics: the whole stage must be shuffle-free
    assert "Exchange" not in plan
