"""Physical-plan hygiene tests (SURVEY.md section 4): the operators must
compile to the plans we designed for 100 TB - map-side combine before the
exchange, two-level distinct aggregation (Catalyst's built-in analog of salted
keys), parquet filter pushdown + column pruning, and whole-stage codegen on
the hot path."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from boilerplate_buster_spark.operators import corpus_stats
from boilerplate_buster_spark.operators.bloomspan import candidate_grams


def explain_str(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def toy_docs(spark):
    return spark.createDataFrame(
        [(1, ["a", "b", "c"]), (2, ["a", "b", "d"])], ["doc_id", "tokens"]
    )


def test_word_df_partial_aggregation(spark):
    plan = explain_str(corpus_stats.word_doc_freq(toy_docs(spark)))
    # two HashAggregates around one exchange: map-side combine happens
    assert plan.count("HashAggregate") >= 2
    assert "partial_count" in plan
    assert "hashpartitioning(word" in plan
    # no per-row Python anywhere on the hot path
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ngram_df_dedups_before_shuffle(spark):
    plan = explain_str(corpus_stats.ngram_doc_freq(toy_docs(spark), 2))
    # intra-doc dedup is array_distinct INSIDE the doc row (before explode),
    # so the aggregate is a plain count - no expensive distinct rewrite
    assert "array_distinct" in plan
    assert plan.count("HashAggregate") >= 2


def test_candidate_grams_dedup_and_gate_before_shuffle(spark):
    plan = explain_str(
        candidate_grams(toy_docs(spark), 2, 1, "doc_id", "tokens"), mode="simple"
    )
    # distinct-doc support WITHOUT a distinct-aggregate rewrite: per-doc
    # array_distinct collapses repeats map-side, the agg is a plain count
    # with partial aggregation before the exchange
    assert "array_distinct" in plan
    assert plan.count("HashAggregate") >= 2
    assert "partial_count" in plan or "count(1)" in plan
    # the reference's word-DF gate (P3) runs inside the scan: per-token
    # xxhash64 membership materialized once as the _ok boolean array
    assert "xxhash64" in plan
    assert "_ok" in plan


def test_parquet_pushdown_and_pruning(spark):
    df = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("lang") == "en")
        .select("doc_id")
    )
    plan = explain_str(df)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    # column pruning: scan reads only the two needed columns
    assert "doc_id" in plan.split("ReadSchema")[1][:200]
    assert "text" not in plan.split("ReadSchema")[1][:200]
