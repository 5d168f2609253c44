"""BloomSpan Maximal-Frequent-Phrase miner, Spark-first.

Pipeline (SURVEY.md section 7; reference: corpus-miner/_ours/bloom_gram_miner.cpp):

  docs(doc_id, tokens)
    -> seed stream: explode n-gram occurrences              [codegen, no Python]
    -> candidate grams: groupBy(gram).countDistinct(doc)    [shuffle #1; Catalyst
       plans the distinct as partial dedup on (gram, doc) - uniformly
       distributed keys even for head grams == the north rule's salted keys]
    -> threshold df >= min_docs                             [corpus-statistics
       bounded: boilerplate TEMPLATES, not corpus rows]
    -> occurrence gather: seeds |X| broadcast(candidates),
       then join docs on doc_id to slice per-occurrence
       windows slice(tokens, pos+1, W) + prev token         [shuffle #2, linear]
    -> driver kernel: score-ordered greedy expansion +
       occupancy bitmask + backward closure (core/expand.py)

The driver step is the reference's inherently sequential stage F
(":595-706").  What reaches the driver is NOT the corpus: it is one row per
occurrence OF A SURVIVING CANDIDATE, each carrying a W-token window.  At web
scale the occurrence lists of head phrases grow with the corpus, so
``max_occs_per_gram`` caps the gathered postings per gram (deterministic
xxhash64 sampling) while the EXACT df keeps coming from shuffle #1; the cap
trades off bitmask fidelity only (phrase set/df stay exact for phrases whose
expansion path is support-dominated) and is off by default for the
byte-identical test posture.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from boilerplate_buster_spark.core.expand import (
    WCandidate,
    WOcc,
    WindowExhausted,
    expand_windowed,
)
from boilerplate_buster_spark.functions.ngrams import explode_ngrams

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("phrase", T.StringType(), False),
        T.StructField("freq", T.LongType(), False),
        T.StructField("length", T.IntegerType(), False),
        T.StructField("example_docs", T.ArrayType(T.StringType()), False),
    ]
)


def candidate_grams(
    docs: DataFrame, n: int, min_docs: int, doc_col: str, tokens_col: str
) -> DataFrame:
    """(gram, support): n-grams in >= min_docs distinct docs (stages A-D).
    Exact replacement of Bloom pass + word-DF gate + external merge
    (bloom_gram_miner.cpp:284-589) - those are approximations/spill machinery
    around exactly this aggregate."""
    seeds = explode_ngrams(docs, n, doc_col, tokens_col)
    return (
        seeds.groupBy("gram")
        .agg(F.countDistinct(doc_col).alias("support"))
        .filter(F.col("support") >= min_docs)
    )


def gather_windows(
    docs: DataFrame,
    cands: DataFrame,
    n: int,
    window: int,
    doc_col: str,
    tokens_col: str,
    max_occs_per_gram: int | None = None,
) -> DataFrame:
    """Per-occurrence windows for every candidate gram:
    (gram, support, doc_id, pos, prev, window).

    Candidate set is broadcast (small); the docs join is a linear shuffle on
    doc_col.  prev = token before the occurrence (backward-closure input,
    ":675-695"); window = W tokens from the occurrence start (expansion input).
    """
    seeds = explode_ngrams(docs, n, doc_col, tokens_col)
    occ = seeds.join(F.broadcast(cands), "gram")
    if max_occs_per_gram is not None:
        # Deterministic pseudo-random rank; keeps exact `support` from the
        # aggregate while bounding driver-bound postings per gram.
        from pyspark.sql import Window

        w = Window.partitionBy("gram").orderBy(F.xxhash64(doc_col, "pos"))
        occ = (
            occ.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= max_occs_per_gram)
            .drop("_rk")
        )
    return occ.join(docs, doc_col).select(
        "gram",
        "support",
        F.col(doc_col).cast("string").alias("doc_id"),
        "pos",
        # pos is 0-based; element_at is 1-based, so index `pos` IS pos-1.
        F.when(F.col("pos") > 0, F.expr(f"element_at({tokens_col}, pos)")).alias("prev"),
        F.expr(f"slice({tokens_col}, pos + 1, {window})").alias("window"),
    )


def mine(
    spark: SparkSession,
    docs: DataFrame,
    min_docs: int,
    ngrams: int,
    min_l: int | None = None,
    doc_col: str = "doc_id",
    tokens_col: str = "tokens",
    window: int = 64,
    max_occs_per_gram: int | None = None,
) -> list[WCandidate]:
    """Run the full miner; returns the final phrase list (driver-side, small).

    Retries with doubled W if a phrase outgrows the gathered windows."""
    if min_l is None:
        min_l = ngrams  # main.cpp:67
    docs = docs.select(doc_col, tokens_col)
    cands = candidate_grams(docs, ngrams, min_docs, doc_col, tokens_col)
    # cands is reused for the gather join - cache the (tiny) candidate table.
    cands = cands.cache()
    try:
        while True:
            rows = gather_windows(
                docs, cands, ngrams, window, doc_col, tokens_col, max_occs_per_gram
            ).collect()
            by_gram: dict[str, WCandidate] = {}
            occ_sort: dict[str, list] = defaultdict(list)
            for r in rows:
                if r["gram"] not in by_gram:
                    by_gram[r["gram"]] = WCandidate(r["gram"].split(" "), r["support"], [])
                occ_sort[r["gram"]].append(
                    (r["doc_id"], r["pos"], WOcc(r["doc_id"], r["pos"], r["prev"], r["window"]))
                )
            for gram, lst in occ_sort.items():
                lst.sort(key=lambda x: (x[0], x[1]))  # canonical occ order
                by_gram[gram].occs = [x[2] for x in lst]
            try:
                return expand_windowed(
                    list(by_gram.values()), min_docs, min_l, window=window
                )
            except WindowExhausted:
                window *= 2
    finally:
        cands.unpersist()


def phrases_to_df(spark: SparkSession, phrases: list[WCandidate]) -> DataFrame:
    """Canonical result DataFrame (deterministic projection of the CSV sink,
    corpus_miner.cpp:529-561): example_docs = first 2 of the sorted unique doc
    set (deviation: reference uses hash-set order)."""
    data = []
    for p in phrases:
        docs_in = sorted({str(o.doc_id) for o in p.occs})
        data.append((p.text, p.support, len(p.tokens), docs_in[:2]))
    data.sort(key=lambda r: (-r[1] * r[2], -r[1], r[0]))
    return spark.createDataFrame(data, RESULT_SCHEMA)


def mine_df(spark: SparkSession, docs: DataFrame, **kw) -> DataFrame:
    return phrases_to_df(spark, mine(spark, docs, **kw))
