"""Hashed-bag-of-ngrams document scoring: fastText-style linear
classifier INFERENCE and DSIR-style importance weighting - the two
model-driven curation stages modern pipelines run after rule-based
filters (FineWeb-Edu classifies every page with a quality classifier;
DSIR (Xie et al. 2023) reweights raw data toward a target domain with
hashed n-gram statistics).

Both operators share one feature map: a document's unigrams + bigrams
hashed into B buckets with the portable 60-bit md5 hash (h60), so a SQL
oracle reproduces the features bit-for-bit.  Scores are integer-exact:

  * classifier: score(c) = sum over gram buckets of W[bucket, c], with
    integer weights; prediction = argmax (ties -> smallest class id).
    (Real fastText averages embeddings then applies a linear layer +
    softmax; the argmax of a linear model is invariant to the mean
    division and softmax, so integer sums carry the decision exactly.)
  * DSIR: per-bucket target / raw occurrence probabilities p_e6 =
    (count * 1e6) div total, importance surface = sum over the doc's
    gram buckets of (p_target_e6 - p_raw_e6).  (The paper sums hashed
    log-ratios; logs are not cross-engine bit-stable, so the oracle
    surface sums probability differences instead - same sign structure:
    buckets overrepresented in the target push positive.  Documented
    deviation, same as lm.py's lik_e6.)

Scale posture: the feature explode is linear in corpus tokens; bucket
tables are B-bounded (the whole point of feature hashing), so the model
side always BROADCASTS; the only corpus-sized shuffle is the per-doc
score aggregation.  No reference anchor (the reference is a phrase
miner); mirrors public fastText / DSIR practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from boilerplate_buster_spark.operators.text_stats import h60


def _gram_buckets(
    docs: DataFrame,
    buckets: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """(id, bucket): one row per unigram and bigram OCCURRENCE, hashed
    into ``buckets`` feature buckets.  Bigrams are space-joined before
    hashing, so 'a b' the bigram and 'a b' two unigrams land in
    different rows but identical strings share buckets (the standard
    hashing-trick collision semantics)."""
    t = tokens_col
    grams = (
        f"concat(cast({t} AS array<string>), "
        f"transform(slice(sequence(1, greatest(size({t}) - 1, 1)), "
        f"1, greatest(size({t}) - 1, 0)), "
        f"i -> array_join(slice({t}, i, 2), ' ')))"
    )
    return docs.select(
        F.col(id_col), F.explode(F.expr(grams)).alias("g")
    ).select(
        id_col, F.expr(f"pmod({h60('g')}, {int(buckets)})").alias("bucket")
    )


def classify_docs(
    docs: DataFrame,
    weights: DataFrame,
    n_classes: int,
    buckets: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """(id, label, score): linear hashed-ngram classifier inference.
    ``weights`` is (bucket, class, w) with integer w - model-sized (at
    most buckets * n_classes rows), always broadcast.  label = argmax
    class by summed weight, ties to the smallest class id; score = the
    winning sum.  Buckets absent from the weight table contribute 0; a
    document with no grams scores class 0 with score 0."""
    nc = int(n_classes)
    # densify the (model-sized) weight table into ONE row per bucket with
    # an n_classes-long weight ARRAY (absent (bucket, class) pairs weigh
    # 0, same implicit-zero semantics as the previous per-class densify):
    # the broadcast join then matches each feature row ONCE instead of
    # n_classes times, and the per-class sums ride a SINGLE per-doc
    # aggregate - the previous shape tripled the post-join row count and
    # aggregated twice (groupBy(id, class) + groupBy(id))
    dense = (
        weights.groupBy("bucket")
        .agg(F.collect_list(F.struct("class", "w")).alias("_cw"))
        .select(
            "bucket",
            F.expr(
                f"transform(sequence(0, {nc - 1}), c -> "
                f"aggregate(filter(_cw, s -> s.class = c), "
                f"cast(0 AS bigint), (acc, s) -> acc + s.w))"
            ).alias("ws"),
        )
    )
    feats = _gram_buckets(docs, buckets, id_col, tokens_col)
    sums = (
        feats.join(F.broadcast(dense), "bucket")
        .groupBy(id_col)
        .agg(*[
            F.sum(F.expr(f"ws[{c}]")).alias(f"_s{c}") for c in range(nc)
        ])
    )
    # argmax with ties to the smallest class id = max over (sum, -class)
    best_struct = (
        "array_max(array("
        + ", ".join(f"struct(_s{c} AS s, {-c} AS nc)" for c in range(nc))
        + "))"
    )
    best = sums.select(F.col(id_col), F.expr(best_struct).alias("b"))
    # rejoin against all input ids: docs whose every bucket missed the
    # weight table (or with no tokens) would otherwise vanish
    return (
        docs.select(id_col)
        .join(best, id_col, "left")
        .select(
            id_col,
            F.coalesce(-F.col("b.nc"), F.lit(0)).cast("int").alias("label"),
            F.coalesce(F.col("b.s"), F.lit(0)).cast("long").alias("score"),
        )
    )


def hashed_bucket_probs(
    docs: DataFrame,
    buckets: int,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """(bucket, p_e6): per-bucket occurrence probability of a corpus'
    hashed unigram+bigram features, p_e6 = (count * 1e6) div total.
    B-bounded output - the broadcastable corpus statistic DSIR needs."""
    feats = _gram_buckets(docs, buckets, id_col, tokens_col)
    # persisted (B-bounded): the total collect and the returned frame's
    # consumption would otherwise each re-run the corpus-sized explode
    counts = feats.groupBy("bucket").agg(F.count("*").alias("c")).persist()
    total = counts.agg(F.sum("c")).collect()[0][0] or 1
    return counts.select(
        "bucket", F.expr(f"(c * 1000000) div {int(total)}").alias("p_e6")
    )


def dsir_importance(
    docs: DataFrame,
    target_probs: DataFrame,
    raw_probs: DataFrame,
    buckets: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """(id, n_grams, imp_e6): DSIR-style importance surface - for each
    document, the sum over its hashed gram occurrences of
    (p_target_e6 - p_raw_e6).  Both probability tables are B-bounded
    and broadcast; the corpus shuffles once for the per-doc sum.
    Positive imp_e6 = the document looks more like the target domain
    than the raw corpus."""
    t = target_probs.select("bucket", F.col("p_e6").alias("pt"))
    r = raw_probs.select("bucket", F.col("p_e6").alias("pr"))
    feats = _gram_buckets(docs, buckets, id_col, tokens_col)
    scored = (
        feats.join(F.broadcast(t), "bucket", "left")
        .join(F.broadcast(r), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(
                F.coalesce(F.col("pt"), F.lit(0))
                - F.coalesce(F.col("pr"), F.lit(0))
            ).alias("imp_e6"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce(F.col("imp_e6"), F.lit(0)).cast("long").alias("imp_e6"),
        )
    )
