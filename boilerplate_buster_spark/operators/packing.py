"""Training-set assembly: weighted corpus mixing and fixed-length
sequence packing - the last two stages between a cleaned corpus and a
training run (Pile/Dolma-style source mixing; every LLM trainer packs
documents into fixed-length token sequences).

Both are INTEGER-DETERMINISTIC by construction (portable 60-bit md5
Bernoulli for mixing; integer prefix sums for packing), so SQL oracles
reproduce them bit-for-bit and re-runs at any parallelism produce
identical training sets - the reproducibility property data pipelines
actually need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from boilerplate_buster_spark.operators.text_stats import h60


def weighted_corpus_mix(
    docs: DataFrame,
    weights_e6: dict[str, int],
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rows kept with per-source probability weight_e6/1e6, decided by a
    SEEDED portable hash of (source, id) - deterministic across runs,
    partitionings and engines (no RNG state, no sampleBy non-determinism).
    Sources absent from the map are dropped (weight 0).  Pure filter in the
    scan - no shuffle."""
    case = "CASE " + " ".join(
        f"WHEN {source_col} = '{s}' THEN {int(w)}"
        for s, w in sorted(weights_e6.items())
    ) + " ELSE 0 END"
    coin = h60(f"concat({source_col}, '#', CAST({id_col} AS string))")
    return docs.filter(F.expr(f"pmod({coin}, 1000000) < {case}"))


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    bucket: int = 4096,
) -> DataFrame:
    """(id, n_tokens, start_offset, first_seq, last_seq): where each
    document's tokens land when the corpus is concatenated in id order and
    chunked into fixed seq_len training sequences.

    Distributed prefix sum WITHOUT a global window (a single-partition
    orderBy window is the classic scale-killer here): ids are range-
    bucketed (bucket = id div `bucket`), per-bucket token sums aggregate to
    the driver (one row per bucket - a corpus-STATISTICS collect, ~#docs /
    4096 rows), the driver prefix-sums the bucket offsets and broadcasts
    them back, and the within-bucket exclusive prefix sum runs as parallel
    per-bucket windows.  Same two-phase scan-then-offset shape a
    1000-executor job would use."""
    spark = docs.sparkSession
    d = docs.select(
        F.col(id_col),
        F.size(tokens_col).alias("n"),
        (F.col(id_col).cast("long") / bucket).cast("long").alias("b"),
    )
    bucket_sums = (
        d.groupBy("b").agg(F.sum("n").alias("bn")).orderBy("b").collect()
    )
    running = 0
    offsets = []
    for r in bucket_sums:
        offsets.append((r["b"], running))
        running += r["bn"]
    off_df = F.broadcast(
        spark.createDataFrame(offsets, "b long, boff long")
    )
    w = (
        Window.partitionBy("b")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.withColumn("prev", F.coalesce(F.sum("n").over(w), F.lit(0)))
        .join(off_df, "b")
        .select(
            id_col,
            F.col("n").cast("long").alias("n_tokens"),
            (F.col("boff") + F.col("prev")).alias("start_offset"),
            F.expr(f"(boff + prev) div {seq_len}").alias("first_seq"),
            F.expr(
                f"(boff + prev + greatest(n, 1) - 1) div {seq_len}"
            ).alias("last_seq"),
        )
    )
