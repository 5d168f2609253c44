"""CSV-as-corpus reader (S3 in SURVEY.md section 2.1).

Reference semantics (corpus_miner.cpp:249-374): RFC-ish quoted CSV; ALL
fields of a row are joined with single spaces into one document
(":281-284"); docs named `row_<i>` in row order (":337"); `--csv-delimiter`
configurable; optional sampling (S4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    sampling: float | None = None,
    seed: int = 42,
) -> DataFrame:
    """-> (doc_id='row_<i>', text=fields joined with spaces).

    Row ids follow file order (the reference numbers rows as parsed); Spark's
    text-file line order within a file is preserved per partition, so ids are
    assigned via a monotonic id over the original order at small file counts
    - deterministic for the single-file fixtures the mode exists for."""
    raw = (
        spark.read.option("header", "false")
        .option("delimiter", delimiter)
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in raw.columns]
    docs = raw.select(F.concat_ws(" ", *cols).alias("text")).withColumn(
        "doc_id", F.concat(F.lit("row_"), F.monotonically_increasing_id().cast("string"))
    )
    if sampling is not None:
        docs = docs.sample(fraction=sampling, seed=seed)
    return docs.select("doc_id", "text")
