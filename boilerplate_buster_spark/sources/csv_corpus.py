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

    Row ids are CONTIGUOUS in file order like the reference's row_<i>
    (corpus_miner.cpp:337): monotonically_increasing_id preserves file order
    (per-partition ascending, partitions in split order) but is
    partition-ENCODED, so a global row_number over it renumbers 0..n-1.  The
    window is unpartitioned - one-reducer sort, fine for the single-file
    corpora this reference mode exists for; web-scale corpora come in through
    the pages/text_dir readers whose ids are natural keys, not ordinals."""
    from pyspark.sql import Window

    raw = (
        spark.read.option("header", "false")
        .option("delimiter", delimiter)
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in raw.columns]
    docs = (
        raw.select(F.concat_ws(" ", *cols).alias("text"))
        .withColumn("_ord", F.monotonically_increasing_id())
        .withColumn(
            "doc_id",
            F.concat(
                F.lit("row_"),
                (F.row_number().over(Window.orderBy("_ord")) - 1).cast("string"),
            ),
        )
        .drop("_ord")
    )
    if sampling is not None:
        docs = docs.sample(fraction=sampling, seed=seed)
    return docs.select("doc_id", "text")
