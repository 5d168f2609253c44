"""WARC files -> the north-rule pages DataFrame (url, warc_ts, html, ...).

Scale posture: `spark.read.format("binaryFile")` distributes WHOLE files
across executors (one task per file — Common Crawl segments are ~1 GB, and
a crawl is ~64k files, so file-level parallelism saturates any cluster);
record parsing is an Arrow-batched map with no shuffle.  The gzip layout
(one member per record) means a future split-by-offset reader could go
finer-grained; at the file granularity used here that complexity isn't
needed — documented trade-off.

`pages_from_warc` returns exactly the input-hint shape: url string,
warc_ts timestamp, html binary, plus status int for JVM-side filtering
(non-200 dropped before any parse work).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from boilerplate_buster_spark.core.warcparse import iter_warc_pages

_RAW_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts_str", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("html", T.BinaryType()),
    ]
)


def _parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for blob in pdf["content"]:
            for page in iter_warc_pages(bytes(blob)):
                rows.append(
                    (page["url"], page["warc_ts"], page["status"], page["html"])
                )
        yield pd.DataFrame(rows, columns=[f.name for f in _RAW_SCHEMA])


def pages_from_warc_bytes(blobs: DataFrame, content_col: str = "content") -> DataFrame:
    """(content: binary of a .warc / .warc.gz file) -> pages DataFrame."""
    raw = blobs.select(F.col(content_col).alias("content")).mapInPandas(
        _parse_batches, _RAW_SCHEMA
    )
    return raw.where(F.col("status") == 200).select(
        "url",
        F.to_timestamp("warc_ts_str", "yyyy-MM-dd'T'HH:mm:ssX").alias("warc_ts"),
        "html",
    )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Directory/glob of .warc(.gz) files -> (url, warc_ts, html)."""
    blobs = spark.read.format("binaryFile").load(path)
    return pages_from_warc_bytes(blobs)
