"""Directory corpus reader (S1/S2 in SURVEY.md section 2.1).

Reference behavior replicated:
  * recursive scan with a filename mask - `*`, `*.ext`, or exact name
    (corpus_miner.cpp:376-398);
  * per-file encoding sniffing: FF FE -> UTF-16LE, FE FF -> UTF-16BE, else
    UTF-8 (corpus_miner.cpp:417-448).

Spark's text reader cannot switch encodings per file, so the source is
`binaryFile` (splittable listing, whole-file content) + an Arrow-batched
decode.  Doc identity = file path (the reference keeps `file_paths[i]`,
corpus_miner.h:20)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from boilerplate_buster_spark.core.tokenize import decode_page_bytes

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)


def mask_to_glob(mask: str | None) -> str | None:
    """Reference mask semantics (corpus_miner.cpp:382-398): '*' -> everything,
    '*.ext' -> suffix match, otherwise exact filename."""
    if mask is None or mask == "*":
        return None
    return mask  # '*.ext' and exact names are both valid glob patterns


def read_text_dir(
    spark: SparkSession,
    path: str,
    mask: str | None = None,
    sampling: float | None = None,
    seed: int = 42,
) -> DataFrame:
    """-> (doc_id=file path, text=decoded content).

    `sampling` mirrors `--sampling` (S4, corpus_miner.cpp:400-407) but SEEDED
    (the reference uses an unseeded random_device - documented deviation)."""
    reader = spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    glob = mask_to_glob(mask)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    files = reader.load(path).select("path", "content")
    if sampling is not None:
        files = files.sample(fraction=sampling, seed=seed)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["path"],
                    "text": [decode_page_bytes(bytes(b)) for b in pdf["content"]],
                }
            )

    return files.mapInPandas(decode, CORPUS_SCHEMA)
