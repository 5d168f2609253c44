"""JSONL corpus source/sink - the de-facto interchange format of public
LLM training corpora (The Pile, RedPajama, Dolma, FineWeb dumps all ship
as {"id": ..., "text": ..., "meta": {...}} lines).  Reading is one text
scan + a PERMISSIVE from_json projection (malformed lines yield null
fields, never a crash - the Dolma convention); writing is one to_json
projection.  Both are pure maps: the format layer adds zero shuffles.

No reference anchor: the reference reads directories/CSV
(corpus_loader.cpp); JSONL is the builder brief's LLM-pipeline bar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

JSONL_SCHEMA = "id string, text string, meta map<string,string>"


def read_jsonl_corpus(
    spark: SparkSession, path: str, schema: str = JSONL_SCHEMA
) -> DataFrame:
    """(id, text, meta, corrupt): one row per line; fields null and
    corrupt=true when a line is not valid JSON for `schema` (PERMISSIVE
    parse - a bad record must not kill a 100-TB read)."""
    raw = spark.read.text(path)
    parsed = raw.select(
        F.from_json(F.col("value"), schema).alias("j"), "value"
    )
    return parsed.select(
        F.col("j.id").alias("id"),
        F.col("j.text").alias("text"),
        F.col("j.meta").alias("meta"),
        (F.col("j").isNull() | F.col("j.id").isNull()).alias("corrupt"),
    )


def write_jsonl_corpus(
    df: DataFrame,
    path: str,
    id_col: str = "id",
    text_col: str = "text",
    meta_col: str | None = "meta",
    mode: str = "overwrite",
) -> None:
    """Write (id, text[, meta]) as JSONL text part-files."""
    cols = [F.col(id_col).alias("id"), F.col(text_col).alias("text")]
    if meta_col is not None and meta_col in df.columns:
        cols.append(F.col(meta_col).alias("meta"))
    df.select(F.to_json(F.struct(*cols)).alias("value")).write.mode(
        mode
    ).text(path)
