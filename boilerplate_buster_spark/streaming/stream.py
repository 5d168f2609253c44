"""Structured Streaming variants (the reference is batch-only - SURVEY.md
section 2.8; these extend the engine to continuous ingestion, the natural
production mode for a crawl pipeline).

  * stream_strip: the extraction second pass as a stateless streaming map -
    a FROZEN phrase table (mined from a reference batch / previous snapshot)
    broadcast into the same Arrow-batched kernel.  Phrase mining itself is
    corpus-global (two full passes) and stays batch; streams re-mine per
    checkpoint snapshot.
  * stream_ngram_doc_freq: incremental per-gram document-frequency
    aggregation; streaming disallows exact countDistinct, so the streaming
    path uses approx_count_distinct (HLL) - the batch engine remains exact,
    this powers live monitoring (same trade the reference makes with its
    counting Bloom filter, bloom_gram_miner.cpp:284-337).
  * stream_event_rates: watermarked tumbling-window aggregation over the
    events table shape (late data handling demo).
  * stream_dedup_first_seen: CUSTOM STATEFUL operator via
    applyInPandasWithState - per-fingerprint state keeps the first-seen doc
    and a duplicate counter with an optional processing-time TTL; only
    first-seen docs are emitted downstream (streaming exact-dedup, the
    stateful front of the batch exact_dedup_groups).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from boilerplate_buster_spark.functions.ngrams import ngram_structs
from boilerplate_buster_spark.functions.tokenizer import tokens
from boilerplate_buster_spark.operators.extraction import strip_pass


def stream_strip(pages_stream: DataFrame, phrases: list[str]) -> DataFrame:
    """Extraction pass 2 over a stream: stateless mapInPandas, unchanged
    kernel (works on streaming DataFrames as-is)."""
    return strip_pass(pages_stream, phrases)


def run_extraction_stream(
    spark,
    src_dir: str,
    phrases: list[str],
    out_dir: str,
    checkpoint_dir: str,
    schema=None,
    available_now: bool = True,
):
    """The composed end-to-end streaming extraction job: file source ->
    frozen-phrase strip -> parquet sink with a checkpoint.  Restarting with
    the SAME checkpoint_dir resumes exactly where the last run committed
    (new source files only, no re-emits) - the streaming twin of the batch
    pipeline's checkpoint/resume (plans/pipeline.py).  Returns the started
    StreamingQuery; with available_now the query drains the current source
    contents and stops."""
    from boilerplate_buster_spark.sources import pages as pages_src

    stream = spark.readStream.schema(schema or pages_src.PAGES_SCHEMA).parquet(src_dir)
    writer = (
        stream_strip(stream, phrases)
        .select("url", "extracted_text")  # parquet-friendly projection
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_ngram_doc_freq(
    docs_stream: DataFrame,
    n: int,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """(gram, df_approx) continuously updated (update output mode)."""
    toks = docs_stream.select(
        F.col(doc_col), tokens(text_col).alias("tokens")
    )
    grams = toks.select(
        F.col(doc_col),
        F.explode(ngram_structs("tokens", n)).alias("g"),
    ).select(doc_col, F.col("g.gram").alias("gram"))
    return grams.groupBy("gram").agg(
        F.approx_count_distinct(doc_col).alias("df_approx")
    )


def stream_dedup_first_seen(
    docs_stream: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    ttl_minutes: int | None = None,
) -> DataFrame:
    """(fp, doc_id, n_seen): one row per NEW fingerprint (first-seen doc);
    re-arrivals only bump the counter in state, nothing is emitted.

    State per md5(text) group = (first_doc, n_seen); an optional
    processing-time TTL expires idle fingerprints so unbounded crawls don't
    grow state forever (expiry forgets the dup-history, the standard
    windowed-dedup trade)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "fp string, doc_id string, n_seen bigint"
    state_schema = "first string, n bigint"

    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        first, n = state.get if state.exists else (None, 0)
        emit_first = first is None
        for pdf in pdfs:
            for doc in pdf[doc_col]:
                n += 1
                if first is None:
                    first = str(doc)
        state.update((first, n))
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        if emit_first and first is not None:
            yield pd.DataFrame({"fp": [key[0]], "doc_id": [first], "n_seen": [n]})

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        docs_stream.select(F.md5(text_col).alias("fp"), F.col(doc_col))
        .groupBy("fp")
        .applyInPandasWithState(fn, out_schema, state_schema, "update", timeout)
    )


def stream_event_rates(
    events_stream: DataFrame,
    watermark: str = "1 hour",
    window: str = "1 hour",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type (late rows beyond
    the watermark are dropped - Structured Streaming's late-data contract)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
