"""Per-phase timing of the extraction job under local-cluster executors:
splits cache-materialize (HTML parse), mine pass 1 (ends driver-side), and
strip pass 2, so an N-vs-4N efficiency regression can be attributed to a
phase instead of guessed at.  Usage:
  python tools/cluster_phase_probe.py <n_exec> <cores> <mem_mb> <n_pages>
Prints one JSON line."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F

from boilerplate_buster_spark.session import get_spark
from boilerplate_buster_spark.operators import bloomspan
from boilerplate_buster_spark.operators.extraction import (
    strip_text_pass,
    tokens,
    with_text_repr,
)


def main() -> None:
    n_exec, cores, mem_mb, n_pages = (int(a) for a in sys.argv[1:5])
    path = f"/tmp/bbs_scale_pages_{n_pages}_f3_7.parquet"
    spark = get_spark(
        f"bbs-probe-{n_exec}x{cores}",
        master=f"local-cluster[{n_exec},{cores},{mem_mb}]",
        shuffle_partitions=2 * n_exec * cores,
        extra_conf={"spark.executor.memory": f"{mem_mb}m"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(path)
    t = {}

    t0 = time.perf_counter()
    text_repr = with_text_repr(pages).select("url", "text_repr").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    text_repr.count()
    t["parse_cache_s"] = round(time.perf_counter() - t0, 2)

    docs = text_repr.select(
        F.col("url").alias("doc_id"), tokens("text_repr").alias("tokens")
    )
    t0 = time.perf_counter()
    stats: dict = {}
    phrases = [
        p.text
        for p in bloomspan.mine(
            spark, docs, min_docs=max(10, n_pages // 20), ngrams=3, stats=stats
        )
    ]
    t["mine_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    row = (
        strip_text_pass(text_repr, phrases)
        .agg(F.sum(F.length("extracted_text")), F.count("*"))
        .collect()[0]
    )
    t["strip_s"] = round(time.perf_counter() - t0, 2)
    t.update(
        executors=n_exec, cores=cores, n_pages=n_pages,
        n_phrases=len(phrases), rows=row[1], sum_chars=int(row[0]),
        load_end=round(os.getloadavg()[0], 1),
    )
    print(json.dumps(t), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
