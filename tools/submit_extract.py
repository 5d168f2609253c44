"""spark-submit entry point for the checkpointed extraction pipeline.

Cluster usage (north rule: `spark-submit --py-files` on multi-executor
clusters at N and 4N executors):

    cd /root/repo && zip -qr /tmp/bbs.zip boilerplate_buster_spark
    spark-submit --py-files /tmp/bbs.zip \\
        --num-executors $N --executor-cores 4 --executor-memory 8g \\
        tools/submit_extract.py \\
        --input  <pages parquet/iceberg path> \\
        --checkpoint <checkpoint dir> \\
        --min-docs 1000 --ngrams 4

Local smoke:  python tools/submit_extract.py --demo
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="pages table path (url, warc_ts, html, text, lang)")
    ap.add_argument(
        "--input-format", choices=("parquet", "warc"), default="parquet",
        help="'warc' reads a dir/glob of .warc(.gz) files (Common Crawl layout)",
    )
    ap.add_argument(
        "--strategy", choices=("bloomspan", "dom"), default="bloomspan",
        help="'dom' = corpus-pass-free Boilerpipe/jusText-style heuristics "
             "(no mining stage, no min-docs threshold)",
    )
    ap.add_argument("--output", help="write extracted table here (parquet)")
    ap.add_argument("--checkpoint", required=False, default="/tmp/bbs_ckpt")
    ap.add_argument("--min-docs", type=int, default=1000)
    ap.add_argument("--ngrams", type=int, default=4)
    ap.add_argument("--repartition-by-url", action="store_true")
    ap.add_argument("--demo", action="store_true", help="generate 2000 synthetic pages")
    ap.add_argument(
        "--arrow-batch",
        type=int,
        default=1000,
        help="Arrow maxRecordsPerBatch for the big-corpus hot path; small "
        "batches keep Python workers cache-resident once the node is "
        "memory-bandwidth-bound (measured 2.8x on the strip phase at 3.84M "
        "pages/local[32]); at small corpora prefer 10000 (session default)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from boilerplate_buster_spark.plans.pipeline import run_extraction_pipeline

    # under spark-submit the session/master comes from the submit conf;
    # standalone falls back to the local builder.  The Arrow batch override
    # goes on the builder (bandwidth-friendly batches for the big-corpus
    # hot path; an explicit spark-submit --conf still wins because an
    # existing session's conf is not overridden by getOrCreate).
    spark = (
        SparkSession.builder.appName("bbs-extract")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(args.arrow_batch)
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    if args.demo:
        from boilerplate_buster_spark.sources.pages import generate_pages_df

        pages = generate_pages_df(spark, 2000, seed=42)
        args.min_docs = 100
        args.ngrams = 3
    elif args.input_format == "warc":
        from pyspark.sql import functions as F

        from boilerplate_buster_spark.sources.warc import read_warc

        pages = read_warc(spark, args.input).withColumn(
            "text", F.lit(None).cast("string")
        )
    else:
        pages = spark.read.parquet(args.input)

    t0 = time.perf_counter()
    if args.strategy == "dom":
        # local heuristics: one Arrow parse + Catalyst classify, no corpus
        # pass, no checkpoint stages needed
        from pyspark.sql import functions as F

        from boilerplate_buster_spark.operators.domheuristics import (
            extract_by_heuristics,
        )

        ext = extract_by_heuristics(pages)
        if args.output:
            ext.write.mode("overwrite").parquet(args.output)
            row = spark.read.parquet(args.output).agg(
                F.count("*"), F.sum(F.length("extracted_text"))).collect()[0]
        else:
            row = ext.agg(
                F.count("*"), F.sum(F.length("extracted_text"))).collect()[0]
        summary = {"strategy": "dom", "rows": row[0],
                   "sum_chars": int(row[1] or 0)}
    else:
        summary = run_extraction_pipeline(
            spark,
            pages,
            args.checkpoint,
            min_docs=args.min_docs,
            ngrams=args.ngrams,
            repartition_by_url=args.repartition_by_url,
        )
    summary["wall_s"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
