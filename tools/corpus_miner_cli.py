"""Drop-in CLI mirroring the reference binary's interface
(/root/reference/corpus-miner/main.cpp:14-21,26-31):

    python tools/corpus_miner_cli.py <dir-or-csv> [--algo bloomspan|bide|clospan]
        [--n MIN_DOCS] [--ngrams N] [--min-l L] [--mask '*.txt']
        [--sampling 0.5] [--csv-delimiter ','] [--output results_max.csv]
        [--threads N]

Differences from the reference (documented deviations, SURVEY.md section 5):
deterministic output ordering/example selection; seeded sampling; `--mem`,
`--in-mem`, `--preload`, `--cache` are accepted but ignored (Spark's memory
manager and caching replace them).  `--spmf` shells out to the SPMF jar
exactly like the reference (sources/sinks.run_spmf): `--algo` then carries
SPMF's algorithm name and `--spmf-params`/`--spmf-jar-location` pass through.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("input", help="corpus directory or .csv file")
    # with --spmf the algo is SPMF's algorithm name (e.g. BIDE+), passed
    # through verbatim like the reference does (main.cpp:87)
    ap.add_argument("--algo", default="bloomspan")
    ap.add_argument("--n", type=int, default=10, help="min docs / min support")
    ap.add_argument("--ngrams", type=int, default=4)
    # reference spelling is --min_l (main.cpp:51); accept both
    ap.add_argument("--min-l", "--min_l", dest="min_l", type=int, default=None)
    ap.add_argument("--mask", default=None)
    ap.add_argument("--sampling", type=float, default=None)
    ap.add_argument("--csv-delimiter", default=",")
    ap.add_argument("--output", default="results_max.csv")
    ap.add_argument("--threads", type=int, default=None)
    # accepted-but-ignored reference flags (Spark manages memory/caching)
    ap.add_argument("--mem", type=int, default=None)
    ap.add_argument("--in-mem", action="store_true")
    ap.add_argument("--preload", action="store_true")
    ap.add_argument("--cache", type=int, default=None)
    # SPMF java bridge (reference main.cpp:37-48,82-87)
    ap.add_argument("--spmf", action="store_true")
    ap.add_argument("--spmf-params", default=None)
    ap.add_argument("--spmf-jar-location", default="./spmf.jar")
    args = ap.parse_args()
    if not args.spmf and args.algo not in ("bloomspan", "bide", "clospan"):
        ap.error(f"--algo {args.algo!r} needs --spmf (native algos: "
                 "bloomspan, bide, clospan)")

    from boilerplate_buster_spark.functions.tokenizer import tokens
    from boilerplate_buster_spark.operators import bloomspan
    from boilerplate_buster_spark.operators.closed_patterns import (
        closed_contiguous_patterns,
    )
    from boilerplate_buster_spark.session import get_spark
    from boilerplate_buster_spark.sources.csv_corpus import read_csv_corpus
    from boilerplate_buster_spark.sources.sinks import results_csv
    from boilerplate_buster_spark.sources.text_dir import read_text_dir

    master = f"local[{args.threads}]" if args.threads else None
    spark = get_spark("corpus-miner", master=master)
    spark.sparkContext.setLogLevel("ERROR")

    if args.input.endswith(".csv") and os.path.isfile(args.input):
        raw = read_csv_corpus(spark, args.input, args.csv_delimiter, args.sampling)
    else:
        raw = read_text_dir(spark, args.input, args.mask, args.sampling)
    docs = raw.select("doc_id", tokens("text").alias("tokens"))

    min_l = args.min_l if args.min_l is not None else args.ngrams  # main.cpp:67

    if args.spmf:
        # reference: empty params default to min_docs (main.cpp:83)
        from pyspark.sql import functions as F

        from boilerplate_buster_spark.sources.sinks import run_spmf

        res = run_spmf(
            docs, args.algo, args.spmf_jar_location,
            args.spmf_params or str(args.n), min_l=min_l,
        )
        out = res.withColumn("example_docs", F.expr("array()"))
    elif args.algo == "bloomspan":
        out = bloomspan.mine_df(
            spark, docs, min_docs=args.n, ngrams=args.ngrams, min_l=min_l
        )
    else:  # bide / clospan: closed contiguous patterns, occurrence support
        from pyspark.sql import functions as F

        res = closed_contiguous_patterns(spark, docs, min_sup=args.n, min_l=min_l)
        out = res.withColumn("example_docs", F.expr("array()"))

    text = results_csv(out, args.output)
    print(f"[DONE] {len(text.splitlines()) - 1} phrases -> {args.output}")
    spark.stop()


if __name__ == "__main__":
    main()
