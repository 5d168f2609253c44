"""Evidence run for the ADAPTIVE in-scan gate (closed_patterns): at
corpus sizes above _GATE_MIN_WINDOWS the bitmap gate must BEAT the ungated
full rescan; below it the ungated plan wins (why the adaptive switch
exists).  Prints one JSON line per configuration.

Usage: python tools/gate_scale_check.py [n_pages ...]   (default 20000 200000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    from pyspark.sql import functions as F

    from boilerplate_buster_spark.operators import closed_patterns as cp
    from boilerplate_buster_spark.session import get_spark
    from boilerplate_buster_spark.sources import pages as pages_src

    sizes = [int(a) for a in sys.argv[1:]] or [20_000, 200_000]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark("gate-scale", master=f"local[{cpus}]",
                      shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")

    for n_pages in sizes:
        path = f"/tmp/bbs_bench_pages_{n_pages}.parquet"
        if not os.path.exists(path):
            pages_src.generate_pages_df(
                spark, n_pages, seed=42, partitions=4 * cpus
            ).write.mode("overwrite").parquet(path)
        docs = spark.read.parquet(path).select(
            F.split("text", " ").alias("tokens")
        )
        n_windows = docs.select(F.sum(F.size("tokens"))).first()[0]
        min_sup = max(20, n_pages // 50)
        results = {}
        for label, gate_min in (("gated", 0), ("ungated", 1 << 62)):
            saved = cp._GATE_MIN_WINDOWS
            cp._GATE_MIN_WINDOWS = gate_min
            try:
                best = None
                for _ in range(2):
                    t0 = time.perf_counter()
                    n = cp.closed_contiguous_patterns(
                        spark, docs, min_sup=min_sup, min_l=2, max_len=10
                    ).count()
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                results[label] = {"sec": round(best, 2), "patterns": n}
            finally:
                cp._GATE_MIN_WINDOWS = saved
        print(json.dumps({
            "n_pages": n_pages,
            "n_windows": int(n_windows),
            "min_sup": min_sup,
            "adaptive_default_gates": n_windows >= 2_000_000,
            **{k: v for k, v in results.items()},
            "gate_speedup": round(
                results["ungated"]["sec"] / results["gated"]["sec"], 2
            ),
            "same_result": results["gated"]["patterns"] == results["ungated"]["patterns"],
            "loadavg_1m": round(os.getloadavg()[0], 1),
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
