"""N-vs-4N EXECUTOR scaling evidence via Spark's local-cluster mode.

`local-cluster[n, cores, mem_mb]` spawns n REAL executor JVMs (own heap,
own GC, own pyspark worker daemons, netty shuffle, RPC broadcast) — the
closest this single-box sandbox gets to the north rule's "spark-submit at
N and 4N executors": unlike local[k], the executor architecture is the
cluster one, only the hardware underneath is shared.

Runs the full extraction job at local-cluster[N, cores, mem] and
local-cluster[4N, cores, mem] in separate driver subprocesses, reports
pages/sec at both + efficiency, and records ambient load.  DRAM bandwidth
is still one box's (see BENCH/BASELINE.md host calibration) — efficiency
here composes the engine AND that shared-bandwidth ceiling.

Usage: python tools/scaling_cluster.py [n_pages] [N] [cores_per_exec] [mem_mb]
Defaults: 960000 1 8 12288.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent

RUN = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from boilerplate_buster_spark.session import get_spark
from boilerplate_buster_spark.operators.extraction import extract_main_content

n_exec, cores, mem_mb = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
n_pages, path = int(sys.argv[4]), sys.argv[5]
spark = get_spark(
    f"bbs-cluster-{{n_exec}}x{{cores}}",
    master=f"local-cluster[{{n_exec}},{{cores}},{{mem_mb}}]",
    shuffle_partitions=2 * n_exec * cores,
    # local-cluster's third arg caps the WORKER; the executor still asks for
    # spark.executor.memory (default 1g -> exit code 52 OOM). Match them.
    extra_conf={{"spark.executor.memory": f"{{mem_mb}}m"}},
)
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(path)
t0 = time.perf_counter()
ext, phrases = extract_main_content(spark, pages, min_docs=max(10, n_pages // 20), ngrams=3)
row = ext.agg(F.sum(F.length("extracted_text")), F.count("*")).collect()[0]
wall = time.perf_counter() - t0
print(json.dumps({{"executors": n_exec, "cores_per_exec": cores,
                   "wall_s": round(wall, 2),
                   "pages_per_sec": round(n_pages / wall, 1),
                   "rows": row[1], "sum_chars": int(row[0]),
                   "n_phrases": len(phrases),
                   "load_end": round(os.getloadavg()[0], 1)}}))
spark.stop()
"""


def run_level(n_exec: int, cores: int, mem_mb: int, n_pages: int, path: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUN.format(repo=str(REPO)),
         str(n_exec), str(cores), str(mem_mb), str(n_pages), path],
        capture_output=True, text=True, timeout=3600,
    )
    got = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not got:
        sys.stderr.write("\n".join(out.stderr.strip().splitlines()[-30:]) + "\n")
        raise RuntimeError(f"{n_exec}-executor run produced no JSON")
    r = json.loads(got[-1])
    print(got[-1], flush=True)
    return r


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 960000
    n_lo = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    mem_mb = int(sys.argv[4]) if len(sys.argv) > 4 else 12288
    fmin, fmax = int(os.environ.get("BBS_FILLER_MIN", 3)), int(os.environ.get("BBS_FILLER_MAX", 7))
    path = f"/tmp/bbs_scale_pages_{n_pages}_f{fmin}_{fmax}.parquet"
    if not os.path.exists(path):
        sys.path.insert(0, str(REPO))
        from boilerplate_buster_spark.session import get_spark
        from boilerplate_buster_spark.sources import pages as pages_src

        spark = get_spark("bbs-cluster-gen", master="local[16]", shuffle_partitions=64)
        spark.sparkContext.setLogLevel("ERROR")
        pages_src.generate_pages_df(
            spark, n_pages, seed=42, partitions=128, filler_min=fmin, filler_max=fmax
        ).write.mode("overwrite").parquet(path)
        spark.stop()

    lo = run_level(n_lo, cores, mem_mb, n_pages, path)
    hi = run_level(4 * n_lo, cores, mem_mb, n_pages, path)
    eff = round(hi["pages_per_sec"] / lo["pages_per_sec"] / 4, 3)
    same = (lo["rows"], lo["sum_chars"], lo["n_phrases"]) == (
        hi["rows"], hi["sum_chars"], hi["n_phrases"])
    print(json.dumps({
        "n_pages": n_pages,
        f"pages_per_sec_{n_lo}x{cores}": lo["pages_per_sec"],
        f"pages_per_sec_{4 * n_lo}x{cores}": hi["pages_per_sec"],
        "scaling_efficiency": eff,
        "outputs_identical": same,
    }))


if __name__ == "__main__":
    main()
