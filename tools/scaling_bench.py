"""Two-cluster-size scaling evidence (BASELINE.md protocol): the north rule's
">= 0.8 throughput scaling efficiency between N and 4N executors" cannot use a
real cluster in this sandbox, so we run the SAME extraction job on the SAME
materialized input at local[8] (N) and local[32] (4N) and report
pages/sec at both plus efficiency = (throughput_32 / throughput_8) / 4.

Each run is a fresh subprocess (own JVM - no warm-cache contamination beyond
the OS page cache, which both runs share equally since the input is
materialized parquet).

Usage: python tools/scaling_bench.py [n_pages] [N]   (default 60000 2)
Runs at local[N] and local[4N].  NOTE this sandbox shares its 32 hardware
threads with other tenants (load average ~20 with zero container-local CPU
use observed); N=2 vs 4N=8 fits the idle capacity so the comparison measures
OUR job's scaling, not host contention.  Ambient load is recorded in the
report.  Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent

RUN_SNIPPET = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from boilerplate_buster_spark.session import get_spark
from boilerplate_buster_spark.operators.extraction import extract_main_content

cpus = int(sys.argv[1]); n_pages = int(sys.argv[2]); path = sys.argv[3]
spark = get_spark(f"bbs-scale-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=2 * cpus)
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(path)
t0 = time.perf_counter()
ext, phrases = extract_main_content(spark, pages, min_docs=max(10, n_pages // 20), ngrams=3)
n_out = ext.agg(F.sum(F.length("extracted_text")), F.count("*")).collect()[0]
wall = time.perf_counter() - t0
print(json.dumps({{"cpus": cpus, "wall_s": round(wall, 2),
                   "pages_per_sec": round(n_pages / wall, 1),
                   "rows": n_out[1], "sum_chars": int(n_out[0]),
                   "n_phrases": len(phrases)}}))
spark.stop()
"""


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    n_lo = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_hi = 4 * n_lo
    fmin = int(os.environ.get("BBS_FILLER_MIN", 3))
    fmax = int(os.environ.get("BBS_FILLER_MAX", 7))
    path = f"/tmp/bbs_scale_pages_{n_pages}_f{fmin}_{fmax}.parquet"
    if not os.path.exists(path):
        sys.path.insert(0, str(REPO))
        from boilerplate_buster_spark.session import get_spark
        from boilerplate_buster_spark.sources import pages as pages_src

        spark = get_spark("bbs-scale-gen", master="local[32]", shuffle_partitions=64)
        spark.sparkContext.setLogLevel("ERROR")
        fmin = int(os.environ.get("BBS_FILLER_MIN", 3))
        fmax = int(os.environ.get("BBS_FILLER_MAX", 7))
        pages_src.generate_pages_df(
            spark, n_pages, seed=42, partitions=128,
            filler_min=fmin, filler_max=fmax,
        ).write.mode("overwrite").parquet(path)
        spark.stop()

    load_before = os.getloadavg()
    snippet = RUN_SNIPPET.format(repo=str(REPO))
    repeats = int(os.environ.get("BBS_SCALE_REPEATS", 1))
    results: dict[int, dict] = {}
    # INTERLEAVED repeats, best wall per level: ambient tenant load on this
    # shared host varies 3-15x minute to minute, so a single pass can charge
    # one level with a load spike the other never saw.  Min-of-N per level
    # measures the engine's capability at each parallelism, not the host.
    for rep in range(repeats):
        for cpus in (n_lo, n_hi):
            out = subprocess.run(
                [sys.executable, "-c", snippet, str(cpus), str(n_pages), path],
                capture_output=True, text=True, timeout=3600,
            )
            got = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
            if not got:
                # surface the subprocess failure instead of a bare IndexError
                sys.stderr.write(
                    f"--- local[{cpus}] run produced no JSON; stderr tail ---\n"
                    + "\n".join(out.stderr.strip().splitlines()[-30:]) + "\n"
                )
                raise RuntimeError(f"local[{cpus}] measurement failed")
            line = got[-1]
            r = json.loads(line)
            r["loadavg"] = round(os.getloadavg()[0], 2)
            print(line, f'load={r["loadavg"]}', flush=True)
            if cpus not in results or r["wall_s"] < results[cpus]["wall_s"]:
                results[cpus] = r

    # identical outputs across parallelism levels = determinism evidence
    same = (
        results[n_lo]["sum_chars"] == results[n_hi]["sum_chars"]
        and results[n_lo]["rows"] == results[n_hi]["rows"]
        and results[n_lo]["n_phrases"] == results[n_hi]["n_phrases"]
    )
    eff = round(results[n_hi]["pages_per_sec"] / results[n_lo]["pages_per_sec"] / 4, 3)
    summary = {
        "n_pages": n_pages,
        f"pages_per_sec_{n_lo}": results[n_lo]["pages_per_sec"],
        f"pages_per_sec_{n_hi}": results[n_hi]["pages_per_sec"],
        "scaling_efficiency": eff,
        "outputs_identical": same,
        "loadavg_before": load_before,
        "repeats": repeats,
    }
    print(json.dumps(summary))

    # APPEND a run record - BENCH/BASELINE.md accumulates the curated
    # scaling/attribution history across rounds; never clobber it
    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    with open(bench_dir / "BASELINE.md", "a", encoding="utf-8") as f:
        f.write(f"""

## Scaling run record — {n_pages} pages, local[{n_lo}] vs local[{n_hi}]

Same extraction job (full two-pass BloomSpan mine + broadcast + vectorized
Arrow strip), same materialized input, separate JVMs,
shuffle.partitions = 2x cores; {repeats} interleaved repeat(s) per level,
BEST wall per level; ambient load at start {load_before[0]:.1f}.

| run | cores | wall (s) | pages/sec | scaling efficiency |
|---|---|---|---|---|
| A | local[{n_lo}] | {results[n_lo]['wall_s']} | {results[n_lo]['pages_per_sec']} | — |
| B | local[{n_hi}] | {results[n_hi]['wall_s']} | {results[n_hi]['pages_per_sec']} | {eff} (target >= 0.8) |

Outputs identical across parallelism levels (row count, total extracted
chars, mined phrase count): **{same}**.
""")


if __name__ == "__main__":
    main()
