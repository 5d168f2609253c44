"""Per-stage scaling attribution (VERDICT r2 "Next round" #2, alternative B).

Runs the extraction pipeline ONCE at a given parallelism with the three
phases forced separately, and for each phase records:

  * wall seconds;
  * OUR CPU seconds — summed utime+stime deltas of every process in this
    probe's process tree (python driver, the JVM, every pyspark worker),
    read from /proc/<pid>/stat;
  * SYSTEM busy CPU seconds — from /proc/stat deltas;
  * ambient = system - ours: CPU burned by other tenants of this shared
    host while the phase ran.

Phases:
  parse   — HTML -> text_repr, persisted + counted (cluster, parallel)
  mine    — pass-1 n-gram mine + greedy expansion (cluster + one driver walk)
  strip   — pass-2 vectorized strip + output aggregation (cluster, parallel)

The scaling claim this evidences: phases whose CPU seconds stay ~constant
while N changes are perfectly parallel (wall ~ cpu/N when the host is
idle); wall-time shortfalls co-occurring with high ambient CPU are host
contention, not engine serialization.

Usage: python tools/scaling_phases.py <cpus> <n_pages> <parquet_path>
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

_CLK = os.sysconf("SC_CLK_TCK")


def _tree_pids(root: int) -> list[int]:
    """All descendants of root (inclusive) via /proc children lists."""
    pids, stack = [], [root]
    while stack:
        p = stack.pop()
        pids.append(p)
        for tid in os.listdir(f"/proc/{p}/task") if os.path.isdir(f"/proc/{p}/task") else []:
            try:
                with open(f"/proc/{p}/task/{tid}/children") as f:
                    stack.extend(int(c) for c in f.read().split())
            except OSError:
                pass
    return pids


def _our_cpu_s() -> dict[str, float]:
    """CPU seconds of our process tree, split by component: the JVM vs the
    python side (driver + pyspark daemon/workers).  Dead-worker time is
    captured too: the pyspark daemon reaps its workers, so their utime lands
    in the daemon's cutime/cstime (fields 13/14) — without it a phase that
    churns workers under-counts python CPU."""
    cpu = {"java": 0.0, "python": 0.0}
    for pid in _tree_pids(os.getpid()):
        try:
            with open(f"/proc/{pid}/stat") as f:
                raw = f.read()
            comm = raw.split("(", 1)[1].rsplit(")", 1)[0]
            parts = raw.rsplit(")", 1)[1].split()
            own = int(parts[11]) + int(parts[12])  # utime, stime
            dead = int(parts[13]) + int(parts[14])  # cutime, cstime (reaped)
            kind = "java" if "java" in comm else "python"
            cpu[kind] += own / _CLK
            # reaped children of the JVM are python workers it spawned
            cpu["python" if kind == "java" else kind] += dead / _CLK
        except (OSError, IndexError):
            pass
    return cpu


def _sys_busy_s() -> float:
    with open("/proc/stat") as f:
        c = f.readline().split()[1:]
    # user nice system irq softirq steal guest (skip idle=3, iowait=4)
    vals = [int(x) for x in c]
    return (sum(vals) - vals[3] - vals[4]) / _CLK


def main() -> None:
    cpus, n_pages, path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import time

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from boilerplate_buster_spark.functions.tokenizer import tokens
    from boilerplate_buster_spark.operators import bloomspan
    from boilerplate_buster_spark.operators.extraction import (
        strip_text_pass,
        with_text_repr,
    )
    from boilerplate_buster_spark.session import get_spark

    spark = get_spark(
        f"bbs-phases-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        # A/B hook, e.g. BBS_EXTRA_CONF='{"spark.sql.execution.arrow.maxRecordsPerBatch":"2000"}'
        extra_conf=json.loads(os.environ.get("BBS_EXTRA_CONF", "{}")),
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(path)

    phases: dict[str, dict] = {}

    def measure(name: str, fn) -> None:
        w0, o0, s0 = time.perf_counter(), _our_cpu_s(), _sys_busy_s()
        fn()
        w1, o1, s1 = time.perf_counter(), _our_cpu_s(), _sys_busy_s()
        jvm = round(o1["java"] - o0["java"], 1)
        py = round(o1["python"] - o0["python"], 1)
        system = round(s1 - s0, 1)
        phases[name] = {
            "wall_s": round(w1 - w0, 2),
            "our_cpu_s": round(jvm + py, 1),
            "jvm_cpu_s": jvm,
            "python_cpu_s": py,
            "ambient_cpu_s": round(max(0.0, system - jvm - py), 1),
            "loadavg": round(os.getloadavg()[0], 1),
        }

    text_repr = (
        with_text_repr(pages)
        .select("url", "text_repr")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    measure("parse", lambda: text_repr.count())

    docs = text_repr.select(
        F.col("url").alias("doc_id"), tokens("text_repr").alias("tokens")
    )
    mined: list = []
    measure(
        "mine",
        lambda: mined.extend(
            p.text
            for p in bloomspan.mine(
                spark, docs, min_docs=max(10, n_pages // 20), ngrams=3
            )
        ),
    )

    out: list = []
    measure(
        "strip",
        lambda: out.append(
            strip_text_pass(text_repr, mined)
            .agg(F.sum(F.length("extracted_text")), F.count("*"))
            .collect()[0]
        ),
    )

    total_wall = round(sum(p["wall_s"] for p in phases.values()), 2)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
                "n_pages": n_pages,
                "phases": phases,
                "total_wall_s": total_wall,
                "pages_per_sec": round(n_pages / total_wall, 1),
                "rows": out[0][1],
                "sum_chars": int(out[0][0]),
                "n_phrases": len(mined),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
