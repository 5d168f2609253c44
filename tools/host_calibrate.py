"""Host capability calibration for scaling-evidence interpretation.

Two micro-benchmarks, each at 1/8/16/32 processes:

  * compute — tight integer loop (registers + L1 only): measures how much
    CPU *work* the box delivers per thread as thread count grows
    (frequency scaling / hypervisor effects; jiffy-based tools can't see
    this because stalled-or-throttled cycles still count as busy);
  * triad — STREAM-triad-like numpy pass over 64 MiB arrays: measures
    aggregate DRAM bandwidth vs process count.

Why it matters: the north rule's "N vs 4N executors" assumes per-node
resources (DRAM channels, LLC) scale with the executor count.  A single
shared VM cannot emulate that — once aggregate bandwidth saturates, extra
threads add CPU but no throughput for streaming workloads (Tungsten
hash-agg, Arrow transfer, numpy kernels all stream).  This tool quantifies
both ceilings so BENCH/BASELINE.md can normalize measured scaling
efficiency against what the box can physically deliver.

Usage: python tools/host_calibrate.py [duration_s_per_point]
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _burn(dur: float) -> int:
    t0 = time.time()
    it = 0
    while time.time() - t0 < dur:
        x = 0
        for i in range(100000):
            x += i * i
        it += 1
    return it


def _triad(dur: float) -> float:
    import numpy as np

    n = 8 * 1024 * 1024  # 3 x 64 MiB arrays: far beyond any cache
    rng = np.random.default_rng(0)
    b, c = rng.random(n), rng.random(n)
    a = np.empty(n)
    t0 = time.time()
    it = 0
    while time.time() - t0 < dur:
        np.multiply(c, 3.0, out=a)
        np.add(a, b, out=a)
        it += 1
    return it * n * 8 * 3 / (time.time() - t0)  # bytes touched / s


def main() -> None:
    dur = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    counts = (1, 8, 16, 32)
    out: dict = {"duration_s": dur, "compute": {}, "triad_gb_s": {}}
    for n in counts:
        with mp.Pool(n) as p:
            its = p.map(_burn, [dur] * n)
        out["compute"][str(n)] = round(sum(its) / n / dur, 1)  # iters/s/proc
    base = out["compute"]["1"]
    out["compute_effective_cores"] = {
        k: round(v * int(k) / base, 1) for k, v in out["compute"].items()
    }
    for n in counts:
        with mp.Pool(n) as p:
            bw = p.map(_triad, [dur] * n)
        out["triad_gb_s"][str(n)] = round(sum(bw) / 1e9, 1)  # aggregate
    print(json.dumps(out))


if __name__ == "__main__":
    main()
