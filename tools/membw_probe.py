#!/usr/bin/env python
"""Memory-bandwidth scaling probe: the calibration the pure-CPU gate
cannot do.

``bench_scaling.cpu_calibration`` gates measurement windows on the
box's raw-CPU 2->8 scaling, probed with cache-resident integer loops.
That catches CPU-stealing neighbors but is BLIND to memory-bandwidth
neighbors: a co-tenant streaming through RAM leaves integer loops at
~1.0 while inflating every byte-moving stage of the dedup job (the
round-4 shuffle evidence pinned the e2e efficiency gap on exactly this
resource).  Observed in round 5: windows with begin/end pure-CPU
calibrations of 0.93-1.02 still measured executor-CPU inflation of
1.6-2.4x on identical bytes — the neighbor load was bandwidth-shaped,
not core-shaped.

This probe measures aggregate streaming bandwidth (numpy add over
arrays far larger than LLC) at N and 4N workers:

    membw_efficiency = (GB/s at 4N / GB/s at N) / 4

A quiet box holds ~0.7-0.9 at 2->8 (one socket's controllers serve 4x
the streams); a bandwidth-contended box drops far lower.  Read a
window's Spark efficiency against THIS ceiling, not the pure-CPU one,
when the job's stages are exchange- or scan-dominated.

Usage: python tools/membw_probe.py [n_low n_high] (default 2 8)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

ARRAY_MB = 64
REPS = 24


def _stream(_):
    import numpy as np

    n = ARRAY_MB * 1024 * 1024 // 8
    a = np.ones(n)
    b = np.ones(n)
    c = np.empty(n)
    t0 = time.monotonic()
    for _ in range(REPS):
        np.add(a, b, out=c)
    dt = time.monotonic() - t0
    # 3 streams (read a, read b, write c) per rep
    return REPS * 3 * ARRAY_MB / 1024 / dt  # GB/s seen by this worker


def probe(workers: int) -> float:
    with mp.Pool(workers) as p:
        per_worker = p.map(_stream, range(workers))
    return sum(per_worker)


def measure(n_low: int = 2, n_high: int = 8) -> dict:
    lo = probe(n_low)
    hi = probe(n_high)
    return {
        "membw_low_gbps": round(lo, 1),
        "membw_high_gbps": round(hi, 1),
        "membw_efficiency": round((hi / lo) / (n_high / n_low), 3),
    }


if __name__ == "__main__":
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_high = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    print(json.dumps({"n_low": n_low, "n_high": n_high, **measure(n_low, n_high)}))
