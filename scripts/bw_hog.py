"""Synthetic co-tenant: saturate memory bandwidth on the cores it is
pinned to (taskset from the caller). Used only to reproduce the
degraded-host conditions the driver's harness sometimes measures under —
never part of the benchmark itself.

Usage: taskset -c 24-31 python scripts/bw_hog.py <n_procs> <seconds>
"""
from __future__ import annotations

import multiprocessing as mp
import sys
import time

import numpy as np


def hog(seconds: float) -> None:
    # 256 MB working set >> L3 share: every pass streams DRAM
    a = np.ones(32 * 1024 * 1024, dtype=np.float64)
    b = np.empty_like(a)
    t0 = time.time()
    while time.time() - t0 < seconds:
        np.copyto(b, a)
        b += 1.0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    secs = float(sys.argv[2]) if len(sys.argv) > 2 else 60.0
    procs = [
        mp.get_context("spawn").Process(target=hog, args=(secs,))
        for _ in range(n)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
