"""Confirm the host's throttle-after-sustained-load behavior and its
recovery timescale. Protocol:

1. measure single-core calibration (best-of-3 fixed numpy kernel)
2. hammer all 32 cores for --load seconds (like a full-width Spark phase)
3. measure calibration every 15 s for --watch seconds → recovery curve

Diagnostic only; not part of the benchmark.
"""
from __future__ import annotations

import multiprocessing as mp
import sys
import time

import numpy as np


def calibrate() -> float:
    """Best-of-3 single-core kernel: ~0.09 s on the quiet machine."""
    a = np.arange(2_000_000, dtype=np.float64)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            b = np.sqrt(a) * 1.0001
            s = float(b[::997].sum())
        best = min(best, time.perf_counter() - t0)
    _ = s
    return best


def _hog(seconds: float) -> None:
    a = np.ones(8 * 1024 * 1024, dtype=np.float64)
    t0 = time.time()
    while time.time() - t0 < seconds:
        a = np.sqrt(a * 1.0001) + 1.0


if __name__ == "__main__":
    load_s = float(sys.argv[1]) if len(sys.argv) > 1 else 180.0
    watch_s = float(sys.argv[2]) if len(sys.argv) > 2 else 300.0
    print(f"calib quiet: {calibrate():.4f}s", flush=True)
    procs = [
        mp.get_context("spawn").Process(target=_hog, args=(load_s,))
        for _ in range(32)
    ]
    t0 = time.time()
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    print(f"load done after {time.time() - t0:.0f}s", flush=True)
    t0 = time.time()
    while time.time() - t0 < watch_s:
        print(f"t+{time.time() - t0:6.0f}s calib {calibrate():.4f}s", flush=True)
        time.sleep(15)
