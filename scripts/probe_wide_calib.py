"""Can a short N-process-wide calibration probe SEE the host's
wide-load throttle that the single-core probe provably cannot?

Protocol: measure wide+narrow probes, hammer 16 cores for --load
seconds, then re-measure both every ~15 s for --watch seconds.
If the wide probe inflates right after the hammer and decays with idle
time while the narrow probe stays flat, it is a usable quiet-gate for
the scaling bench's hi children. Diagnostic only; not part of the
benchmark.

Usage: python scripts/probe_wide_calib.py [load_s] [watch_s]
"""
from __future__ import annotations

import multiprocessing as mp
import sys
import time

import numpy as np


def _kernel(_=None) -> float:
    a = np.arange(2_000_000, dtype=np.float64)
    t0 = time.perf_counter()
    for _ in range(5):
        b = np.sqrt(a) * 1.0001
        s = float(b[::997].sum())
    _ = s
    return time.perf_counter() - t0


def narrow() -> float:
    return min(_kernel() for _ in range(3))


def wide(pool, nproc: int) -> float:
    """Wall-clock for nproc concurrent kernels (best of 2)."""
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        pool.map(_kernel, range(nproc))
        best = min(best, time.perf_counter() - t0)
    return best


def _hog(seconds: float) -> None:
    a = np.ones(8 * 1024 * 1024, dtype=np.float64)
    t0 = time.time()
    while time.time() - t0 < seconds:
        a = np.sqrt(a * 1.0001) + 1.0


if __name__ == "__main__":
    load_s = float(sys.argv[1]) if len(sys.argv) > 1 else 90.0
    watch_s = float(sys.argv[2]) if len(sys.argv) > 2 else 240.0
    nproc = 8
    ctx = mp.get_context("fork")
    pool = ctx.Pool(nproc)
    print(f"before: narrow={narrow():.4f} wide={wide(pool, nproc):.4f}",
          flush=True)
    procs = [ctx.Process(target=_hog, args=(load_s,)) for _ in range(16)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    print(f"hammered 16 cores for {load_s:.0f}s", flush=True)
    t0 = time.time()
    while time.time() - t0 < watch_s:
        dt = time.time() - t0
        print(f"t+{dt:5.0f}s narrow={narrow():.4f} "
              f"wide={wide(pool, nproc):.4f}", flush=True)
        time.sleep(15)
    pool.close()
