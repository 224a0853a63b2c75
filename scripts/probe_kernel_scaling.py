"""Spark-free probe: does the visibility kernel itself scale 4->16
workers? Runs the same per-image kernel under multiprocessing on pinned
cores; if efficiency is low here too, the kernel is memory-bound and the
fix belongs in the kernel, not in Spark plumbing."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["OMP_NUM_THREADS"] = "1"
os.environ["OPENBLAS_NUM_THREADS"] = "1"

import multiprocessing as mp

import numpy as np


def make_inputs(n_images: int, seed: int = 7):
    from table_recognition_spark.fixtures.generate import _make_table_image

    out = []
    for i in range(n_images):
        rng = np.random.default_rng([seed, i])
        m, _ = _make_table_image(rng, f"img_{i:06d}")
        bboxes = np.array(
            [
                [
                    min(p["x"] for p in l["points"]),
                    min(p["y"] for p in l["points"]),
                    max(p["x"] for p in l["points"]),
                    max(p["y"] for p in l["points"]),
                ]
                for l in m["ocr_lines"]
            ],
            dtype=np.int64,
        )
        out.append((bboxes, m["width"], m["height"]))
    return out


def worker(args):
    from table_recognition_spark.core.visibility import visibility_edges

    chunk = args
    tot = 0
    for bboxes, w, h in chunk:
        tot += len(visibility_edges(bboxes, w, h))
    return tot


def run(inputs, n_workers, repeats=1):
    """Time ONLY the map over a pre-warmed pool (workers spawned and
    module imported before the clock starts); min of `repeats`."""
    chunks = [inputs[i::n_workers] for i in range(n_workers)]
    with mp.get_context("spawn").Pool(n_workers) as p:
        p.map(worker, [c[:2] for c in chunks])  # warm imports
        best, tots = float("inf"), None
        for _ in range(repeats):
            t0 = time.time()
            tots = p.map(worker, chunks)
            best = min(best, time.time() - t0)
    return best, sum(tots)


if __name__ == "__main__":
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    inputs = make_inputs(n_images)
    t_hi, tot_hi = run(inputs, hi, reps)
    t_lo, tot_lo = run(inputs, lo, reps)
    assert tot_lo == tot_hi
    eff = t_lo / ((hi / lo) * t_hi)
    print(
        f"images={n_images} t{lo}={t_lo:.2f}s t{hi}={t_hi:.2f}s "
        f"eff={eff:.3f} edges={tot_hi}"
    )
