"""SemDeDup scale seams (round-6): corpus-derived coarse k and the
second-level mega-cluster split that bounds the per-task greedy unit.

The skewed fixture here is the case the coarse quantizer cannot fix: a
tightly concentrated embedding space where (nearly) everything lands in
one coarse cluster. The split must still bound every greedy unit at
max_rows, partition the cluster exactly, and keep identical vectors
co-located so exact copies still dedup.
"""

import numpy as np
import pytest

from table_recognition_spark.operators.dedup import _sem_split_units
from table_recognition_spark.operators.similarity import (
    n_coarse_clusters,
    quantizer_sample_cap,
)

SF = "/root/testdata/sf0.001"


def test_n_coarse_clusters_scales_with_corpus():
    assert n_coarse_clusters(500) == 16  # fixture scale: floor
    assert n_coarse_clusters(2000) == 16
    assert n_coarse_clusters(1_000_000) == 1000
    assert n_coarse_clusters(10**9) == 10**6


def test_quantizer_sample_cap_tracks_k():
    assert quantizer_sample_cap(16) == 4096
    assert quantizer_sample_cap(1000) == 8000
    assert quantizer_sample_cap(10**6) == 65536  # documented trainer cap


def _skewed_cone(n, d=16, seed=7):
    """Deterministic tightly-concentrated integer vectors: one dominant
    direction + small jitter — a single coarse cluster in practice."""
    rng = np.random.default_rng(seed)
    base = rng.integers(-3, 4, size=(1, d))
    return np.tile(base * 5, (n, 1)) + rng.integers(-1, 2, size=(n, d))


def test_sem_split_units_partitions_and_bounds():
    X = _skewed_cone(500).astype(np.int64)
    ids = np.arange(500) * 3 + 1
    units = _sem_split_units(X, ids, 64)
    cover = np.sort(np.concatenate(units))
    assert np.array_equal(cover, np.arange(500)), "must partition exactly"
    assert max(len(u) for u in units) <= 64, "greedy unit over the cap"
    assert len(units) >= 8
    # deterministic across calls
    units2 = _sem_split_units(X, ids, 64)
    assert all(np.array_equal(a, b) for a, b in zip(units, units2))


def test_sem_split_units_identical_vectors_colocate():
    X = _skewed_cone(400).astype(np.int64)
    X[100] = X[7]  # plant an exact copy
    ids = np.arange(400)
    units = _sem_split_units(X, ids, 200)
    unit_of = {int(i): ui for ui, u in enumerate(units) for i in u}
    assert unit_of[7] == unit_of[100]


def test_sem_split_units_small_cluster_passthrough():
    X = _skewed_cone(50).astype(np.int64)
    ids = np.arange(50)
    units = _sem_split_units(X, ids, 64)
    assert len(units) == 1 and len(units[0]) == 50


@pytest.mark.spark
def test_dedup_semantic_bounded_greedy_still_drops_copies(spark):
    """Force the second-level split on the real fixture (max_greedy=32
    is under the ~40-row average coarse cluster) — planted exact copies
    must still drop, every dropped row still names a kept keeper in its
    cluster, and the recorded n_clusters must be the corpus-derived k."""
    from table_recognition_spark.operators.dedup import dedup_semantic

    rows = dedup_semantic(spark, SF, max_greedy=32).collect()
    by_id = {r.vec_id: r for r in rows}
    assert all(r.n_clusters == 16 for r in rows)  # 618 vectors -> floor
    exact = [r for r in rows if 100000 <= r.vec_id < 200000]
    assert exact, "fixture must plant exact copies"
    for r in exact:
        orig = by_id[r.vec_id - 100000]
        assert not (r.kept and orig.kept), f"pair {r.vec_id} both kept"
    for r in rows:
        if not r.kept:
            keeper = by_id[r.kept_by]
            assert keeper.kept and keeper.cluster == r.cluster
