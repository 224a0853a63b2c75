"""Standalone connected-components operator (operators/dedup.py).

Stress shapes the query-gate fixture can't produce: a 400-node chain
(worst case for the round-2 min-label propagation — O(diameter) rounds;
the local-contraction loop must finish in far fewer), a star, many
disjoint cliques, singleton-free invariants, and equality against a
plain union-find reference on a seeded random graph.
"""
from __future__ import annotations

import numpy as np
import pytest


def _reference_components(edges):
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {x: find(x) for x in parent}


def _run(spark, edges, cap=None):
    import pandas as pd

    from table_recognition_spark.operators.dedup import connected_components

    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["doc_a", "doc_b"]).astype("int64")
    )
    kw = {} if cap is None else {"local_pairs_cap": cap}
    return {
        r["doc_id"]: r["group_id"]
        for r in connected_components(df, **kw).collect()
    }


@pytest.mark.spark
@pytest.mark.parametrize("cap", [None, 0])
def test_long_chain(spark, cap):
    # cap=0 forces the distributed contraction loop (the round-7
    # driver-local fast path must never silently replace its coverage)
    edges = [(i, i + 1) for i in range(400)]
    got = _run(spark, edges, cap)
    assert got == {i: 0 for i in range(401)}


@pytest.mark.spark
def test_star_and_cliques(spark):
    edges = [(0, i) for i in range(1, 50)]
    edges += [
        (100 * k + a, 100 * k + b)
        for k in range(1, 5)
        for a in range(5)
        for b in range(a + 1, 5)
    ]
    got = _run(spark, edges)
    assert got == _reference_components(edges)


@pytest.mark.spark
def test_star_and_cliques_distributed_path(spark):
    edges = [(0, i) for i in range(1, 50)]
    edges += [
        (100 * k + a, 100 * k + b)
        for k in range(1, 5)
        for a in range(5)
        for b in range(a + 1, 5)
    ]
    assert _run(spark, edges, cap=0) == _reference_components(edges)


@pytest.mark.spark
def test_random_graph_matches_union_find(spark):
    rng = np.random.default_rng(77)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 300, (500, 2))
        if a != b
    ]
    got = _run(spark, edges)
    assert got == _reference_components(edges)


@pytest.mark.spark
def test_local_path_equals_distributed_loop(spark):
    rng = np.random.default_rng(13)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 200, (300, 2))
        if a != b
    ]
    assert _run(spark, edges) == _run(spark, edges, cap=0)
