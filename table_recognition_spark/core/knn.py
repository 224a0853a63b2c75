"""k-NN edge discovery over text-line bounding boxes.

Canonical re-specification of the reference's R-tree k-NN join
(/root/reference/table_recognition/graph/edge_discovery/k_nearest_neighbors.py:6-33):

- each node queries its K=4 nearest boxes by rectangle min-distance; the
  node itself is among the results (distance 0) and is removed by the
  reflexive filter, leaving ≈3 net neighbours (SURVEY.md §2.10.1);
- edges are added in BOTH directions and deduplicated on (src, dst);
- ties at equal distance are rtree-insertion-order-dependent in the
  reference (nondeterministic); our frozen canonical rule is
  **(distance, neighbour id) ascending** — decided once, here.
- the reference's edge-set iteration order is a Python set order
  (nondeterministic, SURVEY.md §2.10.4); our canonical output order is
  **sorted by (src, dst)**.
"""

from __future__ import annotations

import numpy as np

from .bbox import rect_min_distance

K_NEIGHBORS = 4  # reference k_nearest_neighbors.py:7


def knn_edges(bboxes: np.ndarray, k: int = K_NEIGHBORS) -> np.ndarray:
    """Discover directed edges; returns int64 (E, 2) sorted by (src, dst).

    ``bboxes``: (n, 4) int array. Node ids are row indices (the reference's
    NODE_COUNTER assigns ids in document order, node.py:9-10, and our
    fixtures emit ocr_lines in that same order).
    """
    n = len(bboxes)
    if n == 0:
        return np.empty((0, 2), dtype=np.int64)

    dist = rect_min_distance(bboxes, bboxes)  # (n, n), self-distance 0
    kk = min(k, n)

    # total order: (distance, neighbour id) — lexsort keys are last-first
    ids = np.arange(n, dtype=np.int64)
    order = np.lexsort((np.broadcast_to(ids, (n, n)), dist), axis=1)
    nearest = order[:, :kk]  # (n, kk) neighbour ids incl. self

    src = np.repeat(ids, kk)
    dst = nearest.reshape(-1)
    # both directions (k_nearest_neighbors.py:22-25)
    edges = np.concatenate(
        [np.stack([src, dst], axis=1), np.stack([dst, src], axis=1)], axis=0
    )
    # reflexive filter (k_nearest_neighbors.py:28)
    edges = edges[edges[:, 0] != edges[:, 1]]
    # dedup + canonical (src, dst) order
    edges = np.unique(edges, axis=0)
    return edges
