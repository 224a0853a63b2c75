"""Ground-truth labeling rules (the "output colorer").

Fixture/test-side only: derives reference-identical node and edge labels
from GT cells, per /root/reference/table_recognition/graph/colorers/output.py.
Quirks preserved verbatim (SURVEY.md §2.10.5/6/7):

- ``majority_type``: "header_empty" is listed at priority 1 AND 0 in the
  reference dict literal (output.py:142); Python's last-wins makes its
  effective priority 0 — we encode the *effective* table.
- edge-class rule inversion: identical row+col range ⇒ cell; row-range
  subset ⇒ **vertical**; col-range subset ⇒ **horizontal** (output.py:107-126).
- nodes with no intersecting GT cell keep type None and label "data"
  (output.py:54-56).
- node→cell assignment = max polygon IoU among rectangle-intersecting cells
  (output.py:78-95); all polygons are bbox rectangles so rect IoU is exact.
"""

from __future__ import annotations

import numpy as np

from .bbox import rect_iou, rects_intersect

# effective priorities after Python dict last-wins on the duplicate key
MAJORITY_PRIORITY = {
    "data": 1,
    "header": 1,
    "header_mark": 1,
    "header_empty": 0,
    "data_empty": 0,
    "data_mark": 0,
}

NODE_LABEL = {
    "header": 0,
    "header_mark": 0,
    "header_empty": 0,
    "data": 1,
    "data_mark": 1,
    "data_empty": 1,
    None: 1,
}

EDGE_LABEL = {"cell": 0, "horizontal": 1, "vertical": 2, "no-relationship": 3}


def majority_type(types: list) -> str:
    """max() over the priority map — ties resolved by Python max semantics
    (first maximal element in iteration order), as in output.py:140-144."""
    return max(types, key=lambda t: MAJORITY_PRIORITY[t])


def edge_type(pos1, pos2) -> str:
    """pos = (start_row, end_row, start_col, end_col) or None (output.py:98-126)."""
    if pos1 is None or pos2 is None:
        return "no-relationship"
    r1 = set(range(pos1[0], pos1[1] + 1))
    c1 = set(range(pos1[2], pos1[3] + 1))
    r2 = set(range(pos2[0], pos2[1] + 1))
    c2 = set(range(pos2[2], pos2[3] + 1))
    if r1 == r2 and c1 == c2:
        return "cell"
    if r1 <= r2 or r2 <= r1:
        return "vertical"
    if c1 <= c2 or c2 <= c1:
        return "horizontal"
    return "no-relationship"


def label_graph(
    node_bboxes: np.ndarray,
    edges: np.ndarray,
    cell_bboxes: np.ndarray,
    cell_types: list,
    cell_grid: np.ndarray,
):
    """Returns (node_labels (n,), edge_labels (E,)) int arrays.

    ``cell_grid``: (m, 4) int (start_row, end_row, start_col, end_col).
    """
    n = len(node_bboxes)
    node_labels = np.full(n, NODE_LABEL[None], dtype=np.int64)
    node_pos = [None] * n
    if len(cell_bboxes):
        inter = rects_intersect(node_bboxes, cell_bboxes)  # (n, m)
        iou = rect_iou(node_bboxes, cell_bboxes)
        for i in range(n):
            hits = np.flatnonzero(inter[i])
            if hits.size == 0:
                continue
            node_labels[i] = NODE_LABEL[
                majority_type([cell_types[j] for j in hits])
            ]
            best = hits[int(np.argmax(iou[i, hits]))]
            node_pos[i] = tuple(int(v) for v in cell_grid[best])

    edge_labels = np.array(
        [EDGE_LABEL[edge_type(node_pos[s], node_pos[d])] for s, d in edges],
        dtype=np.int64,
    )
    return node_labels, edge_labels
