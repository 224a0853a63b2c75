"""Cell-text assembly — required by the north star, ABSENT in the reference
(it never reads OCR text content, SURVEY.md §2.11). Canonical spec, frozen
here:

1. Take the undirected graph of edges predicted class 0 ("cell").
2. Connected components = text lines belonging to one table cell.
3. Component text = member line texts joined by "\\n" in
   (ymin, xmin, line_id) order.
4. Components ordered by (ymin, xmin, min line_id) of the component bbox;
   emitted in that order as the cell list.
"""

from __future__ import annotations

import numpy as np

from .gnn import EDGE_CLASS_CELL


def _union_find(n: int, pairs: np.ndarray) -> np.ndarray:
    parent = np.arange(n, dtype=np.int64)

    def find(a):
        root = a
        while parent[root] != root:
            root = parent[root]
        while parent[a] != root:
            parent[a], a = root, parent[a]
        return root

    for s, d in pairs:
        rs, rd = find(s), find(d)
        if rs != rd:
            # deterministic: smaller root wins
            if rs < rd:
                parent[rd] = rs
            else:
                parent[rs] = rd
    for i in range(n):
        parent[i] = find(i)
    return parent


def assemble_cells(
    edge_index: np.ndarray,
    edge_cls: np.ndarray,
    bboxes: np.ndarray,
    texts: list,
) -> list:
    """Returns ordered list of cell text strings.

    ``edge_index``: (E, 2); ``edge_cls``: (E,) predicted classes;
    ``bboxes``: (n, 4); ``texts``: n line strings (line_id == row index).
    Isolated lines form singleton cells.
    """
    n = len(bboxes)
    if n == 0:
        return []
    cell_pairs = (
        edge_index[edge_cls == EDGE_CLASS_CELL]
        if len(edge_index)
        else np.empty((0, 2), dtype=np.int64)
    )
    comp = _union_find(n, cell_pairs)

    b = np.asarray(bboxes, dtype=np.int64)
    order = np.lexsort((np.arange(n), b[:, 0], b[:, 1]))  # (ymin, xmin, id)

    members: dict = {}
    for i in order:
        members.setdefault(comp[i], []).append(int(i))

    comps = []
    for root, ids in members.items():
        ymin = int(b[ids, 1].min())
        xmin = int(b[ids, 0].min())
        comps.append((ymin, xmin, min(ids), ids))
    comps.sort(key=lambda t: (t[0], t[1], t[2]))

    return ["\n".join(texts[i] for i in ids) for _, _, _, ids in comps]
