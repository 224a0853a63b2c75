"""Geometric input features (the "input colorer").

Node features (4) and edge features (6) with the exact semantics of the
reference's GeometryGraphColorer
(/root/reference/table_recognition/graph/colorers/geometry_graph_colorer.py:28-165):

node  = [cx/W, cy/H, bbox_w/W, bbox_h/H]                      (:28-40)
edge  = [center distance (normalized),                         (:53-55)
         midpoint x, midpoint y (normalized),                  (:57-59)
         orientation in degrees with the <5°/>175° → 180 snap  (:61-77)
         occlusion-corrected x overlap / min width,            (:79-125)
         occlusion-corrected y overlap / min height]           (:127-156)

Quirks preserved deliberately (SURVEY.md §2.10.8):
- orientation uses *raw integer* centers, the distance/midpoint use
  normalized centers;
- the right node is the one with strictly greater cx (ties → node2);
- raw overlap ≤ 0 stays 0 and is NOT normalized; positive overlap is
  occlusion-corrected with closed-interval pixel ranges then normalized
  by the smaller side;
- an overlap fully occluded (empty pixel set) becomes 0.
"""

from __future__ import annotations

import sys

import numpy as np

from .bbox import bbox_centers, rects_intersect

_EPS = sys.float_info.epsilon


def node_features(bboxes: np.ndarray, img_w: int, img_h: int) -> np.ndarray:
    """(n, 4) float32 node input features."""
    b = np.asarray(bboxes, dtype=np.float64)
    c = bbox_centers(bboxes).astype(np.float64)
    f = np.empty((len(b), 4), dtype=np.float64)
    f[:, 0] = c[:, 0] / img_w
    f[:, 1] = c[:, 1] / img_h
    f[:, 2] = np.abs(b[:, 2] - b[:, 0]) / img_w
    f[:, 3] = np.abs(b[:, 3] - b[:, 1]) / img_h
    return f.astype(np.float32)


def _corrected_overlap(lo, hi, occ_lo, occ_hi):
    """Pixel-range subtraction (geometry_graph_colorer.py:107-120).

    Start with the closed integer range [lo, hi]; subtract each occluder's
    closed range; return (last - first) of what survives, else 0.
    """
    width = hi - lo + 1
    mask = np.ones(width, dtype=bool)
    for a, b in zip(occ_lo, occ_hi):
        s = max(int(a), lo) - lo
        e = min(int(b), hi) - lo
        if e >= s:
            mask[s : e + 1] = False
    idx = np.flatnonzero(mask)
    if idx.size == 0:
        return 0.0
    return float(idx[-1] - idx[0])


def edge_features(
    edges: np.ndarray, bboxes: np.ndarray, img_w: int, img_h: int
) -> np.ndarray:
    """(E, 6) float32 edge input features."""
    E = len(edges)
    if E == 0:
        return np.empty((0, 6), dtype=np.float32)

    b = np.asarray(bboxes, dtype=np.int64)
    c = bbox_centers(b)  # int centers
    src = edges[:, 0]
    dst = edges[:, 1]

    c1 = c[src].astype(np.float64)
    c2 = c[dst].astype(np.float64)
    n1 = np.stack([c1[:, 0] / img_w, c1[:, 1] / img_h], axis=1)
    n2 = np.stack([c2[:, 0] / img_w, c2[:, 1] / img_h], axis=1)

    distance = np.linalg.norm(n1 - n2, axis=1)
    avg = (n1 + n2) / 2.0

    # orientation on raw int centers (:61-77)
    ci1 = c[src]
    ci2 = c[dst]
    n1_right = ci1[:, 0] > ci2[:, 0]
    right = np.where(n1_right[:, None], ci1, ci2).astype(np.float64)
    left = np.where(n1_right[:, None], ci2, ci1).astype(np.float64)
    x_dist = right[:, 0] - left[:, 0]
    y_dist = np.abs(right[:, 1] - left[:, 1])
    orientation = np.degrees(np.arctan(y_dist / (x_dist + _EPS)))
    flip = (right[:, 1] - left[:, 1]) > 0
    orientation = np.where(flip, 90.0 + (90.0 - orientation), orientation)
    orientation = np.where(
        (orientation < 5.0) | (orientation > 175.0), 180.0, orientation
    )

    # raw overlaps (:83-91), closed-int coordinates
    b1 = b[src]
    b2 = b[dst]
    x_min = np.maximum(b1[:, 0], b2[:, 0])
    x_max = np.minimum(b1[:, 2], b2[:, 2])
    x_raw = np.maximum(0, x_max - x_min)
    y_min = np.maximum(b1[:, 1], b2[:, 1])
    y_max = np.minimum(b1[:, 3], b2[:, 3])
    y_raw = np.maximum(0, y_max - y_min)

    x_overlap = x_raw.astype(np.float64)
    y_overlap = y_raw.astype(np.float64)

    # occlusion boxes for edges with positive raw overlap (:95-98, :127-130)
    x_idx = np.flatnonzero(x_raw > 0)
    y_idx = np.flatnonzero(y_raw > 0)

    if x_idx.size:
        ys = np.sort(
            np.stack(
                [b1[x_idx, 1], b2[x_idx, 1], b1[x_idx, 3], b2[x_idx, 3]], axis=1
            ),
            axis=1,
        )
        boxes = np.stack(
            [x_min[x_idx], ys[:, 1], x_max[x_idx], ys[:, 2]], axis=1
        )
        hits = rects_intersect(boxes, b)  # (len(x_idx), n)
        hits[np.arange(len(x_idx)), src[x_idx]] = False
        hits[np.arange(len(x_idx)), dst[x_idx]] = False
        min_w = np.minimum(
            np.abs(b1[:, 2] - b1[:, 0]), np.abs(b2[:, 2] - b2[:, 0])
        ).astype(np.float64)
        for row, e in enumerate(x_idx):
            occ = np.flatnonzero(hits[row])
            if occ.size:
                ov = _corrected_overlap(
                    int(x_min[e]), int(x_max[e]), b[occ, 0], b[occ, 2]
                )
            else:
                ov = float(x_max[e] - x_min[e])
            # normalization is unconditional in the reference (:121-122);
            # a fully-occluded (empty) range gives 0 / min_w == 0
            x_overlap[e] = ov / min_w[e]

    if y_idx.size:
        xs = np.sort(
            np.stack(
                [b1[y_idx, 0], b2[y_idx, 0], b1[y_idx, 2], b2[y_idx, 2]], axis=1
            ),
            axis=1,
        )
        boxes = np.stack(
            [xs[:, 1], y_min[y_idx], xs[:, 2], y_max[y_idx]], axis=1
        )
        hits = rects_intersect(boxes, b)
        hits[np.arange(len(y_idx)), src[y_idx]] = False
        hits[np.arange(len(y_idx)), dst[y_idx]] = False
        min_h = np.minimum(
            np.abs(b1[:, 3] - b1[:, 1]), np.abs(b2[:, 3] - b2[:, 1])
        ).astype(np.float64)
        for row, e in enumerate(y_idx):
            occ = np.flatnonzero(hits[row])
            if occ.size:
                ov = _corrected_overlap(
                    int(y_min[e]), int(y_max[e]), b[occ, 1], b[occ, 3]
                )
            else:
                ov = float(y_max[e] - y_min[e])
            # unconditional normalization, mirroring :155-156
            y_overlap[e] = ov / min_h[e]

    feats = np.stack(
        [distance, avg[:, 0], avg[:, 1], orientation, x_overlap, y_overlap],
        axis=1,
    )
    return feats.astype(np.float32)


# --------------------------------------------------- J6 polygon visibility
# The reference defines polygons_see_each_other (geometry_graph_colorer
# .py:171-228) but never runs it: the call site is commented out (:159)
# and the feature is commented out of the edge vector (:164), and the
# inner split-bookkeeping branch is unreachable (split() returns either
# >= 2 or <= 1 geoms, so the `else` arm can't execute). This is a
# canonical respec over our bbox data model (node polygons ARE bbox
# corner rectangles, reference node.py:30-35):
#
#   edge (a, b) is "visible" iff no third node's bbox strictly cuts the
#   convex hull of a's and b's corners — i.e. overlaps the hull's
#   interior with positive area (SAT over the hull-edge normals plus the
#   two axis normals; touching boundaries don't cut, matching
#   shapely.split's behavior of not splitting on a tangent), with one
#   exception mirroring the reference's split() semantics: a bbox that
#   CONTAINS the whole hull leaves no boundary inside it and therefore
#   does not cut.
#
# The alphashape(α=0.5) hull of the reference degenerates to the convex
# hull for two disjoint axis-aligned rectangles' corner sets, which is
# the only shape the dead code could ever have received.


def _convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew monotone chain; returns CCW hull vertices (k, 2)."""
    pts = np.unique(np.asarray(pts, dtype=np.float64), axis=0)
    if len(pts) <= 2:
        return pts

    def half(points):
        out: list = []
        for p in points:
            while (
                len(out) >= 2
                and (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
                <= 0
            ):
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def _rect_cuts_hull(hull: np.ndarray, rect: np.ndarray) -> bool:
    """True iff the rect's boundary passes through the hull's interior:
    positive-area overlap (strict SAT) and the rect does not contain the
    entire hull."""
    x0, y0, x1, y1 = rect
    if (
        hull[:, 0].min() >= x0
        and hull[:, 0].max() <= x1
        and hull[:, 1].min() >= y0
        and hull[:, 1].max() <= y1
    ):
        return False  # rect swallows the hull: boundary never enters it
    corners = np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=np.float64
    )
    # axis-aligned separating axes (rect normals)
    if (
        hull[:, 0].max() <= x0
        or x1 <= hull[:, 0].min()
        or hull[:, 1].max() <= y0
        or y1 <= hull[:, 1].min()
    ):
        return False
    # hull-edge normals
    k = len(hull)
    for i in range(k):
        ex, ey = hull[(i + 1) % k] - hull[i]
        nx, ny = -ey, ex  # inward for CCW
        hp = hull @ (nx, ny)
        rp = corners @ (nx, ny)
        if rp.max() <= hp.min() or hp.max() <= rp.min():
            return False
    return True


def polygons_see_each_other(
    bboxes: np.ndarray, a: int, b: int
) -> bool:
    """J6 (canonical respec of reference dead code, see block comment):
    do nodes ``a`` and ``b`` see each other — is the convex hull of
    their corners uncut by every other node's bbox?"""
    bx = np.asarray(bboxes, dtype=np.float64)
    ca = bx[a]
    cb = bx[b]
    hull = _convex_hull(
        np.array(
            [
                [ca[0], ca[1]], [ca[2], ca[1]], [ca[2], ca[3]], [ca[0], ca[3]],
                [cb[0], cb[1]], [cb[2], cb[1]], [cb[2], cb[3]], [cb[0], cb[3]],
            ]
        )
    )
    for i in range(len(bx)):
        if i == a or i == b:
            continue
        if _rect_cuts_hull(hull, bx[i]):
            return False
    return True


def edge_visibility_features(
    bboxes: np.ndarray, edges: np.ndarray
) -> np.ndarray:
    """Per-edge J6 feature column (float32 0/1), the value the reference
    would have appended to the edge vector had :164 been uncommented.
    Not part of the default 6-feature vector — kept optional exactly as
    the reference keeps it disabled."""
    out = np.empty(len(edges), dtype=np.float32)
    for r, (s, d) in enumerate(np.asarray(edges)):
        out[r] = float(polygons_see_each_other(bboxes, int(s), int(d)))
    return out
