"""Node-visibility edge discovery (the reference's configured default,
config.ini:9) — canonical re-specification.

Reference algorithm (/root/reference/table_recognition/graph/
edge_discovery/node_visibility.py:12-196): render a label image (one id
per text-line bbox), cast rays from each node center every 10° over
0–180°, find the first foreign label on each side of the node along the
ray, bucket candidates by 30° angular bin over 0–360°, keep the nearest
candidate per bin, emit edges both directions.

The reference implementation is nondeterministic and lossy
(SURVEY.md §2.10.2-4): a 3-process split silently drops two nodes,
iteration order is Python-set order, the label render also scribbles
cv2.putText digits into the label plane, and equal-distance ties depend
on dict/sort internals. This module freezes the canonical spec instead:

- ALL nodes are processed, ordered by id; label rectangles are painted in
  ascending id order (later ids overwrite overlaps).
- No text is painted into the label image (the putText call in the
  reference is a debug artifact that corrupts labels).
- Rays: θ ∈ {0°,10°,…,180°}; the "right" side of ray θ marches in
  direction (sin θ, −cos θ) (for θ∈{0°,180°}: straight down, matching the
  reference's vertical special case); the "left" side is the opposite.
  Pixels are sampled at unit steps from the node center to the image
  border.
- On each side: own-id pixels are excised (skip the side if the node's
  own id never appears on it — overlap guard, reference :43-46); the
  first non-zero foreign label after the last own pixel is the candidate,
  at distance (step − last_own_step).
- Bin = θ_total // 30 with θ_total = θ for right, 180+θ for left
  (bins 0..12; θ=0 and θ=180 duplicate a vertical ray, preserved).
- Per bin keep min by (distance, θ_total, neighbour id) — the frozen
  total tie-break.
- Edges both directions, reflexive-filtered, output sorted by (src, dst).
"""

from __future__ import annotations

import numpy as np

from .bbox import bbox_centers

SAMPLING_RATE = 10  # degrees between rays (reference :14)
WINDOW_SIZE = 30  # angular bin width (reference :62,:69)


def render_label_image(bboxes: np.ndarray, img_w: int, img_h: int) -> np.ndarray:
    """(h, w) int32 label plane; pixel value = node id + 1, 0 = empty.
    Rectangles painted in ascending id order; the reference paints
    [min_y:max_y, min_x:max_x] (exclusive upper edge) — preserved."""
    img = np.zeros((img_h, img_w), dtype=np.int32)
    b = np.asarray(bboxes, dtype=np.int64)
    for i in range(len(b)):
        x0, y0, x1, y1 = b[i]
        img[max(y0, 0) : max(y1, 0), max(x0, 0) : max(x1, 0)] = i + 1
    return img


def _ray_steps(img_w: int, img_h: int) -> int:
    return int(np.ceil(np.hypot(img_w, img_h))) + 1


def visibility_edges(
    bboxes: np.ndarray, img_w: int, img_h: int
) -> np.ndarray:
    """Discover directed edges; returns int64 (E, 2) sorted by (src, dst)."""
    n = len(bboxes)
    if n <= 1:
        return np.empty((0, 2), dtype=np.int64)

    labels = render_label_image(bboxes, img_w, img_h)
    centers = bbox_centers(bboxes)  # (n, 2) int
    T = _ray_steps(img_w, img_h)
    t = np.arange(T, dtype=np.float64)  # includes t=0 (the center pixel)

    # best[node][bin] = (dist, theta_total, nbr)
    best: list = [dict() for _ in range(n)]

    for theta in range(0, 181, SAMPLING_RATE):
        if theta in (0, 180):
            d = np.array([0.0, 1.0])
        else:
            rad = np.radians(float(theta))
            d = np.array([np.sin(rad), -np.cos(rad)])
        for side, (sign, theta_total) in enumerate(
            [(1.0, theta), (-1.0, 180 + theta)]
        ):
            # all nodes' ray pixels at once: (n, T)
            xs = np.rint(centers[:, 0, None] + sign * d[0] * t).astype(np.int64)
            ys = np.rint(centers[:, 1, None] + sign * d[1] * t).astype(np.int64)
            inside = (xs >= 0) & (xs < img_w) & (ys >= 0) & (ys < img_h)
            vals = np.zeros((n, T), dtype=np.int32)
            vals[inside] = labels[ys[inside], xs[inside]]

            own = vals == (np.arange(1, n + 1, dtype=np.int32)[:, None])
            has_own = own.any(axis=1)
            # last own step per node (0 where none — masked by has_own)
            last_own = np.where(
                has_own, T - 1 - np.argmax(own[:, ::-1], axis=1), 0
            )
            # foreign hit: first non-zero, non-own pixel after last_own
            after = np.arange(T)[None, :] > last_own[:, None]
            cand = after & inside & (vals > 0) & ~own
            has_hit = cand.any(axis=1)
            first_hit = np.argmax(cand, axis=1)

            ok = has_own & has_hit
            for i in np.flatnonzero(ok):
                hit_t = int(first_hit[i])
                nbr = int(vals[i, hit_t]) - 1
                if nbr == i:
                    continue
                dist = hit_t - int(last_own[i])
                key = theta_total // WINDOW_SIZE
                cur = best[i].get(key)
                cand_tuple = (dist, theta_total, nbr)
                if cur is None or cand_tuple < cur:
                    best[i][key] = cand_tuple

    pairs = []
    for i in range(n):
        for _, (_, _, nbr) in sorted(best[i].items()):
            pairs.append((i, nbr))
            pairs.append((nbr, i))
    if not pairs:
        return np.empty((0, 2), dtype=np.int64)
    edges = np.array(pairs, dtype=np.int64)
    edges = edges[edges[:, 0] != edges[:, 1]]
    return np.unique(edges, axis=0)
