"""Debug visualization sink (SURVEY S8; reference graph.py:84-136).

The reference's ``Graph.visualize`` draws, with cv2, per-image overlays:
node bounding rectangles and filled center dots colored by node type,
and edge lines between node centers colored by edge type, written as
``graph_<img>.png`` files to a configured directory.

Canonical respec without cv2 (environment ships no image libs): the
overlay is rendered onto the grayscale image plane with numpy rect/line
rasterization using a deterministic per-class gray level (the
reference's BGR colors collapse to one channel here; the debug purpose —
"which class is where" — is preserved, and the class→level map is the
module constant below). The sink is a ``mapInPandas`` over the media
table joined with the kernel's node/edge outputs, emitting
``(media_ref, overlay_png)`` — written with the normal parquet/files
writer, exactly how a 100-TB job would spot-check a sampled partition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, types as T

from ..fixtures.generate import png_encode
from .multimodal import decode_image

# class → gray level (the reference's color table, graph.py:85-100,
# collapsed to one channel; distinct per class, 0 reserved for lines)
NODE_LEVELS = {
    "header": 60,
    "header_mark": 60,
    "data": 120,
    "data_empty": 200,
    "header_empty": 200,
    "data_mark": 200,
    None: 20,
}
EDGE_LEVELS = {
    "horizontal": 80,
    "vertical": 160,
    "cell": 40,
    "no-relationship": None,  # reference draws no line for these
}

VIS_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("overlay_png", T.BinaryType()),
    ]
)


def draw_rect(img: np.ndarray, x0: int, y0: int, x1: int, y1: int,
              level: int, thickness: int = 2) -> None:
    """Rectangle outline, clipped to the image (cv2.rectangle respec)."""
    h, w = img.shape
    for t in range(thickness):
        xa, ya = x0 + t, y0 + t
        xb, yb = x1 - t, y1 - t
        if xa > xb or ya > yb:
            break
        xs0, xs1 = max(xa, 0), min(xb + 1, w)
        ys0, ys1 = max(ya, 0), min(yb + 1, h)
        if 0 <= ya < h:
            img[ya, xs0:xs1] = level
        if 0 <= yb < h:
            img[yb, xs0:xs1] = level
        if 0 <= xa < w:
            img[ys0:ys1, xa] = level
        if 0 <= xb < w:
            img[ys0:ys1, xb] = level


def draw_disc(img: np.ndarray, cx: int, cy: int, r: int, level: int) -> None:
    """Filled circle (cv2.circle thickness=-1 respec)."""
    h, w = img.shape
    y0, y1 = max(cy - r, 0), min(cy + r + 1, h)
    x0, x1 = max(cx - r, 0), min(cx + r + 1, w)
    if y0 >= y1 or x0 >= x1:
        return
    yy, xx = np.mgrid[y0:y1, x0:x1]
    mask = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
    img[y0:y1, x0:x1][mask] = level


def draw_line(img: np.ndarray, x0: int, y0: int, x1: int, y1: int,
              level: int) -> None:
    """Line segment via uniform sampling (cv2.line respec, thickness 1)."""
    h, w = img.shape
    n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
    ts = np.linspace(0.0, 1.0, n)
    xs = np.rint(x0 + (x1 - x0) * ts).astype(np.int64)
    ys = np.rint(y0 + (y1 - y0) * ts).astype(np.int64)
    ok = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    img[ys[ok], xs[ok]] = level


def render_overlay(image_bytes: bytes, nodes: list, edges: list) -> bytes:
    """One image's overlay: nodes = [(x0,y0,x1,y1,cx,cy,type)], edges =
    [(cx0,cy0,cx1,cy1,type)] — returns PNG bytes."""
    img = decode_image(image_bytes).copy()
    for cx0, cy0, cx1, cy1, etype in edges:
        level = EDGE_LEVELS.get(etype, 0)
        if level is not None:
            draw_line(img, int(cx0), int(cy0), int(cx1), int(cy1), level)
    for x0, y0, x1, y1, cx, cy, ntype in nodes:
        level = NODE_LEVELS.get(ntype, NODE_LEVELS[None])
        draw_rect(img, int(x0), int(y0), int(x1) - 1, int(y1) - 1, level)
        draw_disc(img, int(cx), int(cy), 10, level)
    return png_encode(img)


def visualize_sink(media_df: DataFrame) -> DataFrame:
    """Render a per-image debug overlay of the OCR-line graph: each line's
    bbox rectangle + center disc (type unknown pre-kernel → the None
    level) over the page image. Returns (media_ref, overlay_png); callers
    ``.write`` it wherever spot-checks land."""

    def fn(batches):
        for pdf in batches:
            refs, pngs = [], []
            for ref, img_bytes, lines in zip(
                pdf["media_ref"], pdf["image"], pdf["ocr_lines"]
            ):
                nodes = []
                for line in lines:
                    xs = [p["x"] for p in line["points"]]
                    ys = [p["y"] for p in line["points"]]
                    x0, y0, x1, y1 = min(xs), min(ys), max(xs), max(ys)
                    cx = int(x0 + (x1 - x0) / 2)
                    cy = int(y0 + (y1 - y0) / 2)
                    nodes.append((x0, y0, x1, y1, cx, cy, None))
                refs.append(ref)
                pngs.append(render_overlay(img_bytes, nodes, []))
            yield pd.DataFrame(
                {"media_ref": refs, "overlay_png": pngs}
            )

    return media_df.select("media_ref", "image", "ocr_lines").mapInPandas(
        fn, VIS_SCHEMA
    )
