"""Seeded synthetic corpus generator (FIXTURES.md).

Produces the three tables the pipeline consumes / is tested against:

  docs(doc_id, spans:array<struct<kind,text,media_ref,offset>>)
  media(media_ref, image:binary(PNG), width, height,
        ocr_lines:array<struct<line_id, points:array<struct<x,y>>, text>>)
  gt_cells(media_ref, cells:array<struct<type, start_row, end_row,
           start_col, end_col, points>>)

Everything is derived from a master seed (default 42) via
``numpy.random.default_rng`` — fully deterministic, no external data.
Images are real PNGs rendered with a tiny zlib-only encoder: white canvas,
black grid lines, gray ink boxes where the OCR line polygons sit, so the
binary column is honest (decodable) without any image library.

The shapes mirror the reference's inputs: ocr_lines ≙ PAGE-XML text-line
Coords (graph.py:55-59), gt_cells ≙ cTDaR cell XML (graph.py:64-76), with
line_id assigned in document order (NODE_COUNTER semantics, node.py:9-10).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_VOCAB = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor"
).split()

_MAIN_SENTENCES = [
    "The quarterly revenue grew by {} percent across all regions.",
    "Researchers observed {} distinct migration patterns last season.",
    "The committee approved {} new infrastructure proposals.",
    "Archived records list {} shipments for the winter period.",
    "The survey covered {} households in the northern district.",
]

_CELL_TYPES_HEADER = ["header", "header", "header", "header_mark", "header_empty"]
_CELL_TYPES_DATA = ["data", "data", "data", "data", "data_mark", "data_empty"]


# ---------------------------------------------------------------- PNG ----
def png_encode(img: np.ndarray) -> bytes:
    """Encode an HxW uint8 grayscale array as a PNG (zlib only)."""
    h, w = img.shape

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def png_decode_gray8(data: bytes) -> np.ndarray:
    """Minimal decoder for the PNGs *we* produce (filter 0, 8-bit gray).
    Used by the multimodal decode UDF and tests."""
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, w, h, idat = 8, None, None, b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit, color = struct.unpack(">IIBB", body[:10])
            assert bit == 8 and color == 0, "only 8-bit grayscale supported"
        elif tag == b"IDAT":
            idat += body
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w + 1
    img = np.empty((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.uint8)
    for y in range(h):
        row = raw[y * stride : (y + 1) * stride]
        filt, vals = row[0], np.frombuffer(row[1:], dtype=np.uint8)
        if filt == 0:
            out = vals.copy()
        elif filt == 2:  # Up
            out = (vals.astype(np.int16) + prev).astype(np.uint8)
        else:  # pragma: no cover - our encoder emits filter 0 only
            raise ValueError(f"unsupported filter {filt}")
        img[y] = out
        prev = out
    return img


# ------------------------------------------------------------- tables ----
def _rand_words(rng, lo, hi):
    n = int(rng.integers(lo, hi + 1))
    return " ".join(_VOCAB[int(i)] for i in rng.integers(0, len(_VOCAB), n))


def _make_table_image(rng, media_ref: str):
    """Render one grid-table image; returns (media_row, gt_row)."""
    w = int(rng.integers(400, 1201))
    h = int(rng.integers(300, 901))
    rows = int(rng.integers(2, 9))
    cols = int(rng.integers(2, 7))
    has_header = rng.random() < 0.7

    x0, y0, x1, y1 = 20, 20, w - 20, h - 20
    # randomized monotone grid boundaries
    xs = np.sort(rng.uniform(0.1, 0.9, cols - 1))
    col_edges = [x0] + [int(x0 + t * (x1 - x0)) for t in xs] + [x1]
    ys = np.sort(rng.uniform(0.1, 0.9, rows - 1))
    row_edges = [y0] + [int(y0 + t * (y1 - y0)) for t in ys] + [y1]

    img = np.full((h, w), 255, dtype=np.uint8)
    for e in col_edges:
        img[y0:y1, max(e - 1, 0) : e + 1] = 0
    for e in row_edges:
        img[max(e - 1, 0) : e + 1, x0:x1] = 0

    ocr_lines, cells = [], []
    line_id = 0
    covered = set()
    for r in range(rows):
        for c in range(cols):
            if (r, c) in covered:
                continue
            # column-spanning cell with prob 0.1 (not in last column)
            span_c = 1
            if c + 1 < cols and rng.random() < 0.1:
                span_c = 2
                covered.add((r, c + 1))
            cx0, cx1 = col_edges[c], col_edges[c + span_c]
            cy0, cy1 = row_edges[r], row_edges[r + 1]

            is_header = has_header and r == 0
            pool = _CELL_TYPES_HEADER if is_header else _CELL_TYPES_DATA
            ctype = pool[int(rng.integers(0, len(pool)))]
            cells.append(
                {
                    "type": ctype,
                    "start_row": r,
                    "end_row": r,
                    "start_col": c,
                    "end_col": c + span_c - 1,
                    "points": [
                        {"x": cx0, "y": cy0},
                        {"x": cx1, "y": cy0},
                        {"x": cx1, "y": cy1},
                        {"x": cx0, "y": cy1},
                    ],
                }
            )

            n_lines = 2 if rng.random() < 0.2 else 1
            cw, ch = cx1 - cx0, cy1 - cy0
            if cw < 16 or ch < 12:
                n_lines = 0
            for li in range(n_lines):
                pad_x = int(rng.integers(3, max(4, cw // 6)))
                lh = max(4, min(12, ch // (n_lines + 1)))
                ly0 = cy0 + 3 + li * (lh + 3)
                ly1 = min(ly0 + lh, cy1 - 2)
                if ly1 <= ly0:
                    continue
                lx0 = cx0 + pad_x
                lx1 = cx1 - pad_x
                jit = rng.integers(-2, 3, size=4)
                bx0 = max(0, lx0 + int(jit[0]))
                by0 = max(0, ly0 + int(jit[1]))
                bx1 = min(w - 1, lx1 + int(jit[2]))
                by1 = min(h - 1, ly1 + int(jit[3]))
                if bx1 <= bx0 or by1 <= by0:
                    continue
                img[by0:by1, bx0:bx1] = 128  # fake ink
                text = f"r{r}c{c}" + ("" if li == 0 else f".{li}") + " " + _rand_words(rng, 1, 3)
                ocr_lines.append(
                    {
                        "line_id": line_id,
                        "points": [
                            {"x": bx0, "y": by0},
                            {"x": bx1, "y": by0},
                            {"x": bx1, "y": by1},
                            {"x": bx0, "y": by1},
                        ],
                        "text": text,
                    }
                )
                line_id += 1

    media_row = {
        "media_ref": media_ref,
        "image": png_encode(img),
        "width": w,
        "height": h,
        "ocr_lines": ocr_lines,
    }
    gt_row = {"media_ref": media_ref, "cells": cells}
    return media_row, gt_row


def _make_text_payload(rng, doc_idx: int, span_idx: int) -> str:
    main = _MAIN_SENTENCES[int(rng.integers(0, len(_MAIN_SENTENCES)))].format(
        int(rng.integers(2, 99))
    )
    nav = f"<nav class='menu'>home | about | doc {doc_idx}</nav>"
    aside = f"<aside>ad {span_idx}: {_rand_words(rng, 2, 4)}</aside>"
    footer = f"<footer>&copy; 2026 corp {doc_idx}</footer>"
    script = "<script>var t=1;</script>"
    parts = [nav]
    if rng.random() < 0.4:
        parts.append(aside)
    parts.append(f"<div><p>{main}</p><p>{_rand_words(rng, 3, 8)}.</p></div>")
    if rng.random() < 0.3:
        parts.append(script)
    parts.append(footer)
    return "".join(parts)


def make_corpus(
    n_docs: int = 50,
    n_media: int = 40,
    seed: int = 42,
    skew_doc: bool = False,
    text_only_frac: float = 0.6,
):
    """Returns (docs, media, gt_cells) as lists of plain dicts."""
    rng = np.random.default_rng(seed)

    media, gt = [], []
    for m in range(n_media):
        mrow, grow = _make_table_image(rng, f"img_{m:05d}")
        media.append(mrow)
        gt.append(grow)

    docs = []
    for d in range(n_docs):
        doc_id = f"doc_{d:06d}"
        text_only = rng.random() < text_only_frac or n_media == 0
        n_spans = int(rng.integers(1, 13))
        if skew_doc and d == 0 and n_media > 0:
            # one pathological media-heavy doc (SURVEY.md §5.5 salting test)
            text_only, n_spans = False, 100
            media_positions = set(range(100))
        elif text_only:
            media_positions = set()
        else:
            n_media_spans = int(rng.integers(1, min(4, n_spans + 1)))
            media_positions = set(
                int(i)
                for i in rng.choice(n_spans, size=n_media_spans, replace=False)
            )
        spans = []
        for s in range(n_spans):
            if s in media_positions:
                ref = f"img_{int(rng.integers(0, n_media)):05d}"
                spans.append(
                    {"kind": "media", "text": "", "media_ref": ref, "offset": s}
                )
            else:
                spans.append(
                    {
                        "kind": "text",
                        "text": _make_text_payload(rng, d, s),
                        "media_ref": "",
                        "offset": s,
                    }
                )
        docs.append({"doc_id": doc_id, "spans": spans})

    return docs, media, gt


# -------------------------------------------------------------- spark ----
DOCS_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)
MEDIA_SCHEMA = (
    "media_ref string, image binary, width int, height int, "
    "ocr_lines array<struct<line_id:int,"
    "points:array<struct<x:int,y:int>>,text:string>>"
)
GT_SCHEMA = (
    "media_ref string, cells array<struct<type:string,start_row:int,"
    "end_row:int,start_col:int,end_col:int,"
    "points:array<struct<x:int,y:int>>>>"
)


def corpus_to_spark(spark, docs, media, gt=None):
    """Create the three Spark DataFrames with explicit schemas."""

    def doc_row(d):
        return (
            d["doc_id"],
            [
                (s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in d["spans"]
            ],
        )

    def media_row(m):
        return (
            m["media_ref"],
            m["image"],
            m["width"],
            m["height"],
            [
                (
                    line["line_id"],
                    [(p["x"], p["y"]) for p in line["points"]],
                    line["text"],
                )
                for line in m["ocr_lines"]
            ],
        )

    docs_df = spark.createDataFrame([doc_row(d) for d in docs], DOCS_SCHEMA)
    media_df = spark.createDataFrame(
        [media_row(m) for m in media], MEDIA_SCHEMA
    )
    if gt is None:
        return docs_df, media_df

    def gt_row(g):
        return (
            g["media_ref"],
            [
                (
                    c["type"],
                    c["start_row"],
                    c["end_row"],
                    c["start_col"],
                    c["end_col"],
                    [(p["x"], p["y"]) for p in c["points"]],
                )
                for c in g["cells"]
            ],
        )

    gt_df = spark.createDataFrame([gt_row(g) for g in gt], GT_SCHEMA)
    return docs_df, media_df, gt_df
