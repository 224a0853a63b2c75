import numpy as np

from table_recognition_spark.core.bbox import polygons_to_bboxes
from table_recognition_spark.core.knn import knn_edges
from table_recognition_spark.core.labels import label_graph
from table_recognition_spark.fixtures.generate import (
    make_corpus,
    png_decode_gray8,
    png_encode,
)


def test_png_roundtrip():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(37, 53)).astype(np.uint8)
    assert np.array_equal(png_decode_gray8(png_encode(img)), img)


def test_corpus_deterministic():
    a = make_corpus(10, 6, seed=42)
    b = make_corpus(10, 6, seed=42)
    assert a == b
    c = make_corpus(10, 6, seed=43)
    assert c != a


def test_ocr_lines_within_bounds_and_ordered(tiny_corpus):
    _, media, _ = tiny_corpus
    for m in media:
        ids = [line["line_id"] for line in m["ocr_lines"]]
        assert ids == list(range(len(ids)))  # NODE_COUNTER document order
        for line in m["ocr_lines"]:
            for p in line["points"]:
                assert 0 <= p["x"] < m["width"]
                assert 0 <= p["y"] < m["height"]


def test_spans_dense_offsets(tiny_corpus):
    docs, _, _ = tiny_corpus
    for d in docs:
        offs = [s["offset"] for s in d["spans"]]
        assert offs == list(range(len(offs)))


def test_skew_doc_present():
    docs, _, _ = make_corpus(10, 5, seed=42, skew_doc=True)
    n_media = [sum(1 for s in d["spans"] if s["kind"] == "media") for d in docs]
    assert max(n_media) == 100


def test_gt_labels_cover_all_edge_classes(small_corpus):
    """Separable synthetic grids must exercise the full truth table."""
    _, media, gt = small_corpus
    gt_by_ref = {g["media_ref"]: g for g in gt}
    seen = set()
    for m in media:
        g = gt_by_ref[m["media_ref"]]
        if not m["ocr_lines"] or not g["cells"]:
            continue
        polys = [[(p["x"], p["y"]) for p in ln["points"]] for ln in m["ocr_lines"]]
        nb = polygons_to_bboxes(polys)
        edges = knn_edges(nb)
        cb = polygons_to_bboxes(
            [[(p["x"], p["y"]) for p in c["points"]] for c in g["cells"]]
        )
        grid = np.array(
            [
                [c["start_row"], c["end_row"], c["start_col"], c["end_col"]]
                for c in g["cells"]
            ]
        )
        types = [c["type"] for c in g["cells"]]
        _, el = label_graph(nb, edges, cb, types, grid)
        seen |= set(el.tolist())
    assert seen == {0, 1, 2, 3}
