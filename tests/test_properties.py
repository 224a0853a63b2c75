"""Property-based tests (hypothesis) over the no-Spark core/oracle —
SURVEY.md §5.4 invariants on randomized seeded inputs."""

import numpy as np
from hypothesis import given, settings, strategies as st

from table_recognition_spark.core import gnn, knn
from table_recognition_spark.core.bbox import rect_iou, rect_min_distance
from table_recognition_spark.core.boilerplate import strip_boilerplate
from table_recognition_spark.fixtures.generate import make_corpus
from table_recognition_spark.oracle.extract import extract_corpus, run_kernel

_W = gnn.init_weights(42)


@st.composite
def bbox_arrays(draw, max_n=25):
    n = draw(st.integers(1, max_n))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 400, size=(n, 1))
    y = rng.integers(0, 300, size=(n, 1))
    w = rng.integers(1, 80, size=(n, 1))
    h = rng.integers(1, 40, size=(n, 1))
    return np.concatenate([x, y, x + w, y + h], axis=1)


@given(bbox_arrays())
@settings(max_examples=40, deadline=None)
def test_knn_edges_invariants(b):
    e = knn.knn_edges(b)
    if len(b) == 1:
        assert len(e) == 0
        return
    assert (e[:, 0] != e[:, 1]).all()
    pairs = set(map(tuple, e.tolist()))
    assert all((d, s) in pairs for s, d in pairs)  # symmetric
    lst = list(map(tuple, e.tolist()))
    assert lst == sorted(set(lst))  # canonical order, unique
    assert set(e[:, 0].tolist()) == set(range(len(b)))  # every node connected


@given(bbox_arrays(max_n=12), bbox_arrays(max_n=12))
@settings(max_examples=25, deadline=None)
def test_rect_metrics_bounds(a, b):
    iou = rect_iou(a, b)
    assert (iou >= 0).all() and (iou <= 1 + 1e-12).all()
    d = rect_min_distance(a, b)
    assert (d >= 0).all()
    assert np.allclose(d, rect_min_distance(b, a).T)


@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300))
@settings(max_examples=80, deadline=None)
def test_boilerplate_strip_idempotent(s):
    once = strip_boilerplate(s)
    assert strip_boilerplate(once) == once
    assert once == once.strip()


@given(st.integers(0, 2**31 - 1), st.integers(2, 12), st.integers(1, 6))
@settings(max_examples=12, deadline=None)
def test_oracle_output_invariants(seed, n_docs, n_media):
    docs, media, _ = make_corpus(n_docs, n_media, seed=seed)
    out = extract_corpus(docs, media, _W)
    assert set(out) == {d["doc_id"] for d in docs}
    docs_by_id = {d["doc_id"]: d for d in docs}
    for did, spans in out.items():
        offs = [s["offset"] for s in spans]
        assert offs == list(range(len(spans)))  # dense, increasing
        n_text_in = sum(
            1 for s in docs_by_id[did]["spans"] if s["kind"] == "text"
        )
        n_text_out = sum(1 for s in spans if s["kind"] == "main_text")
        assert n_text_in == n_text_out  # text spans preserved 1:1
        for s in spans:
            assert s["kind"] in ("main_text", "cell")
            assert (s["kind"] == "cell") == bool(s["media_ref"])


@given(st.integers(0, 2**31 - 1))
@settings(max_examples=15, deadline=None)
def test_cells_partition_ocr_lines(seed):
    """Every OCR line lands in exactly one assembled cell."""
    _, media, _ = make_corpus(0, 3, seed=seed)
    for m in media:
        cells = run_kernel(m["ocr_lines"], m["width"], m["height"], _W)
        n_lines_out = sum(len(c.split("\n")) for c in cells)
        assert n_lines_out == len(m["ocr_lines"])
