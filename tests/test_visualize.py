"""Visualization sink (SURVEY S8): overlay rendering determinism and the
mapInPandas sink shape."""

import numpy as np
import pytest

from table_recognition_spark.operators.visualize import (
    NODE_LEVELS,
    draw_disc,
    draw_line,
    draw_rect,
    render_overlay,
    visualize_sink,
)


def test_draw_primitives():
    img = np.zeros((20, 30), dtype=np.uint8)
    draw_rect(img, 2, 3, 10, 8, 200, thickness=1)
    assert img[3, 2] == 200 and img[8, 10] == 200
    assert img[3, 5] == 200 and img[5, 2] == 200  # edges
    assert img[5, 5] == 0  # interior untouched
    draw_disc(img, 15, 15, 3, 90)
    assert img[15, 15] == 90 and img[15, 18] == 90
    assert img[15, 19] == 0
    draw_line(img, 0, 0, 29, 0, 50)
    assert img[0, 0] == 50 and img[0, 29] == 50
    # clipping never raises
    draw_rect(img, -5, -5, 100, 100, 10)
    draw_disc(img, -3, -3, 5, 10)
    draw_line(img, -10, -10, 50, 50, 10)


def test_render_overlay_deterministic():
    from table_recognition_spark.fixtures.generate import png_encode
    from table_recognition_spark.operators.multimodal import decode_image

    base = np.full((40, 60), 255, dtype=np.uint8)
    payload = png_encode(base)
    nodes = [(5, 5, 20, 12, 12, 8, "header"), (5, 20, 20, 27, 12, 23, "data")]
    edges = [(12, 8, 12, 23, "vertical")]
    png1 = render_overlay(payload, nodes, edges)
    png2 = render_overlay(payload, nodes, edges)
    assert png1 == png2
    out = decode_image(png1)
    assert out[5, 5] == NODE_LEVELS["header"]  # rect corner
    assert out[8, 12] == NODE_LEVELS["header"]  # center disc
    # no-relationship edges draw nothing
    png3 = render_overlay(payload, [], [(0, 30, 59, 30, "no-relationship")])
    assert np.array_equal(decode_image(png3), base)


@pytest.mark.spark
def test_visualize_sink_spark(spark, tmp_path):
    from table_recognition_spark.fixtures.generate import (
        corpus_to_spark, make_corpus,
    )
    from table_recognition_spark.operators.multimodal import decode_image

    _, media, _ = make_corpus(0, 4, seed=21)
    _, media_df = corpus_to_spark(spark, [], media)
    out = visualize_sink(media_df)
    rows = {r["media_ref"]: bytes(r["overlay_png"]) for r in out.collect()}
    assert set(rows) == {m["media_ref"] for m in media}
    for m in media:
        img = decode_image(rows[m["media_ref"]])
        assert img.shape == (m["height"], m["width"])
    # files sink works (what a 100-TB job's spot-check write looks like)
    out.write.mode("overwrite").parquet(str(tmp_path / "overlays"))
    assert spark.read.parquet(str(tmp_path / "overlays")).count() == 4
