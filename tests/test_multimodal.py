import numpy as np
import pytest

from table_recognition_spark.fixtures.generate import (
    corpus_to_spark,
    png_decode_gray8,
)
from table_recognition_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    image_stats,
    patch_embeddings,
    resize_nearest,
    thumbnails,
)


def test_decode_image_stubs():
    with pytest.raises(NotImplementedError):
        decode_image(b"GIF89a...")
    with pytest.raises(NotImplementedError, match="audio"):
        decode_audio(b"RIFF")


def test_resize_nearest_dims():
    img = np.arange(100, dtype=np.uint8).reshape(10, 10)
    out = resize_nearest(img, 4, 6)
    assert out.shape == (4, 6)
    assert out[0, 0] == img[0, 0]


@pytest.mark.spark
def test_image_stats_match_local_decode(spark, tiny_corpus):
    _, media, _ = tiny_corpus
    _, media_df = corpus_to_spark(spark, [], media)
    got = {r["media_ref"]: r.asDict() for r in image_stats(media_df).collect()}
    assert len(got) == len(media)
    for m in media:
        img = png_decode_gray8(m["image"])
        r = got[m["media_ref"]]
        assert (r["width"], r["height"]) == (m["width"], m["height"])
        assert r["mean_intensity"] == float(
            np.round(img.mean(dtype=np.float64), 6)
        )
        assert 0 < r["ink_ratio"] < 1


@pytest.mark.spark
def test_thumbnails_decode_and_deterministic(spark, tiny_corpus):
    _, media, _ = tiny_corpus
    _, media_df = corpus_to_spark(spark, [], media)
    a = {r["media_ref"]: bytes(r["thumb"]) for r in thumbnails(media_df).collect()}
    b = {r["media_ref"]: bytes(r["thumb"]) for r in thumbnails(media_df).collect()}
    assert a == b
    th = png_decode_gray8(a[media[0]["media_ref"]])
    assert th.shape == (32, 32)


@pytest.mark.spark
def test_patch_embeddings_shape(spark, tiny_corpus):
    _, media, _ = tiny_corpus
    _, media_df = corpus_to_spark(spark, [], media)
    rows = patch_embeddings(media_df).collect()
    assert all(len(r["patch_embedding"]) == 16 for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r["patch_embedding"])


def test_jpeg_codec_injection_seam():
    """decode_image must route JPEG payloads through an injected codec —
    the deployment swap point for the reference's .jpg dataset — and the
    mapInPandas operators must work end-to-end through it."""
    import numpy as np
    import pytest

    from table_recognition_spark.operators import multimodal as mm

    # deterministic fake "JPEG": magic + 2-byte dims + raw gray8 payload
    def fake_jpeg_encode(img):
        h, w = img.shape
        return mm.JPEG_MAGIC + bytes([h, w]) + img.tobytes()

    def fake_jpeg_decode(data):
        body = bytes(data)[3:]
        h, w = body[0], body[1]
        return np.frombuffer(body[2:], dtype=np.uint8).reshape(h, w)

    img = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 251
    payload = fake_jpeg_encode(img)

    # before injection: the built-in pure-numpy baseline codec handles
    # real JPEG bytes (the fake payload is not a valid stream)
    from table_recognition_spark.core.jpeg import jpeg_encode_gray8

    real = jpeg_encode_gray8(img)
    assert mm.decode_image(real).shape == img.shape

    # injection OVERRIDES the built-in (the libjpeg-turbo swap point)
    builtin = mm._CODECS[mm.JPEG_MAGIC]
    mm.register_codec(mm.JPEG_MAGIC, fake_jpeg_decode)
    try:
        out = mm.decode_image(payload)
        assert np.array_equal(out, img)
        # PNG path unaffected
        from table_recognition_spark.fixtures.generate import png_encode

        assert np.array_equal(mm.decode_image(png_encode(img)), img)
    finally:
        mm._CODECS[mm.JPEG_MAGIC] = builtin
    assert mm.decode_image(real).shape == img.shape
