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
    with pytest.raises(NotImplementedError, match="register_audio_codec"):
        decode_audio(b"OggS compressed")


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


def _wav_bytes(samples, rate=16000, ch=1, width=2):
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(width)
        w.setframerate(rate)
        if width == 2:
            raw = (np.asarray(samples) * 32767).astype("<i2").tobytes()
        else:
            raw = (
                (np.asarray(samples) * 127 + 128).clip(0, 255)
                .astype(np.uint8).tobytes()
            )
        w.writeframes(raw)
    return buf.getvalue()


def test_decode_audio_wav_pcm():
    import numpy as np

    t = np.arange(1600) / 16000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    x, rate = decode_audio(_wav_bytes(sig))
    assert rate == 16000 and len(x) == 1600
    assert np.abs(x - sig).max() < 1e-3  # 16-bit quantization error
    # stereo mixes down to mono
    stereo = np.stack([sig, -sig], axis=1).reshape(-1)
    x2, _ = decode_audio(_wav_bytes(stereo, ch=2))
    assert len(x2) == 1600 and np.abs(x2).max() < 1e-3
    # compressed container still raises (injection seam)
    import pytest as _pt

    with _pt.raises(NotImplementedError, match="register_audio_codec"):
        decode_audio(b"ID3\x03 mp3-ish")


@pytest.mark.spark
def test_audio_stats_over_wav_table(spark):
    import numpy as np
    import pandas as pd

    from table_recognition_spark.operators.multimodal import audio_stats

    t = np.arange(8000) / 8000.0
    rows = [
        {"media_ref": "a0", "audio": _wav_bytes(0.5 * np.sin(2 * np.pi * 440 * t), rate=8000)},
        {"media_ref": "a1", "audio": _wav_bytes(np.zeros(100), rate=8000)},
    ]
    got = {
        r["media_ref"]: r.asDict()
        for r in audio_stats(spark.createDataFrame(pd.DataFrame(rows))).collect()
    }
    assert got["a0"]["sample_rate"] == 8000
    assert got["a0"]["duration_ms"] == 1000
    assert abs(got["a0"]["rms"] - 0.5 / np.sqrt(2)) < 1e-3
    assert got["a1"]["rms"] == 0.0 and got["a1"]["n_samples"] == 100


@pytest.mark.spark
def test_fixture_audio_stats_pinned(spark):
    """The driver-facing media_audio_stats query decodes the seeded WAV
    fixture deterministically; values pinned vs a local decode."""
    import numpy as np

    from table_recognition_spark.operators.multimodal import (
        audio_stats,
        decode_audio,
    )
    from table_recognition_spark.pipeline.flagship import fixture_audio

    fa = fixture_audio(spark)
    got = {r["media_ref"]: r.asDict() for r in audio_stats(fa).collect()}
    raw = {r["media_ref"]: (bytes(r["audio"]), r["n_samples"])
           for r in fa.collect()}
    assert len(got) == 16
    for ref, (wav, n_samples) in raw.items():
        x, rate = decode_audio(wav)
        r = got[ref]
        assert r["sample_rate"] == rate == 8000
        assert r["n_samples"] == len(x) == n_samples
        assert r["rms"] == float(
            np.round(np.sqrt(np.mean(np.square(x, dtype=np.float64))), 6)
        )
