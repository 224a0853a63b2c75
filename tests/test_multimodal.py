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


def test_video_container_roundtrip():
    """TRV0 container: encode N frame payloads, decode back bit-exact."""
    from table_recognition_spark.operators.multimodal import (
        decode_video,
        video_encode,
    )

    frames = [b"frame-%d-payload" % i * (i + 1) for i in range(7)]
    blob = video_encode(frames, fps=10)
    fps, out = decode_video(blob)
    assert fps == 10
    assert out == frames


def test_video_frame_sampling_even_spacing():
    from table_recognition_spark.operators.multimodal import (
        sample_video_frames,
        video_encode,
    )

    frames = [bytes([i]) for i in range(12)]
    blob = video_encode(frames, fps=5)
    # n < total: evenly spaced bucket starts, deterministic
    assert [i for i, _ in sample_video_frames(blob, 4)] == [0, 3, 6, 9]
    # n >= total: every frame once
    assert [i for i, _ in sample_video_frames(blob, 99)] == list(range(12))
    # payloads come back from the right indices
    assert [b for _, b in sample_video_frames(blob, 4)] == [
        bytes([0]), bytes([3]), bytes([6]), bytes([9])
    ]
    # empty container
    assert sample_video_frames(video_encode([], fps=5), 4) == []


def test_video_codec_injection_seam():
    import pytest as _pytest

    from table_recognition_spark.operators.multimodal import (
        _VIDEO_CODECS,
        decode_video,
        register_video_codec,
    )

    with _pytest.raises(NotImplementedError, match="register_video_codec"):
        decode_video(b"\x00\x00\x00\x20ftypisom fake mp4")
    register_video_codec(b"FAKE", lambda d: (1, [b"x"]))
    try:
        assert decode_video(b"FAKEvideo") == (1, [b"x"])
    finally:
        _VIDEO_CODECS.pop(b"FAKE")


def test_long_magic_codecs_match_full_length():
    """A codec registered with a magic longer than the built-ins' head
    window still matches — image (>8 bytes) and audio (>4 bytes)
    registries compare each magic against its own full length, same as
    video."""
    from table_recognition_spark.operators.multimodal import (
        _AUDIO_CODECS,
        _CODECS,
        decode_audio,
        decode_image,
        register_audio_codec,
        register_codec,
    )

    long_img = b"LONGIMAGEMAGIC"  # 14 bytes > the 8-byte PNG magic
    long_aud = b"ID3\x04\x00\x00"  # 6 bytes > RIFF's 4
    register_codec(long_img, lambda d: "img-decoded")
    register_audio_codec(long_aud, lambda d: ("aud-decoded", 44100))
    try:
        assert decode_image(long_img + b"payload") == "img-decoded"
        assert decode_audio(long_aud + b"payload") == ("aud-decoded", 44100)
        # a partial prefix of the long magic must NOT match
        import pytest as _pytest

        with _pytest.raises(NotImplementedError):
            decode_image(long_img[:6] + b"x" * 16)
    finally:
        _CODECS.pop(long_img)
        _AUDIO_CODECS.pop(long_aud)


@pytest.mark.spark
def test_fixture_video_frame_stats_pinned(spark):
    """media_video_frame_stats decodes the seeded TRV0/JPEG fixture
    deterministically; per-frame stats pinned vs a local decode of the
    same sampled frames."""
    import numpy as np

    from table_recognition_spark.operators.multimodal import (
        decode_image,
        decode_video,
        sample_video_frames,
        video_frame_stats,
    )
    from table_recognition_spark.pipeline.flagship import fixture_video

    fv = fixture_video(spark)
    got = [
        r.asDict()
        for r in video_frame_stats(fv, n_sample=4)
        .orderBy("media_ref", "frame_idx")
        .collect()
    ]
    raw = {r["media_ref"]: bytes(r["video"]) for r in fv.collect()}
    meta = {r["media_ref"]: (r["n_frames"], r["fps"]) for r in fv.collect()}
    assert len(raw) == 8
    assert len(got) == 8 * 4  # every fixture clip has >= 6 frames
    by_clip: dict = {}
    for row in got:
        by_clip.setdefault(row["media_ref"], []).append(row)
    for ref, blob in raw.items():
        n_frames, fps = meta[ref]
        _f, frames = decode_video(blob)
        assert _f == fps and len(frames) == n_frames
        rows = by_clip[ref]
        expected = sample_video_frames(blob, 4)
        assert [r["frame_idx"] for r in rows] == [i for i, _ in expected]
        for r, (_i, fb) in zip(rows, expected):
            img = decode_image(fb)
            assert (r["width"], r["height"]) == (64, 48)
            assert r["n_frames"] == n_frames and r["fps"] == fps
            assert r["duration_ms"] == int(round(n_frames * 1000 / fps))
            assert r["mean_intensity"] == float(
                np.round(img.mean(dtype=np.float64), 6)
            )
            assert r["ink_ratio"] == float(
                np.round((img < 255).mean(dtype=np.float64), 6)
            )
