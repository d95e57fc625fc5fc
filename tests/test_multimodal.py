"""Multimodal plumbing tests: binary columns + metadata through
Arrow-batched stages with the deterministic fake decoder."""

import pytest

from pyspark.sql import functions as F

from embulk_filter_expand_json_spark.operators.multimodal import (
    frame_sample_plan,
    image_features,
    resize_images,
    synthetic_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, n=30, seed=7).cache()


def test_synthetic_media_deterministic(spark):
    a = synthetic_media(spark, n=10, seed=7).collect()
    b = synthetic_media(spark, n=10, seed=7).collect()
    assert a == b
    assert all(isinstance(r["data"], (bytes, bytearray)) for r in a)


def test_image_features_shapes_and_determinism(media):
    feats = image_features(media, decoder="fake").orderBy("media_id").collect()
    assert len(feats) == 30
    for r in feats:
        assert 0 <= r["mean_intensity"] <= 255
        assert r["std_intensity"] >= 0
        assert r["p99_intensity"] <= 255
        assert r["aspect_ratio"] > 0
    again = image_features(media, decoder="fake").orderBy("media_id").collect()
    assert feats == again


def test_image_features_null_propagation(spark):
    df = synthetic_media(spark, n=3).withColumn(
        "data", F.when(F.col("media_id") == 1, F.lit(None)).otherwise(F.col("data"))
    )
    rows = {r["media_id"]: r for r in image_features(df).collect()}
    assert rows[1]["mean_intensity"] is None
    assert rows[0]["mean_intensity"] is not None


def test_resize_images(media):
    out = resize_images(media, target=16).collect()
    assert all(r["width"] == 16 and r["height"] == 16 for r in out)
    assert all(len(r["data"]) == 16 * 16 for r in out if r["data"] is not None)


def _has_pillow():
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    _has_pillow(), reason="Pillow present: compressed decode is real here"
)
def test_real_decoder_is_clearly_stubbed(media):
    with pytest.raises(Exception) as ei:
        image_features(media, decoder="real").collect()
    assert "NotImplementedError" in str(ei.value) or "Pillow" in str(ei.value)


@pytest.mark.skipif(
    not _has_pillow(), reason="Pillow not in this environment"
)
def test_real_decoder_uses_pillow_when_available(spark):
    """Environments that ship Pillow get real PNG decode through the same
    'real' kernel (grayscale-converted, same feature schema)."""
    import io

    from PIL import Image
    import numpy as np

    img = Image.fromarray(
        (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 256, mode="L"
    )
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    df = spark.createDataFrame(
        [(0, "image/png", 8, 8, bytearray(buf.getvalue()))],
        "media_id long, mime string, width int, height int, data binary",
    )
    row = image_features(df, decoder="real").collect()[0]
    want = np.asarray(img, dtype=np.uint8)
    assert abs(row["mean_intensity"] - want.mean()) < 1e-9


def test_frame_sample_plan(spark):
    df = spark.createDataFrame(
        [(1, 3.0), (2, 0.2)], "media_id long, duration_sec double"
    )
    rows = frame_sample_plan(df, fps=2.0).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r["frame_ts"])
    assert by_id[1] == [0.0, 0.5, 1.0, 1.5, 2.0, 2.5]
    assert by_id[2] == [0.0]


# --- real netpbm decode path (round 3: decoder='real' is genuinely real
# for codec-free formats) --------------------------------------------------

def test_netpbm_roundtrip_with_comments():
    import numpy as np

    from embulk_filter_expand_json_spark.operators.multimodal import (
        decode_netpbm,
        encode_pgm,
    )

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(9, 13), dtype=np.uint8)
    assert (decode_netpbm(encode_pgm(img)) == img).all()
    # header comments (netpbm spec) are skipped
    raw = encode_pgm(img)
    commented = b"P5\n# a comment\n13 9\n# another\n255\n" + raw.split(b"255\n", 1)[1]
    assert (decode_netpbm(commented) == img).all()
    # P6 color decodes to (h, w, 3)
    color = rng.randint(0, 256, size=(4, 5, 3), dtype=np.uint8)
    p6 = b"P6\n5 4\n255\n" + color.tobytes()
    assert (decode_netpbm(p6) == color).all()
    with pytest.raises(ValueError):
        decode_netpbm(b"GIF89a...")


def test_real_decoder_on_pgm_media(spark):
    """decoder='real' REALLY decodes synthetic PGM media in the Spark stage:
    features match a local numpy recomputation exactly."""
    import numpy as np

    from embulk_filter_expand_json_spark.operators.multimodal import (
        decode_netpbm,
        image_features,
        resize_images,
        synthetic_pgm_media,
    )

    media = synthetic_pgm_media(spark, n=12, size=24, seed=42)
    rows = {r["media_id"]: bytes(r["data"]) for r in media.collect()}
    got = {
        r["media_id"]: (r["mean_intensity"], r["std_intensity"])
        for r in image_features(media, decoder="real").collect()
    }
    for mid, data in rows.items():
        img = decode_netpbm(data)
        assert got[mid][0] == pytest.approx(float(img.mean()))
        assert got[mid][1] == pytest.approx(float(img.std()))
    # resize through the real decoder keeps the binary-column contract
    out = resize_images(media, target=8, decoder="real").collect()
    assert all(len(r["data"]) == 64 for r in out)


def test_wav_pcm16_roundtrip():
    """RIFF/WAV PCM-16 encode/decode in pure numpy: exact round-trip,
    chunk-walking skips extra chunks, non-PCM rejected."""
    import struct

    import numpy as np

    from embulk_filter_expand_json_spark.operators.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    rng = np.random.RandomState(11)
    pcm = (rng.standard_normal(777) * 10000).astype(np.int16)
    rate, got = decode_wav_pcm16(encode_wav_pcm16(pcm, rate=22050))
    assert rate == 22050 and (got == pcm).all()
    # an extra LIST chunk between fmt and data must be skipped (word-aligned)
    raw = encode_wav_pcm16(pcm, rate=8000)
    fmt_chunk = raw[12:36]
    data_chunk = raw[36:]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size padded
    patched = raw[:12] + fmt_chunk + extra + data_chunk
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    rate2, got2 = decode_wav_pcm16(patched)
    assert rate2 == 8000 and (got2 == pcm).all()
    with pytest.raises(ValueError):
        decode_wav_pcm16(b"OggS....")
    # 8-bit / non-PCM rejected
    bad = bytearray(raw)
    bad[20] = 3  # audio_format = IEEE float
    with pytest.raises(ValueError):
        decode_wav_pcm16(bytes(bad))


def test_audio_features_real_decode(spark):
    """decoder='real' genuinely decodes synthetic WAV media in the Spark
    stage; features match a local numpy recomputation, nulls propagate."""
    import numpy as np

    from embulk_filter_expand_json_spark.operators.multimodal import (
        audio_features,
        decode_wav_pcm16,
        synthetic_wav_media,
    )

    media = synthetic_wav_media(spark, n=10, rate=8000, seconds=0.25, seed=42)
    raw = {r["media_id"]: bytes(r["data"]) for r in media.collect()}
    got = {
        r["media_id"]: (r["duration_sec"], r["rms"], r["zcr"])
        for r in audio_features(media, decoder="real").collect()
    }
    assert len(got) == 10
    for mid, data in raw.items():
        rate, samples = decode_wav_pcm16(data)
        x = samples.astype(np.float64) / 32768.0
        assert got[mid][0] == pytest.approx(len(x) / rate)
        assert got[mid][1] == pytest.approx(float(np.sqrt(np.mean(x * x))))
        zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
        assert got[mid][2] == pytest.approx(zcr)
    # determinism across runs
    media2 = synthetic_wav_media(spark, n=10, rate=8000, seconds=0.25, seed=42)
    assert {r["media_id"]: bytes(r["data"]) for r in media2.collect()} == raw
    # null data -> null features
    from pyspark.sql import functions as F

    nulled = media.withColumn(
        "data", F.when(F.col("media_id") == 0, None).otherwise(F.col("data"))
    )
    out = {r["media_id"]: r["rms"] for r in audio_features(nulled, decoder="real").collect()}
    assert out[0] is None and out[1] is not None


def test_audio_features_compressed_is_clearly_stubbed(spark):
    """Non-RIFF bytes through decoder='real' hit the single documented
    NotImplementedError point."""
    from embulk_filter_expand_json_spark.operators.multimodal import (
        audio_features,
        synthetic_media,
    )

    clips = synthetic_media(spark, n=3).filter("mime = 'audio/wav'")
    # synthetic_media data is sha2 bytes, not RIFF -> stub point
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        audio_features(clips, decoder="real").collect()
    # the fake decoder keeps the stage testable
    rows = audio_features(clips, decoder="fake").collect()
    assert all(r["duration_sec"] == pytest.approx(0.25) for r in rows)
