"""Multimodal plumbing tests: schema, determinism, batch contract, invariants.
The decode itself is a documented deterministic fake (no media libs in this
environment); what's under test is the Spark-side pipeline."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bliss_rs_spark.operators.multimodal import (
    FEATURE_DIM,
    _fake_decode_features,
    extract_features,
    frame_sample,
    media_sha256,
    python_media_sha256,
    synth_media,
)
from bliss_rs_spark.operators.similarity import cosine_topk


def test_media_schema_and_determinism(spark):
    a = synth_media(spark, 60, seed=42).orderBy("media_id").collect()
    b = synth_media(spark, 60, seed=42, n_partitions=7).orderBy("media_id").collect()
    assert [r["media_id"] for r in a] == list(range(60))
    assert [(r["media_id"], bytes(r["data"])) for r in a] == [
        (r["media_id"], bytes(r["data"])) for r in b
    ]
    kinds = {r["kind"] for r in a}
    assert kinds == {"image", "audio", "video"}
    img = next(r for r in a if r["kind"] == "image")
    assert img["meta"]["format"] == "fake_rgb"


def test_feature_extraction_contract(spark):
    media = synth_media(spark, 30, seed=42)
    feats = extract_features(media).collect()
    assert len(feats) == 30
    for r in feats:
        v = np.array(r["feature"], dtype=np.float32)
        assert v.shape == (FEATURE_DIM,)
        assert np.isfinite(v).all()
        assert abs(float(v.sum()) - 1.0) < 1e-5  # L1-normalized histogram
    # cross-check one row against the pure-Python stub
    raw = {r["media_id"]: bytes(r["data"]) for r in media.collect()}
    r0 = next(r for r in feats if r["media_id"] == 0)
    np.testing.assert_allclose(
        np.array(r0["feature"]), _fake_decode_features(raw[0]), rtol=1e-6
    )


def test_require_real_raises_on_codec_needing_formats(spark):
    """The fake corpus's formats (fake_rgb/fake_pcm/fake_av) have no real
    decoder -> the NotImplementedError surfaces from the executors (wrapped
    in Spark's PythonException)."""
    media = synth_media(spark, 5, seed=42)
    with pytest.raises(Exception, match="no codec"):
        extract_features(media, require_real=True).collect()


def test_frame_sampling_explode(spark):
    media = synth_media(spark, 30, seed=42)
    frames = frame_sample(media, every_n=10).collect()
    n_videos = media.filter("kind = 'video'").count()
    assert len(frames) >= n_videos  # every video yields >= 1 sampled frame
    assert all(r["frame_no"] % 10 == 0 for r in frames)
    assert all(len(bytes(r["frame_data"])) <= 64 for r in frames)


def test_binary_sha_invariant(spark):
    media = synth_media(spark, 20, seed=42)
    rows = media_sha256(media).collect()
    for r in rows:
        assert r["data_sha256"] == python_media_sha256(bytes(r["data"]))


def test_features_feed_similarity_search(spark):
    """The multimodal features integrate with the ANN operators unchanged."""
    emb = extract_features(synth_media(spark, 50, seed=42)).withColumnRenamed(
        "media_id", "vec_id"
    ).withColumnRenamed("feature", "embedding")
    q = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    top = cosine_topk(emb, [float(x) for x in q], k=5).collect()
    assert top[0]["vec_id"] == 0 and abs(top[0]["cosine"] - 1.0) < 1e-9
    assert len(top) == 5


# --- real pure-NumPy codecs (round 2) -------------------------------------------

def test_wav_roundtrip_and_spectral_centroid():
    from bliss_rs_spark.functions.media_codec import audio_features, decode_wav, encode_wav

    sr = 8000
    t = np.arange(sr // 2) / sr  # 0.5 s
    x = 0.8 * np.sin(2 * np.pi * 440.0 * t)
    blob = encode_wav(x, sr)
    sr2, y = decode_wav(blob)
    assert sr2 == sr and len(y) == len(x)
    np.testing.assert_allclose(y, np.round(x * 32767) / 32767, atol=1e-9)

    f = audio_features(y, sr)
    duration, rms, zcr, centroid, rolloff = f[0], f[1], f[2], f[3], f[4]
    assert abs(duration - 0.5) < 1e-6
    assert abs(rms - 0.8 / np.sqrt(2)) < 1e-3
    # a pure 440 Hz tone: centroid ~ 440, rolloff ~ 440, zcr ~ 2*440/sr
    assert abs(centroid - 440.0) < 5.0
    assert abs(rolloff - 440.0) < 20.0
    assert abs(zcr - 2 * 440.0 / sr) < 0.01


def test_wav_stereo_downmix_and_bad_payloads():
    import pytest as _pytest

    from bliss_rs_spark.functions.media_codec import decode_wav

    import struct
    # hand-build a 2-channel PCM wav: L=+0.5, R=-0.5 -> mono 0
    frames = np.array([16384, -16384] * 100, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(frames)) + frames
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    sr, y = decode_wav(blob)
    assert sr == 8000 and np.abs(y).max() < 1e-9

    with _pytest.raises(ValueError):
        decode_wav(b"nonsense payload")


def test_ppm_roundtrip_resize_and_features():
    from bliss_rs_spark.functions.media_codec import (
        decode_ppm,
        encode_ppm,
        image_features,
        resize_block_mean,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    blob = encode_ppm(img)
    np.testing.assert_array_equal(decode_ppm(blob), img)
    # comment handling
    blob2 = b"P6\n# a comment\n32 24\n255\n" + img.tobytes()
    np.testing.assert_array_equal(decode_ppm(blob2), img)

    flat = np.full((24, 32, 3), 77, dtype=np.uint8)
    small = resize_block_mean(flat, 6, 8)
    np.testing.assert_allclose(small, 77.0)

    f = image_features(flat)
    np.testing.assert_allclose(f[:3], 77 / 255.0, atol=1e-6)  # channel means
    np.testing.assert_allclose(f[3:6], 0.0, atol=1e-6)        # stds
    assert abs(f[14] - 32 / 24) < 1e-6                        # aspect


def test_real_media_features_and_resize(spark):
    from bliss_rs_spark.operators.multimodal import resize_images, synth_real_media

    media = synth_real_media(spark, 24, seed=42)
    rows = media.orderBy("media_id").collect()
    assert {r["meta"]["format"] for r in rows} == {"ppm", "wav", "flac"}
    # REAL decode end-to-end through Spark
    feats = extract_features(media, require_real=True).collect()
    assert len(feats) == 24
    for r in feats:
        v = np.array(r["feature"], dtype=np.float32)
        assert v.shape == (FEATURE_DIM,) and np.isfinite(v).all()
        if r["kind"] == "audio":
            assert 0.1 < v[0] < 0.7  # duration within synth range
            assert 50.0 < v[3] < 4000.0  # centroid within band
    # determinism across partitioning
    feats2 = extract_features(
        synth_real_media(spark, 24, seed=42, n_partitions=7), require_real=True
    ).collect()
    assert {r["media_id"]: r["feature"] for r in feats} == {
        r["media_id"]: r["feature"] for r in feats2
    }

    resized = resize_images(media, 8, 8).collect()
    from bliss_rs_spark.functions.media_codec import decode_ppm

    assert len(resized) == 12  # only images
    for r in resized:
        assert decode_ppm(bytes(r["data"])).shape == (8, 8, 3)


# --- hypothesis round-trips for the pure-NumPy codecs ----------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.floats(min_value=-1.0, max_value=1.0, allow_nan=False), min_size=1, max_size=500),
    st.sampled_from([8000, 22050, 44100]),
)
def test_wav_roundtrip_property(samples, sr):
    from bliss_rs_spark.functions.media_codec import decode_wav, encode_wav

    x = np.array(samples, dtype=np.float64)
    sr2, y = decode_wav(encode_wav(x, sr))
    assert sr2 == sr
    np.testing.assert_allclose(y, np.round(np.clip(x, -1, 1) * 32767) / 32767, atol=1e-12)


@settings(max_examples=50, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1))
def test_ppm_roundtrip_property(h, w, seed):
    from bliss_rs_spark.functions.media_codec import decode_ppm, encode_ppm

    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_ppm(encode_ppm(img)), img)
