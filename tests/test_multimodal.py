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


def test_require_real_raises(spark):
    media = synth_media(spark, 5, seed=42)
    with pytest.raises(NotImplementedError, match="codec"):
        extract_features(media, require_real=True)


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
