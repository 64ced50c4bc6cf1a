"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Reference parity: this is the closest structural cousin of bliss-rs itself —
its decoders turn an opaque media file into a canonical numeric form and then
a fixed-length feature vector (FFmpegDecoder::decode,
/root/reference/src/song/decoder/ffmpeg.rs:135-360; Song::analyze
src/song/mod.rs:413-508).  Here the Spark-side plumbing is real and tested
(schema, binary columns, Arrow batch shapes, mapInPandas signatures,
partitioning) while the codec itself is stubbed: the container has no
image/audio libraries, so the decode step is either

  - a clearly-marked deterministic FAKE (byte-histogram "features"), or
  - a NotImplementedError raise when ``require_real=True``.

Swapping in a real decoder (PIL/librosa/pyav) is a one-function change: the
batch contract (binary in -> float32 vector out) stays identical.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, data binary, meta map<string,string>"
)

FEATURE_DIM = 32


def synth_media(spark: SparkSession, n: int, seed: int = 42, n_partitions: int = 4) -> DataFrame:
    """Deterministic fake media corpus: seeded binary payloads + typed meta."""
    base = spark.range(0, n, 1, n_partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = {"media_id": [], "kind": [], "data": [], "meta": []}
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng((seed, i))
                kind = kinds[i % 3]
                size = int(rng.integers(256, 4096))
                data = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
                meta = {
                    "image": {"width": "64", "height": "48", "format": "fake_rgb"},
                    "audio": {"sample_rate": "22050", "channels": "1", "format": "fake_pcm"},
                    "video": {"fps": "30", "frames": str(size // 64), "format": "fake_av"},
                }[kind]
                rows["media_id"].append(i)
                rows["kind"].append(kind)
                rows["data"].append(data)
                rows["meta"].append(meta)
            yield pd.DataFrame(rows)

    return base.mapInPandas(gen, schema=MEDIA_SCHEMA)


def _fake_decode_features(data: bytes) -> np.ndarray:
    """STUB DECODER (deterministic fake): L1-normalized 32-bin byte histogram.

    A real implementation decodes pixels/samples here; the fake keeps the
    exact numeric contract (float32[FEATURE_DIM], finite, deterministic).
    """
    b = np.frombuffer(data, dtype=np.uint8)
    hist = np.bincount(b >> 3, minlength=FEATURE_DIM)[:FEATURE_DIM].astype(np.float32)
    s = hist.sum()
    return hist / s if s else hist


def extract_features(media: DataFrame, require_real: bool = False) -> DataFrame:
    """media -> (media_id, kind, feature array<float>) via mapInPandas.

    Batch contract: the UDF sees Arrow record batches, never single rows;
    per-batch it builds a (batch, FEATURE_DIM) float32 matrix in one NumPy
    pass per row payload.  ``require_real=True`` raises NotImplementedError —
    the hook where a real decoder plugs in.
    """
    if require_real:
        raise NotImplementedError(
            "no media codec available in this environment; "
            "plug a real decoder into _fake_decode_features"
        )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                [float(x) for x in _fake_decode_features(bytes(d))] for d in pdf["data"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "feature": feats}
            )

    return media.mapInPandas(op, schema="media_id long, kind string, feature array<float>")


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (the container
    -explode move of the reference's CUE handling: one file -> N rows with
    provenance, /root/reference/src/cue.rs:74-107).  Frame payloads are
    fixed-size slices of the fake container; a real implementation seeks
    keyframes instead."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_no": [], "frame_data": []}
            for mid, kind, data, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["data"], pdf["meta"]
            ):
                if kind != "video":
                    continue
                n_frames = int(dict(meta).get("frames", "0"))
                raw = bytes(data)
                for fno in range(0, n_frames, every_n):
                    rows["media_id"].append(int(mid))
                    rows["frame_no"].append(fno)
                    rows["frame_data"].append(raw[fno * 64 : (fno + 1) * 64])
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        op, schema="media_id long, frame_no int, frame_data binary"
    )


def media_sha256(media: DataFrame) -> DataFrame:
    """Binary-content invariant (built-in sha2 works on BinaryType directly)."""
    return media.withColumn("data_sha256", F.sha2(F.col("data"), 256))


def python_media_sha256(data: bytes) -> str:
    """Oracle-side counterpart for invariant tests."""
    return hashlib.sha256(data).hexdigest()
