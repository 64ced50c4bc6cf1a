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

Round 2: the decode step is REAL for uncompressed formats — RIFF/WAVE PCM
and binary PPM are parsed with pure NumPy (functions/media_codec.py), and
the extracted descriptors (zero-crossing rate, spectral centroid/rolloff,
channel moments, luma histogram) are the reference's own feature family
re-derived from public definitions.

Round 3: the decode step is REAL for a COMPRESSED format too — FLAC
(functions/flac_codec.py, implemented from the public RFC 9639 spec:
linear-prediction subframes + rice residuals + CRC/MD5 integrity), the same
format as the reference's own test corpus (data/s16_mono_22_5kHz.flac).
The NotImplementedError stub now covers only lossy/patent-encumbered
formats that genuinely require external codecs (jpeg/mp3/h264).
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


def synth_real_media(
    spark: SparkSession, n: int, seed: int = 42, n_partitions: int = 4
) -> DataFrame:
    """Deterministic REAL media corpus: even ids get a binary PPM image
    (gradient + seeded noise); odd ids an audio clip (mixture of seeded sine
    partials) — alternating uncompressed RIFF/WAVE PCM and COMPRESSED FLAC
    (id % 4 == 3).  All decodable by the pure-NumPy codecs, so
    extract_features(require_real=True) runs a genuine decode, including a
    genuine compressed-format decode."""
    from bliss_rs_spark.functions.flac_codec import encode_flac
    from bliss_rs_spark.functions.media_codec import encode_ppm, encode_wav

    base = spark.range(0, n, 1, n_partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "kind": [], "data": [], "meta": []}
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng((seed, i))
                if i % 2 == 0:
                    h, w = int(rng.integers(16, 40)), int(rng.integers(16, 48))
                    yy, xx = np.mgrid[0:h, 0:w]
                    img = np.stack(
                        [
                            (255 * xx / max(w - 1, 1)),
                            (255 * yy / max(h - 1, 1)),
                            rng.integers(0, 256, (h, w)),
                        ],
                        axis=-1,
                    ).astype(np.uint8)
                    rows["kind"].append("image")
                    rows["data"].append(encode_ppm(img))
                    rows["meta"].append(
                        {"width": str(w), "height": str(h), "format": "ppm"}
                    )
                else:
                    sr = 8000
                    dur = float(rng.uniform(0.2, 0.6))
                    t = np.arange(int(sr * dur)) / sr
                    x = np.zeros_like(t)
                    for _ in range(int(rng.integers(1, 4))):
                        f0 = float(rng.uniform(100, 3000))
                        x += float(rng.uniform(0.1, 0.4)) * np.sin(2 * np.pi * f0 * t)
                    x = x / max(np.abs(x).max(), 1.0)
                    fmt = "flac" if i % 4 == 3 else "wav"
                    enc = encode_flac if fmt == "flac" else encode_wav
                    rows["kind"].append("audio")
                    rows["data"].append(enc(x, sr))
                    rows["meta"].append(
                        {"sample_rate": str(sr), "channels": "1", "format": fmt}
                    )
                rows["media_id"].append(i)
            yield pd.DataFrame(rows)

    return base.mapInPandas(gen, schema=MEDIA_SCHEMA)


def _real_decode_features(data: bytes, fmt: str) -> np.ndarray:
    """REAL decode for uncompressed formats (pure NumPy); raises for formats
    that need an external codec — the honest remaining stub surface."""
    from bliss_rs_spark.functions.media_codec import (
        audio_features,
        decode_ppm,
        decode_wav,
        image_features,
    )

    if fmt == "wav":
        sr, samples = decode_wav(data)
        f = audio_features(samples, sr)
    elif fmt == "flac":
        from bliss_rs_spark.functions.flac_codec import decode_flac

        sr, samples = decode_flac(data)
        f = audio_features(samples, sr)
    elif fmt == "ppm":
        f = image_features(decode_ppm(data))
    else:
        raise NotImplementedError(
            f"no codec for format={fmt!r} in this environment; "
            "wav/ppm (functions/media_codec.py) and COMPRESSED flac "
            "(functions/flac_codec.py) decode natively"
        )
    out = np.zeros(FEATURE_DIM, dtype=np.float32)
    out[: len(f)] = f
    return out


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
    pass per row payload.

    ``require_real=True`` runs the REAL pure-NumPy decoders (wav/ppm) and
    raises NotImplementedError for formats that need an external codec —
    the remaining (honest) stub surface.  The default keeps the documented
    deterministic byte-histogram fake, which works on any payload.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if require_real:
                feats = [
                    [float(x) for x in _real_decode_features(
                        bytes(d), dict(m).get("format", "?"))]
                    for d, m in zip(pdf["data"], pdf["meta"])
                ]
            else:
                feats = [
                    [float(x) for x in _fake_decode_features(bytes(d))]
                    for d in pdf["data"]
                ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "feature": feats}
            )

    return media.mapInPandas(op, schema="media_id long, kind string, feature array<float>")


def resize_images(media: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Real image transform: decode PPM -> block-mean resize -> re-encode PPM
    (media_id, data).  Non-image rows are dropped; non-PPM images raise (no
    external codec)."""
    from bliss_rs_spark.functions.media_codec import (
        decode_ppm,
        encode_ppm,
        resize_block_mean,
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "data": []}
            for mid, kind, data in zip(pdf["media_id"], pdf["kind"], pdf["data"]):
                if kind != "image":
                    continue
                img = decode_ppm(bytes(data))
                small = np.clip(resize_block_mean(img, out_h, out_w), 0, 255)
                rows["media_id"].append(int(mid))
                rows["data"].append(encode_ppm(small.astype(np.uint8)))
            yield pd.DataFrame(rows)

    return media.mapInPandas(op, schema="media_id long, data binary")


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
