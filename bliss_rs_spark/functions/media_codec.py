"""Pure-NumPy media codecs + feature extractors for UNCOMPRESSED formats.

The container has no media libraries, but uncompressed formats need none:
RIFF/WAVE PCM and binary PPM (P6) are fully specified public formats
decodable with `np.frombuffer` — so the multimodal pipeline's decode step is
REAL for these, and the NotImplementedError stub shrinks to genuinely
codec-requiring formats (jpeg/mp3/h264...).

Feature extractors mirror the reference's own descriptor domain: bliss-rs
computes zero-crossing rate, spectral centroid and rolloff from decoded PCM
(/root/reference/src/temporal.rs ZeroCrossingRateDesc,
/root/reference/src/song/mod.rs:413-508 analyze); the image path computes
channel moments + an 8-bin luma histogram + a block-mean thumbnail (the
resize primitive).  All float64 internally, float32 out, deterministic.
"""

from __future__ import annotations

import struct

import numpy as np

# --- WAV (RIFF PCM 16-bit) ----------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Mono float [-1, 1] -> 16-bit PCM RIFF/WAVE bytes."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm16 = np.round(pcm * 32767.0).astype("<i2")
    data = pcm16.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE 16-bit PCM bytes -> (sample_rate, mono float64 in [-1, 1]).

    Multi-channel input is mean-downmixed (the reference's decoder also
    resamples/downmixes to one canonical form,
    /root/reference/src/song/decoder/ffmpeg.rs:135-360)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate, n_channels, bits = None, None, None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, n_channels, sample_rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError(
                    f"only uncompressed 16-bit PCM supported (fmt={audio_fmt}, bits={bits})"
                )
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    x = np.frombuffer(pcm, dtype="<i2").astype(np.float64) / 32767.0
    if n_channels > 1:
        x = x[: len(x) - len(x) % n_channels].reshape(-1, n_channels).mean(axis=1)
    return int(sample_rate), x


def audio_features(samples: np.ndarray, sample_rate: int, n_bands: int = 8) -> np.ndarray:
    """16 real audio descriptors: duration, rms, zero-crossing rate, spectral
    centroid/rolloff (Hz, from one rfft over the clip), flatness, and 8
    log-energy bands + 2 reserved zeros.  ZCR/centroid/rolloff are the
    reference's own temporal/spectral descriptors re-derived from public
    definitions (/root/reference/src/temporal.rs, aubio specdesc lineage)."""
    x = np.asarray(samples, dtype=np.float64)
    n = len(x)
    if n == 0:
        return np.zeros(16, dtype=np.float32)
    duration = n / float(sample_rate)
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))) if n > 1 else 0.0
    spec = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(n, d=1.0 / sample_rate)
    power = spec * spec
    total = float(power.sum())
    if total > 0:
        centroid = float((freqs * power).sum() / total)
        cum = np.cumsum(power)
        rolloff = float(freqs[int(np.searchsorted(cum, 0.85 * total))])
        flat = float(
            np.exp(np.mean(np.log(power + 1e-20))) / (power.mean() + 1e-20)
        )
    else:
        centroid = rolloff = flat = 0.0
    bands = np.zeros(n_bands)
    if total > 0:
        edges = np.linspace(0, len(power), n_bands + 1).astype(int)
        for i in range(n_bands):
            bands[i] = np.log1p(power[edges[i] : edges[i + 1]].sum())
    out = np.array(
        [duration, rms, zcr, centroid, rolloff, flat, *bands, 0.0, 0.0],
        dtype=np.float32,
    )
    return out


# --- PPM (P6 binary) ------------------------------------------------------------


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> binary PPM (P6)."""
    h, w, c = img.shape
    assert c == 3
    return f"P6\n{w} {h}\n255\n".encode() + np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (H, W, 3) uint8.  Handles comment lines."""
    if data[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM supported")
    img = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return img.reshape(h, w, 3)


def resize_block_mean(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Pure-NumPy resize by block averaging (area interpolation for integer
    downscale; nearest rows/cols otherwise) — the thumbnail primitive."""
    h, w, c = img.shape
    ys = (np.arange(out_h + 1) * h // out_h).astype(int)
    xs = (np.arange(out_w + 1) * w // out_w).astype(int)
    out = np.empty((out_h, out_w, c), dtype=np.float64)
    f = img.astype(np.float64)
    for i in range(out_h):
        y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
        for j in range(out_w):
            x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
            out[i, j] = f[y0:y1, x0:x1].mean(axis=(0, 1))
    return out


def image_features(img: np.ndarray) -> np.ndarray:
    """16 real image descriptors: per-channel mean/std (6), 8-bin luma
    histogram (L1-normalized), aspect ratio, mean 4x4-thumbnail contrast."""
    f = img.astype(np.float64)
    means = f.mean(axis=(0, 1)) / 255.0
    stds = f.std(axis=(0, 1)) / 255.0
    luma = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    hist = np.histogram(luma, bins=8, range=(0, 256))[0].astype(np.float64)
    hist /= max(hist.sum(), 1.0)
    thumb = resize_block_mean(img, 4, 4).mean(axis=2)
    contrast = float(thumb.std() / 255.0)
    aspect = img.shape[1] / img.shape[0]
    return np.array([*means, *stds, *hist, aspect, contrast], dtype=np.float32)
