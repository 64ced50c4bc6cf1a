"""Pure-NumPy FLAC codec (subset) — a REAL compressed audio format, natively.

The reference decodes compressed audio (FLAC among others) through ffmpeg
(/root/reference/src/song/decoder/ffmpeg.rs:135-360); its own test corpus is
FLAC files (data/s16_mono_22_5kHz.flac).  This container has no media
libraries, so the analogue implements the format itself from the PUBLIC
specification (RFC 9639 / xiph.org FLAC format): lossless compression via
per-frame linear prediction + rice-coded residuals, with CRC-8/CRC-16
integrity and an MD5 signature of the unencoded samples.

Encoder (subset, always produces spec-conformant streams):
  - 16-bit mono, fixed 4096-sample blocks (short last block)
  - per-frame best of CONSTANT / FIXED order 0-4 / VERBATIM subframes,
    chosen by exact coded size; rice parameter per frame by exhaustive
    scan (vectorized); partition order 0
Decoder (wider than the encoder — a subset FLAC decoder):
  - CONSTANT / VERBATIM / FIXED 0-4 / LPC subframes, wasted bits,
    rice4 + rice5 codes, any partition order, escaped partitions
  - independent channels (any count, mean-downmixed like decode_wav) and
    the left/right/mid-side stereo decorrelation modes
  - verifies frame CRC-16s and (16-bit streams) the STREAMINFO MD5

Everything is this repo's own implementation of the public spec; nothing is
ported from the reference (which contains no FLAC bit-level code at all).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_BLOCK = 4096

# --- CRCs (FLAC frame integrity; polynomials fixed by the spec) ---------------


def _make_crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        c = i << (width - 8)
        for _ in range(8):
            c = ((c << 1) ^ poly) if (c & top) else (c << 1)
        table[i] = c & mask
    return table


_CRC8_TABLE = _make_crc_table(0x07, 8)
_CRC16_TABLE = _make_crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8_TABLE[c ^ b])
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = (int(_CRC16_TABLE[((c >> 8) ^ b) & 0xFF]) ^ (c << 8)) & 0xFFFF
    return c


# --- bit-level IO (FLAC is big-endian bit-packed) ------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, val: int, bits: int) -> None:
        if bits <= 0:
            return
        self.acc = (self.acc << bits) | (val & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, val: int, bits: int) -> None:
        self.write(val & ((1 << bits) - 1), bits)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zero bits then a one

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0, "unaligned"
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, bits: int) -> int:
        v = 0
        while bits > 0:
            if self.byte >= len(self.data):
                raise ValueError("truncated FLAC stream")
            avail = 8 - self.bit
            take = min(bits, avail)
            cur = self.data[self.byte]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            bits -= take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        return v - (1 << bits) if v & (1 << (bits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self.byte >= len(self.data):
                raise ValueError("truncated FLAC stream")
            cur = self.data[self.byte]
            rest = 8 - self.bit
            chunk = cur & ((1 << rest) - 1)
            if chunk == 0:
                q += rest
                self.bit = 0
                self.byte += 1
                continue
            lead = rest - chunk.bit_length()
            q += lead
            self.bit += lead + 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1

    def at_end(self) -> bool:
        return self.byte >= len(self.data)


# --- coded number (the frame header's UTF-8-style frame/sample index) ----------


def _write_coded_number(w: _BitWriter, n: int) -> None:
    """UTF-8-style variable-length integer: a k-byte encoding carries
    (7-k) + 6*(k-1) payload bits (k up to 7, i.e. 36-bit sample numbers)."""
    if n < 0x80:
        w.write(n, 8)
        return
    for k in range(2, 8):
        if n < (1 << (7 - k + 6 * (k - 1))):
            break
    else:
        raise ValueError("coded number out of range")
    w.write(((1 << k) - 1) << 1, k + 1)  # k one-bits then a zero
    w.write(n >> (6 * (k - 1)), 7 - k)
    for i in range(k - 2, -1, -1):
        w.write(0b10, 2)
        w.write((n >> (6 * i)) & 0x3F, 6)


def _read_coded_number(r: _BitReader) -> int:
    first = r.read(8)
    if first < 0x80:
        return first
    n_follow = 0
    mask = 0x40
    while first & mask:
        n_follow += 1
        mask >>= 1
    if n_follow < 1 or n_follow > 6:
        raise ValueError("invalid coded number")
    v = first & (mask - 1)
    for _ in range(n_follow):
        b = r.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("invalid coded number continuation")
        v = (v << 6) | (b & 0x3F)
    return v


# --- rice coding ----------------------------------------------------------------


def _zigzag(res: np.ndarray) -> np.ndarray:
    r = res.astype(np.int64)
    return np.where(r >= 0, r << 1, (-(r) << 1) - 1)


def _best_rice_param(z: np.ndarray, max_k: int = 14) -> tuple[int, int]:
    """(k, total_bits) minimizing quotient-unary + k-bit remainders —
    exhaustive over k, fully vectorized."""
    n = len(z)
    best_k, best_bits = 0, None
    for k in range(max_k + 1):
        bits = int((z >> k).sum()) + n * (k + 1)
        if best_bits is None or bits < best_bits:
            best_k, best_bits = k, bits
    return best_k, best_bits


def _write_rice(w: _BitWriter, res: np.ndarray, k: int) -> None:
    z = _zigzag(res)
    for v in z:
        v = int(v)
        w.write_unary(v >> k)
        if k:
            w.write(v & ((1 << k) - 1), k)


def _read_rice_partitioned(r: _BitReader, block_size: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method not in (0, 1):
        raise ValueError(f"reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    n_part = 1 << porder
    if block_size % n_part or (block_size >> porder) <= order:
        raise ValueError("invalid rice partition order")
    out = np.empty(block_size - order, dtype=np.int64)
    pos = 0
    for p in range(n_part):
        n = (block_size >> porder) - (order if p == 0 else 0)
        k = r.read(pbits)
        if k == escape:
            raw = r.read(5)
            for i in range(n):
                out[pos + i] = r.read_signed(raw) if raw else 0
        else:
            for i in range(n):
                q = r.read_unary()
                v = (q << k) | (r.read(k) if k else 0)
                out[pos + i] = (v >> 1) if not (v & 1) else -((v + 1) >> 1)
        pos += n
    return out


# --- fixed predictors -------------------------------------------------------------


def _fixed_restore(warmup: np.ndarray, res: np.ndarray, order: int) -> np.ndarray:
    """Invert the order-k difference (FIXED subframe): cumsum per level,
    seeded from the warm-up samples — fully vectorized, no sample loop."""
    cur = np.asarray(res, dtype=np.int64)
    w = np.asarray(warmup, dtype=np.int64)
    for j in range(order, 0, -1):
        first = int(np.diff(w, n=j - 1)[0]) if j > 1 else int(w[0])
        cur = np.concatenate(([first], first + np.cumsum(cur)))
    return cur


def _lpc_restore(warmup: np.ndarray, res: np.ndarray, coefs: list[int],
                 shift: int) -> np.ndarray:
    order = len(coefs)
    n = order + len(res)
    x = np.empty(n, dtype=np.int64)
    x[:order] = warmup
    c = coefs  # c[0] applies to the most recent sample
    for i in range(order, n):
        acc = 0
        for j in range(order):
            acc += c[j] * int(x[i - 1 - j])
        x[i] = int(res[i - order]) + (acc >> shift)
    return x


# --- encoder ------------------------------------------------------------------------


def _encode_subframe(w: _BitWriter, x: np.ndarray, bps: int) -> None:
    n = len(x)
    if np.all(x == x[0]):
        w.write(0, 1)
        w.write(0b000000, 6)  # CONSTANT
        w.write(0, 1)  # no wasted bits
        w.write_signed(int(x[0]), bps)
        return
    best = None  # (bits, order, residual, k)
    for order in range(0, min(5, n)):
        res = np.diff(x, n=order) if order else x.astype(np.int64)
        k, bits = _best_rice_param(_zigzag(res))
        total = order * bps + 8 + bits
        if best is None or total < best[0]:
            best = (total, order, res, k)
    if best[0] >= n * bps:  # rice blew up: VERBATIM is smaller
        w.write(0, 1)
        w.write(0b000001, 6)
        w.write(0, 1)
        for v in x:
            w.write_signed(int(v), bps)
        return
    _, order, res, k = best
    w.write(0, 1)
    w.write(0b001000 | order, 6)  # FIXED, order
    w.write(0, 1)  # no wasted bits
    for v in x[:order]:
        w.write_signed(int(v), bps)
    w.write(0b00, 2)  # rice method 0 (4-bit params)
    w.write(0, 4)  # partition order 0
    w.write(k, 4)
    _write_rice(w, res, k)


def encode_flac_int16(pcm: np.ndarray, sample_rate: int,
                      block_size: int = _BLOCK) -> bytes:
    """Mono int16 samples -> FLAC stream bytes (fLaC marker + STREAMINFO +
    frames).  Lossless: decode_flac round-trips bit-exactly (tested,
    including the STREAMINFO MD5 check)."""
    x = np.asarray(pcm, dtype=np.int16)
    n_total = len(x)
    md5 = hashlib.md5(x.astype("<i2").tobytes()).digest()

    frames = bytearray()
    frame_no = 0
    for start in range(0, max(n_total, 1), block_size):
        blk = x[start:start + block_size].astype(np.int64)
        bs = len(blk)
        if bs == 0:
            break
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)  # sync
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocking strategy
        if bs == block_size and block_size == 4096:
            bs_code, bs_tail = 0b1100, None
        else:
            bs_code, bs_tail = 0b0111, bs - 1  # explicit 16-bit at header end
        hdr.write(bs_code, 4)
        hdr.write(0b0000, 4)  # sample rate: from STREAMINFO
        hdr.write(0b0000, 4)  # channel assignment: 1 channel
        hdr.write(0b100, 3)  # sample size: 16 bit
        hdr.write(0, 1)  # reserved
        _write_coded_number(hdr, frame_no)
        if bs_tail is not None:
            hdr.write(bs_tail, 16)
        hdr_bytes = hdr.getvalue()
        body = _BitWriter()
        _encode_subframe(body, blk, 16)
        body.align()
        frame = hdr_bytes + bytes([_crc8(hdr_bytes)]) + body.getvalue()
        frames += frame + struct.pack(">H", _crc16(frame))
        frame_no += 1

    si = _BitWriter()
    si.write(min(block_size, 65535), 16)  # min block size
    si.write(min(block_size, 65535), 16)  # max block size
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)  # max frame size unknown
    si.write(sample_rate, 20)
    si.write(0, 3)  # channels - 1
    si.write(15, 5)  # bits per sample - 1
    si.write(n_total, 36)
    streaminfo = si.getvalue() + md5
    header = b"fLaC" + bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:]
    return header + streaminfo + bytes(frames)


def encode_flac(samples: np.ndarray, sample_rate: int,
                block_size: int = _BLOCK) -> bytes:
    """Mono float [-1, 1] -> FLAC bytes (same front-end contract as
    media_codec.encode_wav: 16-bit quantization, then lossless)."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    return encode_flac_int16(np.round(pcm * 32767.0).astype(np.int16),
                             sample_rate, block_size)


# --- decoder -------------------------------------------------------------------------

_SR_CODES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
             7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}


def _decode_subframe(r: _BitReader, bs: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("subframe padding bit set")
    t = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
        bps -= wasted
    if t == 0:  # CONSTANT
        x = np.full(bs, r.read_signed(bps), dtype=np.int64)
    elif t == 1:  # VERBATIM
        x = np.array([r.read_signed(bps) for _ in range(bs)], dtype=np.int64)
    elif 8 <= t <= 12:  # FIXED order 0-4
        order = t - 8
        warm = np.array([r.read_signed(bps) for _ in range(order)], dtype=np.int64)
        res = _read_rice_partitioned(r, bs, order)
        x = _fixed_restore(warm, res, order) if order else res
    elif t >= 32:  # LPC
        order = (t & 0x1F) + 1
        warm = np.array([r.read_signed(bps) for _ in range(order)], dtype=np.int64)
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("invalid qlp precision escape")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("negative qlp shift")
        coefs = [r.read_signed(prec) for _ in range(order)]
        res = _read_rice_partitioned(r, bs, order)
        x = _lpc_restore(warm, res, coefs, shift)
    else:
        raise ValueError(f"reserved subframe type {t}")
    return x << wasted if wasted else x


def decode_flac(data: bytes) -> tuple[int, np.ndarray]:
    """FLAC bytes -> (sample_rate, mono float64 in [-1, 1]).

    Same contract as media_codec.decode_wav: multi-channel input is
    mean-downmixed.  Verifies every frame's CRC-16 and, for 16-bit streams,
    the STREAMINFO MD5 of the decoded samples — a corrupted stream raises
    instead of returning wrong audio."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    sample_rate = channels = bits = None
    md5_expect = None
    n_total = 0
    while True:  # metadata blocks
        if pos + 4 > len(data):
            raise ValueError("truncated FLAC metadata")
        last = bool(data[pos] & 0x80)
        btype = data[pos] & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + data[pos + 1:pos + 4])
        body = data[pos + 4:pos + 4 + blen]
        if btype == 0:  # STREAMINFO
            br = _BitReader(body)
            br.read(16), br.read(16), br.read(24), br.read(24)
            sample_rate = br.read(20)
            channels = br.read(3) + 1
            bits = br.read(5) + 1
            n_total = br.read(36)
            md5_expect = body[18:34]
        pos += 4 + blen
        if last:
            break
    if sample_rate is None:
        raise ValueError("missing STREAMINFO")

    chans: list[np.ndarray] = []
    r = _BitReader(data, pos)
    while not r.at_end():
        frame_start = r.byte
        if r.read(14) != 0b11111111111110:
            raise ValueError("lost frame sync")
        r.read(1)
        r.read(1)  # reserved, blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        r.read(1)
        _read_coded_number(r)
        if bs_code == 0:
            raise ValueError("reserved block size code")
        elif bs_code == 1:
            bs = 192
        elif bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 6:
            bs = r.read(8) + 1
        elif bs_code == 7:
            bs = r.read(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        hdr_bytes = data[frame_start:r.byte + (1 if r.bit else 0)]
        if _crc8(hdr_bytes) != r.read(8):
            raise ValueError("frame header CRC-8 mismatch")
        ss = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}.get(ss_code, bits)
        n_ch = (ch_code + 1) if ch_code <= 7 else 2
        sub = []
        for c in range(n_ch):
            bps = ss
            if (ch_code == 8 and c == 1) or (ch_code == 9 and c == 0) or (
                ch_code == 10 and c == 1
            ):
                bps += 1  # side channel carries one extra bit
            sub.append(_decode_subframe(r, bs, bps))
        r.align()
        frame_bytes = data[frame_start:r.byte]
        if _crc16(frame_bytes) != r.read(16):
            raise ValueError("frame CRC-16 mismatch")
        if ch_code <= 7:
            frame_ch = sub
        elif ch_code == 8:  # left/side
            frame_ch = [sub[0], sub[0] - sub[1]]
        elif ch_code == 9:  # side/right
            frame_ch = [sub[1] + sub[0], sub[1]]
        elif ch_code == 10:  # mid/side
            mid = (sub[0] << 1) | (sub[1] & 1)
            frame_ch = [(mid + sub[1]) >> 1, (mid - sub[1]) >> 1]
        else:
            raise ValueError(f"reserved channel assignment {ch_code}")
        if not chans:
            chans = [[] for _ in frame_ch]
        for c, arr in enumerate(frame_ch):
            chans[c].append(arr)
        # tolerate trailing zero padding after the last frame
        rest = data[r.byte:]
        if rest and not any(rest):
            break

    if not chans:  # zero-sample stream: no frames at all
        return int(sample_rate), np.empty(0, dtype=np.float64)
    full = [np.concatenate(c) if c else np.empty(0, dtype=np.int64) for c in chans]
    if n_total:
        full = [c[:n_total] for c in full]
    if (
        md5_expect
        and md5_expect != b"\x00" * 16
        and bits == 16
        and len(full) == channels
    ):
        inter = np.stack(full, axis=-1).astype("<i2").tobytes()
        if hashlib.md5(inter).digest() != md5_expect:
            raise ValueError("decoded samples fail the STREAMINFO MD5 check")
    mono = np.mean(np.stack(full, axis=0), axis=0) if len(full) > 1 else full[0].astype(np.float64)
    scale = float(1 << (bits - 1)) - 1.0
    return int(sample_rate), np.asarray(mono, dtype=np.float64) / scale
