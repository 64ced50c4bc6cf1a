"""Codec round-trip + property tests (hypothesis)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from bliss_rs_spark.functions.codec import (
    decode_doc_ids,
    delta_decode,
    delta_encode,
    encode_doc_ids,
    varbyte_decode,
    varbyte_encode,
    zigzag_decode,
    zigzag_encode,
)


def test_varbyte_known_values():
    assert varbyte_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varbyte_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varbyte_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert list(varbyte_decode(b"\x80\x01")) == [128]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
def test_varbyte_roundtrip(vals):
    a = np.array(vals, dtype=np.uint64)
    assert list(varbyte_decode(varbyte_encode(a))) == vals


@settings(max_examples=100, deadline=None)
@given(st.sets(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=200))
def test_doc_id_roundtrip(ids):
    a = np.array(sorted(ids), dtype=np.int64)
    got = decode_doc_ids(encode_doc_ids(a))
    assert list(got) == sorted(ids)


def test_delta_roundtrip():
    a = np.array([3, 7, 8, 100, 10**12], dtype=np.uint64)
    assert list(delta_decode(delta_encode(a))) == list(a)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=50))
def test_zigzag_roundtrip(vals):
    a = np.array(vals, dtype=np.int64)
    assert list(zigzag_decode(zigzag_encode(a))) == vals


def test_compression_ratio_dense_ids():
    # dense ascending ids (gap=1) must compress to ~1 byte/posting + header
    ids = np.arange(10_000, dtype=np.int64)
    buf = encode_doc_ids(ids)
    assert len(buf) < 10_100
