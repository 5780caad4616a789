"""Property tests for the delta+varint posting codecs (SURVEY.md §2.14)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from neural_search_spark.functions.codecs import (
    decode_postings,
    delta_decode,
    delta_encode,
    encode_postings,
    varint_decode,
    varint_encode,
    varint_nbytes,
)


def _scalar_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    buf = varint_encode(arr)
    assert buf == b"".join(_scalar_varint(int(v)) for v in vals)
    out = varint_decode(buf)
    assert out.tolist() == [int(v) for v in vals]


def test_varint_nbytes_boundaries():
    vals = np.array([0, 1, 127, 128, 16383, 16384, 2**21 - 1, 2**21, 2**63 - 1], dtype=np.uint64)
    assert varint_nbytes(vals).tolist() == [1, 1, 1, 2, 2, 3, 3, 4, 9]


@given(
    st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=500, unique=True),
    st.integers(min_value=0, max_value=100),
)
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(ids, base_off):
    ids = sorted(ids)
    base = max(0, ids[0] - base_off)
    d = delta_encode(np.array(ids), base=base)
    assert delta_decode(d, base=base).tolist() == ids
    buf = encode_postings(np.array(ids), base=base)
    assert decode_postings(buf, base=base).tolist() == ids


def test_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").tolist() == []
    assert decode_postings(b"").tolist() == []


def test_compression_wins_on_dense_ids():
    ids = np.arange(0, 128 * 50, 3)  # dense-ish postings
    buf = encode_postings(ids)
    assert len(buf) < ids.nbytes / 4  # gaps of 3 → 1 byte each vs 8
