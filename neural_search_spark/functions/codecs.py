"""Vectorized posting-list codecs: delta + LEB128 varint, in numpy.

The reference relies on Lucene's postings codecs (outside the plugin —
SURVEY.md §2.14); we build the equivalent from public knowledge: doc ids
are sorted per (term, block), delta-encoded, then varint-encoded
(7 data bits per byte, high bit = continuation). Term frequencies and
norm bytes ride alongside. All encode/decode paths are numpy-vectorized
(no per-value Python loops) because they run inside Arrow-batched UDFs
on the hot path.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
# thresholds[j] = smallest value needing more than j+1 varint bytes
_THRESHOLDS = np.array([1 << (7 * j) for j in range(1, 10)], dtype=np.float64)


def varint_nbytes(values: np.ndarray) -> np.ndarray:
    """Number of LEB128 bytes per value (vectorized, exact)."""
    v = values.astype(_U64, copy=False)
    n = np.ones(len(v), dtype=np.int64)
    for j in range(1, 10):
        bound = _U64(1) << _U64(7 * j)
        n += v >= bound
    return n


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a non-negative integer array into bytes."""
    v = np.asarray(values).astype(_U64, copy=False)
    if len(v) == 0:
        return b""
    nbytes = varint_nbytes(v)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    offsets = np.cumsum(nbytes) - nbytes
    max_n = int(nbytes.max())
    for j in range(max_n):
        mask = nbytes > j
        idx = offsets[mask] + j
        chunk = (v[mask] >> _U64(7 * j)) & _U64(0x7F)
        cont = (nbytes[mask] - 1) > j
        out[idx] = chunk.astype(np.uint8) | (cont.astype(np.uint8) << 7)
    return out.tobytes()


def varint_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode LEB128 bytes back to a uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if len(b) == 0:
        return np.empty(0, dtype=_U64)
    term = (b & 0x80) == 0  # terminator bytes (one per value)
    group = np.cumsum(term) - term  # value index for each byte
    value_starts = np.flatnonzero(np.r_[True, term[:-1]])
    pos = np.arange(len(b), dtype=np.int64) - value_starts[group]
    contrib = (b & np.uint8(0x7F)).astype(_U64) << (_U64(7) * pos.astype(_U64))
    return np.add.reduceat(contrib, value_starts)


def delta_encode(sorted_ids: np.ndarray, base: int = 0) -> np.ndarray:
    """First value stored relative to ``base``; rest as gaps.

    ``sorted_ids`` must be strictly increasing (posting doc ids within a
    block are unique and sorted).
    """
    ids = np.asarray(sorted_ids, dtype=np.int64)
    if len(ids) == 0:
        return np.empty(0, dtype=np.int64)
    out = np.empty(len(ids), dtype=np.int64)
    out[0] = ids[0] - base
    np.subtract(ids[1:], ids[:-1], out=out[1:])
    return out


def delta_decode(deltas: np.ndarray, base: int = 0) -> np.ndarray:
    d = np.asarray(deltas, dtype=np.int64)
    if len(d) == 0:
        return np.empty(0, dtype=np.int64)
    out = np.cumsum(d)
    return out + base


def encode_postings(doc_ids: np.ndarray, base: int = 0) -> bytes:
    """delta + varint in one shot (sorted unique doc ids)."""
    return varint_encode(delta_encode(doc_ids, base=base))


def decode_postings(buf: bytes, base: int = 0) -> np.ndarray:
    return delta_decode(varint_decode(buf).astype(np.int64), base=base)
