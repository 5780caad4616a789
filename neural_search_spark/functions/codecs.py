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


def bits_needed(values: np.ndarray) -> np.ndarray:
    """Minimal bit width per non-negative value (0 -> 0 bits)."""
    v = np.asarray(values, dtype=np.uint64)
    n = np.zeros(len(v), dtype=np.int64)
    x = v.copy()
    while (x > 0).any():
        n += (x > 0)
        x >>= _U64(1)
    return n


def choose_pfor_width(values: np.ndarray, coverage: float = 0.98) -> int:
    """Patched-frame-of-reference width: the smallest b covering
    ``coverage`` of the values; the tail becomes exceptions."""
    if len(values) == 0:
        return 0
    nb = np.sort(bits_needed(values))
    return int(nb[min(len(nb) - 1, int(coverage * (len(nb) - 1)))])


def pfor_encode_groups(
    values: np.ndarray, group_starts: np.ndarray, group_ns: np.ndarray, b: int
) -> tuple[bytes, np.ndarray, np.ndarray, np.ndarray]:
    """PFor-encode a value stream split into groups (posting blocks).

    Each value's LOW ``b`` bits are bit-packed little-endian; every group
    is padded to a byte boundary so per-group random access stays a byte
    slice. Values needing more than ``b`` bits are exceptions: their
    stream position and HIGH part (value >> b) ride alongside
    (patched-FOR — Zukowski et al. 2006 / Lucene FOR-with-exceptions,
    public knowledge). Returns
    (blob, group_byte_offsets, exception_positions, exception_high).
    Fully vectorized — one packbits per call, no per-value Python.
    """
    v = np.asarray(values, dtype=np.uint64)
    ns = np.asarray(group_ns, dtype=np.int64)
    nbytes_g = (ns * b + 7) // 8
    byte_off = np.r_[0, np.cumsum(nbytes_g)]
    exc_mask = bits_needed(v) > b
    exc_pos = np.flatnonzero(exc_mask).astype(np.int64)
    exc_high = (v[exc_mask] >> _U64(b)).astype(np.int64)
    total_bits = int(byte_off[-1]) * 8
    if b == 0 or total_bits == 0:
        return b"\x00" * int(byte_off[-1]), byte_off[:-1], exc_pos, exc_high
    within = np.arange(len(v), dtype=np.int64) - np.repeat(group_starts, ns)
    base_bit = np.repeat(byte_off[:-1] * 8, ns) + within * b
    dest = (np.repeat(base_bit, b) + np.tile(np.arange(b, dtype=np.int64), len(v)))
    bits = ((v[:, None] >> _U64(1) * np.arange(b, dtype=np.uint64)) & _U64(1)).astype(np.uint8)
    out_bits = np.zeros(total_bits, dtype=np.uint8)
    out_bits[dest] = bits.ravel()
    return np.packbits(out_bits, bitorder="little").tobytes(), byte_off[:-1], exc_pos, exc_high


def pfor_decode_group(buf: bytes | np.ndarray, n: int, b: int) -> np.ndarray:
    """Decode one group's low parts (uint64, exceptions NOT yet patched)."""
    if n == 0:
        return np.empty(0, dtype=_U64)
    if b == 0:
        return np.zeros(n, dtype=_U64)
    raw = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    bits = np.unpackbits(raw, bitorder="little")[: n * b].reshape(n, b).astype(_U64)
    return bits @ (_U64(1) << np.arange(b, dtype=np.uint64))


def encode_postings(doc_ids: np.ndarray, base: int = 0) -> bytes:
    """delta + varint in one shot (sorted unique doc ids)."""
    return varint_encode(delta_encode(doc_ids, base=base))


def decode_postings(buf: bytes, base: int = 0) -> np.ndarray:
    return delta_decode(varint_decode(buf).astype(np.int64), base=base)
