"""Lucene-style length-norm quantization (SmallFloat int4/byte4).

Lucene's ``BM25Similarity`` does not use the exact document length: the
length is quantized through ``SmallFloat.intToByte4`` (1 byte, 3-bit
mantissa + implicit leading bit + 5-bit exponent) at index time and
decoded with ``byte4ToInt`` at query time. Rank-exact parity with the
reference (which scores through Lucene — SURVEY.md §2.14) requires the
same quantization. Semantics re-implemented from the public Lucene API
docs/algorithm (org.apache.lucene.util.SmallFloat), not copied code.
"""

from __future__ import annotations

import numpy as np


def int_to_byte4(values: np.ndarray) -> np.ndarray:
    """Quantize non-negative ints to Lucene's 4-bit-mantissa byte code.

    values <= 7 encode as themselves; larger values keep the top 4
    significant bits (implicit leading 1 + 3 stored) and a shift+1
    exponent in the high 5 bits.
    """
    v = np.asarray(values, dtype=np.int64)
    if np.any(v < 0):
        raise ValueError("norms must be non-negative")
    out = np.empty(len(v), dtype=np.uint8)
    small = v < 8
    out[small] = v[small].astype(np.uint8)
    big = ~small
    if big.any():
        vb = v[big]
        # numBits = position of highest set bit + 1
        num_bits = np.floor(np.log2(vb.astype(np.float64))).astype(np.int64) + 1
        # float log2 can be off-by-one at exact powers of two — fix up
        too_high = (np.int64(1) << (num_bits - 1)) > vb
        num_bits -= too_high
        too_low = (np.int64(1) << num_bits) <= vb
        num_bits += too_low
        shift = num_bits - 4
        encoded = ((vb >> shift) & 0x07) | ((shift + 1) << 3)
        out[big] = encoded.astype(np.uint8)
    return out


def byte4_to_int(codes: np.ndarray) -> np.ndarray:
    """Decode the quantized byte back to its representative length."""
    c = np.asarray(codes, dtype=np.int64) & 0xFF
    bits = c & 0x07
    shift = (c >> 3) - 1
    decoded = np.where(shift < 0, bits, (bits | 0x08) << np.maximum(shift, 0))
    return decoded.astype(np.int64)


def quantize_length(dl: np.ndarray) -> np.ndarray:
    """dl -> decoded representative (the value BM25 actually sees)."""
    return byte4_to_int(int_to_byte4(dl))


# Decoded representatives are monotone in dl; build the exact threshold
# ladder once so the same quantization is expressible in ANSI SQL (used
# by the DuckDB oracle AND by the Catalyst-side F.expr — one source of
# truth, SURVEY.md §6 rank-exactness row).
def _ladder(max_shift: int = 28) -> list[tuple[int, int]]:
    """[(upper_exclusive_bound, decoded_value)] in ascending order."""
    steps: list[tuple[int, int]] = [(i + 1, i) for i in range(8)]
    for s in range(0, max_shift):
        for m in range(8, 16):
            upper = (m + 1) << s
            decoded = m << s
            if s == 0 and m < 8:
                continue
            steps.append((upper, decoded))
    # dedupe keeping ascending bounds
    steps.sort()
    out: list[tuple[int, int]] = []
    for upper, dec in steps:
        if out and out[-1][0] == upper:
            continue
        out.append((upper, dec))
    return out


def quantized_dl_sql(col: str = "dl") -> str:
    """ANSI-SQL CASE expression computing quantize_length(col).

    Runs identically under Spark SQL (F.expr) and DuckDB, so the
    correctness oracle exercises the true quantization path.
    """
    parts = [f"CASE WHEN {col} < 8 THEN {col}"]
    for upper, dec in _ladder():
        if upper <= 8:
            continue
        parts.append(f"WHEN {col} < {upper} THEN {dec}")
    parts.append(f"ELSE {col} END")
    return " ".join(parts)
