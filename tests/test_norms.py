"""SmallFloat norm quantization parity tests.

Scalar reference implements the published Lucene SmallFloat algorithm
(intToByte4 / byte4ToInt) directly; the vectorized + SQL-ladder versions
must agree everywhere.
"""

import numpy as np
import pytest

from neural_search_spark.functions.norms import (
    byte4_to_int,
    int_to_byte4,
    quantize_length,
    quantized_dl_sql,
)


def _scalar_int_to_byte4(i: int) -> int:
    assert i >= 0
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07
    encoded |= (shift + 1) << 3
    return encoded


def _scalar_byte4_to_int(b: int) -> int:
    bits = b & 0x07
    shift = (b >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


def test_exhaustive_small():
    vals = np.arange(0, 70000)
    enc = int_to_byte4(vals)
    expect = np.array([_scalar_int_to_byte4(int(v)) for v in vals])
    np.testing.assert_array_equal(enc, expect.astype(np.uint8))
    dec = byte4_to_int(enc)
    expect_dec = np.array([_scalar_byte4_to_int(int(e)) for e in expect])
    np.testing.assert_array_equal(dec, expect_dec)


def test_powers_of_two_edges():
    vals = []
    for p in range(3, 31):
        vals += [(1 << p) - 1, 1 << p, (1 << p) + 1]
    vals = np.array(vals)
    np.testing.assert_array_equal(
        int_to_byte4(vals),
        np.array([_scalar_int_to_byte4(int(v)) for v in vals], dtype=np.uint8),
    )


def test_monotone_and_idempotent():
    vals = np.arange(0, 200000)
    q = quantize_length(vals)
    assert np.all(np.diff(q) >= 0)
    np.testing.assert_array_equal(quantize_length(q), q)  # representatives are fixed points


def test_sql_ladder_matches_duckdb():
    import duckdb

    sql = quantized_dl_sql("dl")
    vals = list(range(0, 5000)) + [(1 << p) + d for p in range(3, 30) for d in (-1, 0, 1)]
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS dl", [vals])
    got = [r[0] for r in con.execute(f"SELECT {sql} FROM t ORDER BY rowid").fetchall()]
    expect = quantize_length(np.array(vals)).tolist()
    assert got == expect
