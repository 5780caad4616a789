"""Deterministic 64-bit hashing shared between Spark and DuckDB.

Both engines lack a *common* native 64-bit hash (Spark xxhash64 vs DuckDB
hash() disagree), so the engine standardizes on the first 14 hex chars of
md5 (56 bits, always non-negative in int64) — md5 over UTF-8 bytes is
identical everywhere. MinHash permutations are universal hashes
``(a·h + b) mod P`` over that 56-bit value with P = 2^61 − 1; all
intermediates stay < 2^63 so int64 arithmetic is exact in both engines.
"""

from __future__ import annotations

import hashlib

# Mersenne prime 2^61 - 1: a*h + b <= 63*(2^56-1) + P < 2^63 — no overflow.
MERSENNE_P = (1 << 61) - 1
HASH_HEX_CHARS = 14  # 56 bits


def hash64_sql(expr: str) -> tuple[str, str]:
    """(spark_expr, duckdb_expr): 56-bit int64 hash of a string expr."""
    spark = f"CAST(conv(substring(md5({expr}), 1, {HASH_HEX_CHARS}), 16, 10) AS BIGINT)"
    duck = f"(('0x' || substr(md5({expr}), 1, {HASH_HEX_CHARS}))::BIGINT)"
    return spark, duck


def py_hash64(s: str) -> int:
    """Python twin of hash64_sql — used in kernels and tests."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:HASH_HEX_CHARS], 16)


def minhash_params(num_perm: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) per permutation; a_i odd and small so the
    product stays < 2^62, b_i a 56-bit md5-derived constant."""
    return [(2 * i + 1, py_hash64(f"minhash-b-{i}")) for i in range(num_perm)]


def minhash_expr(hash_col: str, a: int, b: int) -> str:
    """Dialect-shared SQL for one permuted hash (valid in Spark AND DuckDB)."""
    return f"(({a} * {hash_col} + {b}) % {MERSENNE_P})"


def shingles_sql(toks_col: str, n: int) -> tuple[str, str]:
    """(spark_expr, duck_expr): distinct n-gram shingle strings from a
    token-array *column* (pass a plain column name — it is inlined).
    n=1 degenerates to the distinct token set. Spark arrays are 0-based,
    DuckDB lists 1-based."""
    if n == 1:
        return f"array_distinct({toks_col})", f"list_distinct({toks_col})"
    parts_s = ", ".join(f"{toks_col}[i + {j}]" for j in range(n))
    spark = (
        f"(CASE WHEN size({toks_col}) >= {n} THEN "
        f"array_distinct(transform(sequence(0, size({toks_col}) - {n}), "
        f"i -> concat_ws(' ', {parts_s}))) ELSE array() END)"
    )
    parts_d = " || ' ' || ".join(f"{toks_col}[i + {j}]" for j in range(n))
    duck = (
        f"(CASE WHEN len({toks_col}) >= {n} THEN "
        f"list_distinct([{parts_d} for i in range(1, len({toks_col}) - {n} + 2)]) "
        f"ELSE [] END)"
    )
    return spark, duck
