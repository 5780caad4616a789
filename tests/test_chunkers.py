"""Chunker golden fixtures — reference semantics from
processor/chunker/FixedTokenLengthChunker.java:120-157 and
DelimiterChunker.java:53-77 (delimiter kept at END of each chunk,
remainder merged into the max_chunk_limit-th chunk)."""

from neural_search_spark.operators.chunkers import (
    chunk_delimiter,
    chunk_fixed_token_length,
    delimiter_chunk_table,
    fixed_token_chunk_counts,
)


def test_delimiter_keeps_delimiter_at_end():
    assert chunk_delimiter("a\n\nb\n\nc", "\n\n") == ["a\n\n", "b\n\n", "c"]
    assert chunk_delimiter("a\n\n", "\n\n") == ["a\n\n"]
    assert chunk_delimiter("abc", "\n\n") == ["abc"]


def test_delimiter_max_chunk_limit_merges_tail():
    text = "a.b.c.d.e"
    assert chunk_delimiter(text, ".", max_chunk_limit=3) == ["a.", "b.", "c.d.e"]


def test_fixed_token_windows_and_overlap():
    text = " ".join(f"t{i}" for i in range(10))
    # token_limit=4, overlap_rate=0.5 -> step 2: windows at 0,2,4,6 (6+4>=10 last)
    chunks = chunk_fixed_token_length(text, token_limit=4, overlap_rate=0.5)
    assert chunks[0].split() == ["t0", "t1", "t2", "t3"]
    assert chunks[1].split() == ["t2", "t3", "t4", "t5"]
    assert chunks[-1].split() == ["t6", "t7", "t8", "t9"]
    assert len(chunks) == 4
    # no overlap -> ceil(10/4) windows, last short
    plain = chunk_fixed_token_length(text, token_limit=4, overlap_rate=0.0)
    assert [len(c.split()) for c in plain] == [4, 4, 2]
    # reconstruction: non-overlapping chunks concatenate to the source
    assert "".join(plain) == text


def test_fixed_token_chunk_limit_merges_remainder():
    text = " ".join(f"t{i}" for i in range(10))
    capped = chunk_fixed_token_length(text, token_limit=2, overlap_rate=0.0, max_chunk_limit=3)
    assert len(capped) == 3
    assert capped[-1].split() == [f"t{i}" for i in range(4, 10)]


def test_fixed_token_empty():
    assert chunk_fixed_token_length("   ") == []
    assert chunk_delimiter("", ".") == []


def test_delimiter_chunk_table_spark(spark):
    df = spark.createDataFrame([(1, "x the y the z")], ["doc_id", "text"])
    rows = delimiter_chunk_table(df, " the ").orderBy("chunk_idx").collect()
    assert [(r.chunk_idx, r.n_chars) for r in rows] == [(0, 6), (1, 6), (2, 1)]


def test_fixed_token_chunk_counts_spark(spark):
    texts = [(1, " ".join(["w"] * 5)), (2, " ".join(["w"] * 33)), (3, " ".join(["w"] * 57)), (4, "")]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    out = {r.doc_id: r.n_chunks for r in fixed_token_chunk_counts(df, 32, 0.25).collect()}
    assert out == {1: 1, 2: 2, 3: 3, 4: 0}


def test_delimiter_literal_on_both_engines(spark):
    """The delimiter is a LITERAL on Spark AND DuckDB (round 5): Spark's
    split() takes a Java regex, so a metachar delimiter like " | " used
    to become alternation there while DuckDB stayed literal — the two
    engines chunked the same text differently. Newline delimiters also
    need DuckDB E'' escape strings."""
    import duckdb

    from neural_search_spark.operators.chunkers import delimiter_chunks_sql

    from pyspark.sql import functions as F

    con = duckdb.connect()
    cases = [
        (" | ", "q a b c | q q d e", ["q a b c | ", "q q d e"]),
        (".", "a.b.c", ["a.", "b.", "c"]),
        ("\n\n", "a b\n\nc d\n\ne", ["a b\n\n", "c d\n\n", "e"]),
        ("' the '", "x' the 'y", ["x' the '", "y"]),
    ]
    for delim, text, want in cases:
        sp, du = delimiter_chunks_sql("text", delim)
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        got_sp = df.select(F.expr(sp).alias("c")).collect()[0]["c"]
        got_du = con.execute(
            f"SELECT {du} AS c FROM (SELECT ? AS text)", [text]).fetchone()[0]
        assert got_sp == want == got_du, (delim, got_sp, got_du)
    import pytest as _pytest

    with _pytest.raises(ValueError):  # backslash delimiters are
        delimiter_chunks_sql("text", "a\\b")  # engine-divergent: reject
