"""Text chunkers (ingest processors).

Reference semantics:
 * fixed_token_length [processor/chunker/FixedTokenLengthChunker.java:
   120-157]: tokenize, emit windows of ``token_limit`` (default 384)
   tokens; consecutive windows overlap by floor(token_limit ×
   overlap_rate) tokens (overlap_rate ∈ [0, 0.5], default 0.0); chunk
   text spans from the first window token's start offset to the last's
   end (the final chunk runs to end of string).
 * delimiter [processor/chunker/DelimiterChunker.java:53-77]: split on a
   literal delimiter (default "\\n\\n"), delimiter kept at the END of
   each chunk; trailing remainder kept.
 * max_chunk_limit (default 100) [processor/chunker/Chunker.java:18-20]:
   when exceeded, the remainder is concatenated into the final chunk.

Exposed both as pandas functions (for Arrow UDF pipelines) and as
Spark-SQL-expressible builders so the DuckDB oracle can reproduce the
delimiter + fixed-token variants exactly.
"""

from __future__ import annotations

import math
import re

import pandas as pd

DEFAULT_TOKEN_LIMIT = 384
DEFAULT_OVERLAP_RATE = 0.0
DEFAULT_DELIMITER = "\n\n"
DEFAULT_MAX_CHUNK_LIMIT = 100

_WS_TOKEN = re.compile(r"\S+")
DEFAULT_CHUNK_TOKENIZER = "whitespace"


def _token_spans(text: str, tokenizer: str) -> list[tuple[int, int]]:
    """Char spans of the analyzer's tokens in the ORIGINAL text — the
    chunker needs offsets, not terms, so case-folding analyzers use
    their span pattern unfolded (a token's span is case-invariant)."""
    from ..functions.tokenize import py_token_spans

    if tokenizer == "whitespace":
        pat = _WS_TOKEN  # precompiled hot path (the historical default)
        return [(m.start(), m.end()) for m in pat.finditer(text)]
    try:
        # Python dialect: runs inside a pandas UDF under stdlib re /
        # char predicates (the engine dialect's \p{} classes don't
        # compile there; cross-dialect parity pinned by tests)
        return py_token_spans(text, tokenizer)
    except ValueError:
        raise ValueError(
            f"fixed_token_length chunking requires a registered "
            f"analyzer name, got [{tokenizer}] — raw split regexes "
            "carry no span pattern"
        ) from None


def chunk_fixed_token_length(
    text: str,
    token_limit: int = DEFAULT_TOKEN_LIMIT,
    overlap_rate: float = DEFAULT_OVERLAP_RATE,
    max_chunk_limit: int = DEFAULT_MAX_CHUNK_LIMIT,
    tokenizer: str = DEFAULT_CHUNK_TOKENIZER,
) -> list[str]:
    if not (0.0 <= overlap_rate <= 0.5):
        raise ValueError("overlap_rate must be in [0.0 ... 0.5]")
    if token_limit <= 0:
        raise ValueError("token_limit must be positive")
    spans = _token_spans(text, tokenizer)
    if not spans:
        return []
    overlap = math.floor(token_limit * overlap_rate)
    step = token_limit - overlap
    chunks: list[str] = []
    i = 0
    while i < len(spans):
        # first chunk includes any leading characters; a middle chunk ends
        # at the NEXT window's first token start; the last window (or the
        # max_chunk_limit-th) runs to end of string — reference
        # FixedTokenLengthChunker.java:120-157 offset semantics
        start = 0 if i == 0 else spans[i][0]
        if len(chunks) == max_chunk_limit - 1 or i + token_limit >= len(spans):
            chunks.append(text[start:])
            break
        chunks.append(text[start:spans[i + token_limit][0]])
        i += step
    return chunks


def chunk_delimiter(
    text: str,
    delimiter: str = DEFAULT_DELIMITER,
    max_chunk_limit: int = DEFAULT_MAX_CHUNK_LIMIT,
) -> list[str]:
    if not delimiter:
        raise ValueError("delimiter must be non-empty")
    parts = text.split(delimiter)
    chunks = [p + delimiter for p in parts[:-1]]
    if parts[-1]:
        chunks.append(parts[-1])
    if len(chunks) > max_chunk_limit:
        head = chunks[: max_chunk_limit - 1]
        head.append("".join(chunks[max_chunk_limit - 1:]))
        return head
    return chunks


def chunk_series(
    texts: pd.Series, algorithm: str = "fixed_token_length", **params
) -> pd.Series:
    fn = {"fixed_token_length": chunk_fixed_token_length, "delimiter": chunk_delimiter}[algorithm]
    return texts.map(lambda t: fn(t, **params))


def delimiter_chunk_table(docs, delimiter: str = "\n\n", id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, chunk_idx, chunk_md5, n_chars) — delimiter chunks exploded
    with position; md5 proves exact chunk-text parity vs the oracle."""
    from pyspark.sql import functions as F

    spark_expr, _ = delimiter_chunks_sql(text_col, delimiter)
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.posexplode(F.expr(spark_expr)))
        .select(
            "doc_id",
            F.col("pos").cast("int").alias("chunk_idx"),
            F.md5("col").alias("chunk_md5"),
            F.length("col").cast("long").alias("n_chars"),
        )
    )


def fixed_token_chunk_counts(
    docs,
    token_limit: int = 32,
    overlap_rate: float = 0.25,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: str = DEFAULT_CHUNK_TOKENIZER,
):
    """(doc_id, n_chunks) via the Arrow-batched fixed-token chunker UDF.

    Chunk *texts* carry char-offset semantics only the UDF can express;
    the count obeys a closed form (windows of token_limit stepping
    token_limit - floor(token_limit*overlap_rate)) which the DuckDB
    oracle checks (oracle: fixed_token_chunk_counts_sql). ``tokenizer``
    accepts the registered analyzer names (standard/letter/lowercase/
    whitespace/code/simple), mirroring the reference chunker's
    analysis-registry knob (FixedTokenLengthChunker.java:44-58)."""
    import pandas as pd
    from pyspark.sql import functions as F

    @F.pandas_udf("int")
    def n_chunks(texts: pd.Series) -> pd.Series:
        return chunk_series(
            texts, "fixed_token_length", token_limit=token_limit,
            overlap_rate=overlap_rate, tokenizer=tokenizer,
        ).map(len).astype("int32")

    return docs.select(F.col(id_col).alias("doc_id"), n_chunks(F.col(text_col)).alias("n_chunks"))


def delimiter_chunks_sql(col: str = "text", delimiter: str = "\n\n") -> tuple[str, str]:
    """(spark_expr, duckdb_expr) -> array<string> of delimiter chunks
    (delimiter kept at end; trailing remainder kept; empty tail dropped).

    The delimiter is a LITERAL string on both engines (the reference's
    DelimiterChunker splits on the literal parameter): Spark's
    ``split`` takes a Java regex, so the pattern side is regex-escaped
    — without that, a delimiter like ``" | "`` silently becomes
    alternation on Spark while DuckDB's ``str_split`` stays literal,
    and the two engines chunk differently."""
    import re

    if "\\" in delimiter:
        # Spark SQL string-literal + Java-regex double unescaping makes
        # backslash delimiters engine-divergent; reject rather than
        # chunk differently on the two engines
        raise ValueError("delimiter must not contain a backslash")
    d_sql = delimiter.replace("'", "''").replace("\n", "\\n")
    # regex-literal form for the Spark split() pattern argument only
    # (re.escape's own backslashes then need SQL-literal doubling)
    d_rx = (re.escape(delimiter).replace("\\", "\\\\").replace("'", "''")
            .replace("\n", "\\n"))
    # split, re-append delimiter to all but the last, drop empty tail
    spark = (
        f"filter(transform(split({col}, '{d_rx}', -1), (x, i) -> "
        f"IF(i < size(split({col}, '{d_rx}', -1)) - 1, concat(x, '{d_sql}'), x)), x -> x <> '')"
    )
    # DuckDB plain string literals do NOT interpret \n — use an
    # E'...' escape string so newline delimiters mean newlines there too
    d_duck = f"E'{d_sql}'" if "\n" in delimiter else f"'{d_sql}'"
    duck = (
        f"list_filter(list_transform(str_split({col}, {d_duck}), "
        f"(x, i) -> CASE WHEN i < len(str_split({col}, {d_duck})) THEN x || {d_duck} ELSE x END), "
        f"x -> x <> '')"
    )
    return spark, duck
