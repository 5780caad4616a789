"""Tokenizers — the analyzer layer the reference delegates to Lucene.

Code-aware tokenizer (per BASELINE.json north_star: "code-aware
tokenization and term-frequency extraction via vectorized Arrow/pandas
UDFs"): identifiers/keywords ``[A-Za-z_][A-Za-z0-9_]*`` plus integer
literals, lowercased. Deterministic spec so rank-identity tests are
meaningful (SURVEY.md §7.0).

Everything here operates on pandas Series inside Arrow batches — no
per-row Python in the Spark plan (input_hint).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

CODE_TOKEN_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*|[0-9]+")
# simple analyzer for natural-language-ish text (the driver's `documents`
# table): lowercase, split on non-alphanumeric runs. SQL-expressible so
# the DuckDB oracle can reproduce it exactly.
SIMPLE_SPLIT_RE = "[^a-z0-9]+"


def tokenize_code(texts: pd.Series) -> pd.Series:
    """Series[str] -> Series[list[str]] of lowercased code tokens."""
    return texts.str.findall(CODE_TOKEN_RE).map(lambda toks: [t.lower() for t in toks])


def tokenize_simple(texts: pd.Series) -> pd.Series:
    """Series[str] -> Series[list[str]] — lowercase alnum-run tokens."""
    return (
        texts.str.lower()
        .str.split(SIMPLE_SPLIT_RE, regex=True)
        .map(lambda toks: [t for t in toks if t])
    )


def simple_tokens_sql(col: str = "text") -> tuple[str, str]:
    """(spark_expr, duckdb_expr) producing the same array<string>.

    Spark's split() can emit empty strings at the edges; both sides
    filter them so the arrays match element-for-element.
    """
    spark = f"filter(split(lower({col}), '{SIMPLE_SPLIT_RE}'), x -> x <> '')"
    duck = (
        f"list_filter(regexp_split_to_array(lower({col}), '{SIMPLE_SPLIT_RE}'), x -> x <> '')"
    )
    return spark, duck


def term_freqs(tokens: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """token list -> (unique terms, counts) — used inside index kernels."""
    if not tokens:
        return np.empty(0, dtype=object), np.empty(0, dtype=np.int64)
    arr = np.asarray(tokens, dtype=object)
    terms, counts = np.unique(arr, return_counts=True)
    return terms, counts


def term_freq_frame(texts: pd.Series, doc_ids: pd.Series, tokenizer=tokenize_code) -> pd.DataFrame:
    """Batch of docs -> long frame (doc_id, term, tf, dl).

    ``dl`` is the total token count of the doc (Lucene field length).
    Vectorized: one np.unique over the concatenated token stream with
    doc-boundary offsets, no per-token Python.
    """
    tok_lists = tokenizer(texts)
    lens = tok_lists.map(len).to_numpy(dtype=np.int64)
    n_docs = len(tok_lists)
    if n_docs == 0 or lens.sum() == 0:
        return pd.DataFrame(
            {
                "doc_id": np.empty(0, dtype=np.int64),
                "term": np.empty(0, dtype=object),
                "tf": np.empty(0, dtype=np.int64),
                "dl": np.empty(0, dtype=np.int64),
            }
        )
    flat = np.concatenate([np.asarray(t, dtype=object) for t in tok_lists if t])
    doc_of_token = np.repeat(doc_ids.to_numpy(dtype=np.int64), lens)
    dl_of_token = np.repeat(lens, lens)
    # unique over (doc, term) pairs: sort by (doc, term) then run-length
    order = np.lexsort((flat.astype(str), doc_of_token))
    flat = flat[order]
    doc_of_token = doc_of_token[order]
    dl_of_token = dl_of_token[order]
    new_run = np.r_[True, (doc_of_token[1:] != doc_of_token[:-1]) | (flat[1:] != flat[:-1])]
    starts = np.flatnonzero(new_run)
    tf = np.diff(np.r_[starts, len(flat)])
    return pd.DataFrame(
        {
            "doc_id": doc_of_token[starts],
            "term": flat[starts],
            "tf": tf.astype(np.int64),
            "dl": dl_of_token[starts],
        }
    )
