"""Snippet highlighting over BM25 top-k results.

Lucene/OpenSearch analog: the ``highlight`` request block — for each
hit, return a fragment of the field centered on a query-term match
(unified highlighter, fragment_size in tokens here rather than chars).
Deterministic convention (mirrored by the DuckDB oracle): the snippet
window centers on the FIRST occurrence of any query term in the
analyzed token stream (the minimum 1-based ``array_position`` over the
query terms), spanning ``window`` tokens either side.

Everything is JVM-side whole-stage codegen: ``array_position`` /
``least`` / ``slice`` / ``concat_ws`` on the already-tokenized column —
no UDF, no second corpus pass (the snippet projects from the same
``tokenized()`` frame that scoring reads). At cluster scale the
snippet evaluation touches only the k joined winners, not the corpus:
the join prunes before the projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .exhaustive import bm25_scores, tokenized, topk


def highlight_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    window: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    hits: DataFrame | None = None,
    tokenizer: str = "simple",
) -> DataFrame:
    """(doc_id, score, rank, snippet) for the BM25 top-k of an OR
    query — or, with ``hits``, snippets for someone else's top-k frame
    (a phrase/bool/indexed result): the snippet window still centers on
    the first occurrence of any of ``terms``. Ranks cut on the rounded
    score (cross-engine tie rule, same as query/multiterm.py)."""
    uniq = sorted(set(terms))
    # tokenizer = the analyzer that produced `hits` (the index's own on
    # the indexed path) so snippets window the hits' own token stream
    tok = tokenized(docs, id_col, text_col, tokenizer=tokenizer)
    if hits is not None:
        top = hits.select("doc_id", "score", "rank")
    else:
        scored = bm25_scores(docs, uniq, id_col, text_col, round_to=4, tok=tok)
        top = topk(scored, k=k, round_to=None)
    positions = [
        F.nullif(F.array_position(F.col("toks"), F.lit(t)), F.lit(0)) for t in uniq
    ]
    # F.least requires >= 2 columns; a single-term query is its own min
    first_pos = F.least(*positions) if len(positions) > 1 else positions[0]
    start = F.greatest(F.lit(1), first_pos - F.lit(window))
    snippet = F.concat_ws(" ", F.slice(F.col("toks"), start, 2 * window + 1))
    return (
        top.join(tok.select("doc_id", "toks"), "doc_id")
        .withColumn("snippet", snippet)
        .select("doc_id", "score", "rank", "snippet")
    )
