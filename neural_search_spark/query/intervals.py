"""The ``intervals`` query — minimal-interval semantics.

Lucene's intervals framework (the modern positional surface; the
`intervals` query type in OpenSearch) implements the Clarke–Cormack
minimal-interval algebra: an interval matches iff NO proper
sub-interval also matches. That is a genuinely different enumeration
from the span iterators (query/spans.py), which emit one stretch per
first-clause position and allow nested overlaps:

* ordered ``match`` (n terms): chain each term to its least position
  after the running end (per first-term position), then keep only
  intervals that contain no smaller chain — with a monotone chain end
  this is exactly "per distinct end keep the latest start". The
  ``max_gaps`` filter applies to the MINIMIZED stream (Lucene wraps
  the minimal iterator in the gaps filter), with total gap
  ``e - a - (n-1)``; ``max_gaps = -1`` means unbounded.
* unordered ``match`` (2 terms): an interval (q, p) is minimal iff q
  is the tagged position immediately preceding p AND carries the other
  term — if the immediately preceding tagged position were the same
  term, a smaller interval would nest inside.
* ``any_of`` over single terms: every occurrence is its own length-1
  minimal interval.

Scoring follows the IntervalScorer accumulation: each minimal interval
contributes ``1 / (interval token length)`` — a single token
contributes 1.0 (so an exact one-term intervals query accumulates
freq = tf, unlike span_term's 1/2) — and the document scores
``idf_total x BM25-tf-norm`` over the float freq, sharing
query/spans.py's scorer with ``mlen = end - start`` (token length - 1,
so ``1/(1+mlen)`` is the per-interval contribution).

Dataflow mirrors spans.py: one posexplode filtered to the query terms,
per-doc windows, no UDF. The minimality cut is one more per-(doc, end)
window over the already-small chain frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .bm25 import B, K1
from .exhaustive import tokenized
from .spans import MAX_ORDERED_CLAUSES, _clause_map, _pos_frame, _score_matches

__all__ = ["interval_scores"]


def _minimal_ordered(pos: DataFrame, n: int, max_gaps: int) -> DataFrame:
    """Chain per first-term position (monotone, like spans), then the
    minimality cut: per (doc, end) keep the latest start. Gaps filter
    AFTER minimization — the Lucene wrapping order."""
    cur = pos.where(F.col("c") == 0).select(
        "doc_id", "dl", F.col("p").alias("a"), F.col("p").alias("e")
    )
    for i in range(1, n):
        chain = cur.select(
            "doc_id", "dl", "a", F.col("e").alias("k"),
            F.lit(1).alias("is_chain"),
        )
        nxt = pos.where(F.col("c") == i).select(
            "doc_id",
            F.lit(None).cast("int").alias("dl"),
            F.lit(None).cast("int").alias("a"),
            F.col("p").alias("k"),
            F.lit(0).alias("is_chain"),
        )
        wf = (
            Window.partitionBy("doc_id")
            .orderBy(F.col("k").asc(), F.col("is_chain").asc())
            .rowsBetween(1, Window.unboundedFollowing)
        )
        cur = (
            chain.unionByName(nxt)
            .withColumn(
                "e2",
                F.min(F.when(F.col("is_chain") == 0, F.col("k"))).over(wf),
            )
            .where((F.col("is_chain") == 1) & F.col("e2").isNotNull())
            .select("doc_id", "dl", "a", F.col("e2").alias("e"))
        )
    wm = Window.partitionBy("doc_id", "e").orderBy(F.col("a").desc())
    out = (
        cur.withColumn("rn", F.row_number().over(wm))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    if max_gaps >= 0:
        out = out.where(F.col("e") - F.col("a") - F.lit(n - 1)
                        <= F.lit(max_gaps))
    return out.select("doc_id", "dl", (F.col("e") - F.col("a")).alias("mlen"))


def _minimal_unordered(pos: DataFrame, max_gaps: int) -> DataFrame:
    """Two terms: minimal intervals are adjacent different-term pairs
    in the tagged position stream."""
    w = Window.partitionBy("doc_id").orderBy(F.col("p").asc())
    out = (
        pos.withColumn("prev_p", F.lag("p").over(w))
        .withColumn("prev_c", F.lag("c").over(w))
        .where(F.col("prev_c").isNotNull() & (F.col("prev_c") != F.col("c")))
    )
    if max_gaps >= 0:
        out = out.where(F.col("p") - F.col("prev_p") - 1 <= F.lit(max_gaps))
    return out.select("doc_id", "dl",
                      (F.col("p") - F.col("prev_p")).alias("mlen"))


def interval_scores(
    docs: DataFrame,
    clause_terms: list[list[str]],
    max_gaps: int = -1,
    ordered: bool = False,
    analyzer: str = "simple",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    quantize: bool = True,
    round_to: int | None = None,
) -> DataFrame:
    """(doc_id, score) for an intervals source: a ``match`` query is
    one single-term clause per token (position order preserved for
    ordered=true); ``any_of`` over terms is ONE clause whose position
    set is their union (every occurrence a length-1 interval)."""
    n = len(clause_terms)
    if n == 0:
        raise ValueError("intervals needs >= 1 clause")
    if ordered and n > MAX_ORDERED_CLAUSES:
        raise ValueError(
            f"ordered intervals supports at most {MAX_ORDERED_CLAUSES} "
            f"terms, got {n}")
    if not ordered and n > 2:
        raise ValueError("unordered intervals supports at most 2 terms")
    if max_gaps < -1:
        raise ValueError(f"max_gaps must be >= -1, got {max_gaps}")
    term_clause = _clause_map(clause_terms)
    tok = tokenized(docs, id_col, text_col, analyzer)
    pos = _pos_frame(tok, term_clause)
    if n == 1:
        matches = pos.select("doc_id", "dl", F.lit(0).alias("mlen"))
    elif ordered:
        matches = _minimal_ordered(pos, n, max_gaps)
    else:
        matches = _minimal_unordered(pos, max_gaps)
    return _score_matches(tok, matches, sorted(term_clause), k1, b,
                          quantize, round_to)
