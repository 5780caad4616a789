"""Filter semantics around scoring — the reference's two filter slots.

* ``filtered_scores``: filters are AND-ed into every sub-query as
  non-scoring FILTER clauses [query/HybridQuery.java:48-59] — they
  restrict *which docs match* but do NOT change collection statistics
  (Lucene idf/avgdl come from the whole index, not the filtered subset).
  Spark shape: score with global stats, semi-join the predicate-matching
  doc set; the predicate is a plain DataFrame filter on the docs scan, so
  Catalyst pushes it into the parquet read (PushedFilters).

* ``post_filter``: applied AFTER scoring/normalization, does not affect
  scores or the top-k window composition
  [search/query/HybridCollectorManager.java:91-102,121-127, exercised by
  HybridQueryPostFilterIT.java] — Spark shape: inner join of the scored
  result with the predicate doc set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def filtered_scores(scores: DataFrame, docs: DataFrame, predicate: Column) -> DataFrame:
    """Keep scored rows whose doc satisfies ``predicate`` (scores computed
    against global stats — matching FILTER-occur semantics)."""
    keep = docs.where(predicate).select("doc_id")
    return scores.join(keep, "doc_id")


def post_filter(scored: DataFrame, docs: DataFrame, predicate: Column) -> DataFrame:
    """Reference post_filter: prune the final hit list without rescoring."""
    keep = docs.where(predicate).select("doc_id")
    return scored.join(keep, "doc_id")
