"""search_after keyset pagination + sort validation.

Reference: PagingFieldCollector filters hits against the after-tuple
[search/collector/PagingFieldCollector.java:21-98]; sort-field merges
tiebreak on doc id [search/query/HybridQueryFieldDocComparator.java];
from != 0 is rejected for hybrid [HybridQueryPhaseSearcher.java:63-66].

Keyset predicate for ORDER BY score DESC, doc_id ASC:
    (score < after_score) OR (score == after_score AND doc_id > after_id)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def search_after(
    scores: DataFrame,
    after_score: float,
    after_doc_id: int,
    k: int = 10,
) -> DataFrame:
    """Next page of (score desc, doc_id asc) after the given tuple."""
    pred = (F.col("score") < F.lit(after_score)) | (
        (F.col("score") == F.lit(after_score)) & (F.col("doc_id") > F.lit(after_doc_id))
    )
    return (
        scores.where(pred)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def search_after_frame(
    scores: DataFrame,
    after: DataFrame,
    k: int = 10,
) -> DataFrame:
    """:func:`search_after` with the after-tuple as a 1-row frame
    (columns ``after_score``, ``after_doc_id``) instead of driver-side
    scalars — the tuple rides as a broadcast, so chained pagination
    (page N's tail feeding page N+1) stays entirely on executors. The
    scalar form remains for the protocol case where the client supplies
    the tuple."""
    pred = (F.col("score") < F.col("after_score")) | (
        (F.col("score") == F.col("after_score"))
        & (F.col("doc_id") > F.col("after_doc_id"))
    )
    return (
        scores.crossJoin(F.broadcast(after))
        .where(pred)
        .drop("after_score", "after_doc_id")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def search_after_fields(
    df: DataFrame,
    sort_cols: list[tuple[str, str]],
    after_values: list,
    after_doc_id: int,
    k: int = 10,
) -> DataFrame:
    """Keyset page after a field-sort tuple (PagingFieldCollector
    semantics: strictly-after in the lexicographic sort order, doc_id
    as the final ascending tiebreak)."""
    assert len(sort_cols) == len(after_values)
    strict = None
    for i, (c, d) in enumerate(sort_cols):
        later = (
            F.col(c) < F.lit(after_values[i])
            if d.lower() == "desc"
            else F.col(c) > F.lit(after_values[i])
        )
        eq_prefix = F.lit(True)
        for j in range(i):
            eq_prefix = eq_prefix & (F.col(sort_cols[j][0]) == F.lit(after_values[j]))
        clause = eq_prefix & later
        strict = clause if strict is None else (strict | clause)
    all_eq = F.lit(True)
    for i, (c, _) in enumerate(sort_cols):
        all_eq = all_eq & (F.col(c) == F.lit(after_values[i]))
    pred = strict | (all_eq & (F.col("doc_id") > F.lit(after_doc_id)))
    return sort_by_fields(df.where(pred), sort_cols, k)


def sort_by_fields(
    scores_with_fields: DataFrame,
    sort_cols: list[tuple[str, str]],
    k: int = 10,
) -> DataFrame:
    """ORDER BY arbitrary fields (asc|desc) with doc_id tiebreak —
    Catalyst TakeOrderedAndProject (the index-sort early-termination
    analog, SURVEY.md §4.2)."""
    order = [
        (F.col(c).desc() if d.lower() == "desc" else F.col(c).asc()) for c, d in sort_cols
    ] + [F.col("doc_id").asc()]
    return scores_with_fields.orderBy(*order).limit(k)


def field_collapse(scores, docs, collapse_field: str, k: int = 10, id_col: str = "doc_id"):
    """Field collapsing: keep only the best hit per ``collapse_field``
    value, then top-k of the collapsed set. The reference carries
    collapse field/values through its processor pipeline
    (processor/rerank/RescoringRerankProcessor.java:87-88 preserves
    them across rescoring) — here the collapse itself is one window
    per group (partial top-1 per partition, no extra shuffle beyond
    the group key) + a TakeOrderedAndProject."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    joined = scores.join(docs.select(id_col, collapse_field), id_col)
    w = Window.partitionBy(collapse_field).orderBy(
        F.round("score", 4).desc(), F.col(id_col).asc()
    )
    best = joined.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).drop("rn")
    return (
        best.orderBy(F.round("score", 4).desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, collapse_field, F.round("score", 4).alias("score"))
    )
