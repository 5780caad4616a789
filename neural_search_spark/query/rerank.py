"""Rerankers (response processors).

 * by_field: replace _score with a document field's value, re-sort desc,
   optionally keep the previous score
   [processor/rerank/ByFieldRerankProcessor.java:69-189]
 * rescore-style: generic re-score of the final hit window with any
   scoring DataFrame, stable desc re-sort
   [processor/rerank/RescoringRerankProcessor.java:23-119]
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def by_field_rerank(
    hits: DataFrame,
    docs: DataFrame,
    target_field: str,
    id_col: str = "doc_id",
    keep_previous_score: bool = False,
    remove_target_field: bool = False,
    k: int | None = None,
) -> DataFrame:
    """hits(doc_id, score) × docs(doc_id, <fields>) → re-ranked by field.

    ``remove_target_field`` drops the consumed field from the output
    hits, ``keep_previous_score`` carries the pre-rerank score — the
    reference's two processor options
    (ByFieldRerankProcessor.java:69-189)."""
    side = docs.select(F.col(id_col).alias("doc_id"), F.col(target_field).alias("_new_score"))
    out = hits.join(side, "doc_id")
    if keep_previous_score:
        out = out.withColumn("previous_score", F.col("score"))
    out = out.withColumn("score", F.col("_new_score").cast("double")).drop("_new_score")
    if remove_target_field and target_field in out.columns:
        out = out.drop(target_field)
    out = out.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return out.limit(k) if k else out


def rescore(
    hits: DataFrame,
    scorer: DataFrame,
    weight_original: float = 0.0,
    weight_rescore: float = 1.0,
    k: int | None = None,
) -> DataFrame:
    """Combine original window scores with a rescorer's (doc_id, score)."""
    s = scorer.select("doc_id", F.col("score").alias("_rs"))
    out = (
        hits.join(s, "doc_id", "left")
        .withColumn(
            "score",
            F.lit(weight_original) * F.col("score")
            + F.lit(weight_rescore) * F.coalesce(F.col("_rs"), F.lit(0.0)),
        )
        .drop("_rs")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
    )
    return out.limit(k) if k else out


def cross_encoder_rerank(
    hits: DataFrame,
    docs: DataFrame,
    query_terms: list[str],
    k: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-encoder rerank slot [processor/rerank/
    MLOpenSearchRerankProcessor.java:23-83]: scores each (query, doc)
    PAIR jointly and REPLACES the window's scores, then re-sorts desc.

    The model is a deterministic stand-in (same pattern as
    operators/encoders.py): score = |q ∩ d| / sqrt(|q| · |d_distinct|)
    — the binary-token-cosine of the pair, a genuinely joint function
    of query and document that a bi-encoder cannot express. Swap in a
    real cross-encoder by replacing the score expression with an
    Arrow-batched pandas UDF over (query, text) pairs; the window
    plumbing (score only the top-k window, never the corpus —
    broadcast semi-join) is the production shape.
    """
    from ..functions.tokenize import simple_tokens_sql

    q = sorted(set(query_terms))
    spark_toks, _ = simple_tokens_sql(text_col)
    qlist = ", ".join("'" + t.replace("'", "''") + "'" for t in q)
    window_docs = docs.join(F.broadcast(hits.select(id_col)), id_col)
    scored = window_docs.select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"array_distinct({spark_toks})").alias("dtoks"),
    ).select(
        "doc_id",
        F.round(
            F.expr(f"size(filter(dtoks, t -> t IN ({qlist})))")
            / F.sqrt(F.lit(float(len(q))) * F.expr("size(dtoks)")),
            4,
        ).alias("score"),
    )
    out = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return out.limit(k) if k else out
