"""Sparse (token-weight) linear scoring + the two-phase optimization.

Reference semantics:
 * score(doc) = Σ_{t ∈ q ∩ d} w_q(t) · w_d(t) — a BooleanQuery of SHOULD
   FeatureField linear clauses [query/NeuralSparseQueryBuilder.java:
   363-376]; documents are token→weight maps (`rank_features`).
 * two-phase [processor/NeuralSparseTwoPhaseProcessor.java:127-155,
   212-231]: split query tokens at threshold = max_weight × prune_ratio
   (default 0.4); phase 1 scores only the high-weight tokens (short,
   high-impact postings); the top window_size = k × expansion_rate
   (default 5.0, capped 10000) candidates are then rescored by adding
   the low-weight tokens' contributions. Final scores on the window are
   identical to single-phase scoring
   [NeuralSparseTwoPhaseProcessorIT.java:151-204].

Doc features here are a long DataFrame ``(doc_id, token, weight)`` —
the exploded form of `rank_features` (SURVEY.md §1.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_PRUNE_RATIO = 0.4
DEFAULT_EXPANSION_RATE = 5.0
MAX_WINDOW_SIZE = 10_000


def split_query_tokens(
    query: dict[str, float], prune_ratio: float = DEFAULT_PRUNE_RATIO
) -> tuple[dict[str, float], dict[str, float]]:
    """tokens ≥ max_weight×ratio → phase-1; rest → phase-2.

    Fixture: {a:1.0,b:0.45,c:0.39,d:0.1}, ratio 0.4 → ({a,b},{c,d})
    (FIXTURES.md §3.5).
    """
    if not query:
        return {}, {}
    thr = max(query.values()) * prune_ratio
    hi = {t: w for t, w in query.items() if w >= thr}
    lo = {t: w for t, w in query.items() if w < thr}
    return hi, lo


def sparse_scores(features: DataFrame, query: dict[str, float]) -> DataFrame:
    """(doc_id, score): linear feature scoring for all matching docs."""
    if not query:
        return features.sparkSession.createDataFrame([], "doc_id long, score double")
    qdf = F.create_map(
        *[x for t, w in sorted(query.items()) for x in (F.lit(t), F.lit(float(w)))]
    )
    return (
        features.where(F.col("token").isin(list(query)))
        .withColumn("qw", F.element_at(qdf, F.col("token")))
        .groupBy("doc_id")
        .agg(F.sum(F.col("qw") * F.col("weight")).alias("score"))
    )


def sparse_topk_two_phase(
    features: DataFrame,
    query: dict[str, float],
    k: int = 10,
    prune_ratio: float = DEFAULT_PRUNE_RATIO,
    expansion_rate: float = DEFAULT_EXPANSION_RATE,
    round_to: int | None = None,
) -> DataFrame:
    """Two-phase top-k; rank-equal to single-phase for window ≥ k."""
    from .exhaustive import topk

    hi, lo = split_query_tokens(query, prune_ratio)
    window = min(int(k * expansion_rate), MAX_WINDOW_SIZE)
    phase1 = sparse_scores(features, hi)
    cand = phase1.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(window)
    if lo:
        lo_scores = sparse_scores(features, lo).withColumnRenamed("score", "lo_score")
        cand = (
            cand.join(lo_scores, "doc_id", "left")
            .withColumn("score", F.col("score") + F.coalesce(F.col("lo_score"), F.lit(0.0)))
            .drop("lo_score")
        )
    return topk(cand, k=k, round_to=round_to)


def sparse_topk_single_phase(
    features: DataFrame, query: dict[str, float], k: int = 10, round_to: int | None = None
) -> DataFrame:
    from .exhaustive import topk

    return topk(sparse_scores(features, query), k=k, round_to=round_to)
