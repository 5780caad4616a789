"""Hybrid score normalization + combination (the reference's core layer).

Operates on a long DataFrame of per-sub-query scores
``(subquery_idx:int, doc_id:long, score:double)`` — the Spark analog of
``CompoundTopDocs`` (processor/CompoundTopDocs.java:33-107): what the
reference serializes per shard with magic-number delimiters is here just
rows; shard boundaries are partitions and need no special handling
because normalization statistics are **global aggregates per sub-query**
(the reference iterates all shards: MinMaxScoreNormalizationTechnique
.java:66-106, L2ScoreNormalizationTechnique.java:53-89 — SURVEY.md
§7.6.6 calls out that per-partition stats would be wrong).

Semantics reproduced exactly:
 * min_max — n=(s-min)/(max-min); max==min==s → 1.0
   (SINGLE_RESULT_SCORE); n==0.0 → 0.001 (MIN_SCORE)
   [MinMaxScoreNormalizationTechnique.java:23-116]
 * l2 — n = s/sqrt(Σ s²) over ALL retained hits of the sub-query;
   zero norm → 0.0 [L2ScoreNormalizationTechnique.java:21-90]
 * arithmetic_mean — Σwᵢsᵢ/Σwᵢ where *missing* sub-query scores are
   zero-filled and keep their weight in the denominator; only s<0 is
   skipped [ScoreCombiner.java:265-279,
   ArithmeticMeanScoreCombinationTechnique.java:38-56]. With
   non-negative normalized scores this is sum(w·s)/Σ_all w.
 * harmonic_mean — Σw/Σ(w/s) over s>0 [Harmonic...java:38-53]
 * geometric_mean — exp(Σw·ln s/Σw) over s>0 [Geometric...java:40-56]
 * final ranking: combined desc, doc_id asc, truncate k; one row per
   doc (set-union of sub-query matches) [ScoreCombiner.java:34-321]
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .spec import HybridSpec

MIN_SCORE = 0.001
SINGLE_RESULT_SCORE = 1.0


def normalize(scores: DataFrame, technique: str = "min_max") -> DataFrame:
    """Add ``nscore`` per (subquery_idx, doc_id); stats are global per
    sub-query (broadcast-joined back — tiny: one row per sub-query)."""
    if technique == "min_max":
        stats = scores.groupBy("subquery_idx").agg(
            F.min("score").alias("mn"), F.max("score").alias("mx")
        )
        out = scores.join(F.broadcast(stats), "subquery_idx")
        raw = (F.col("score") - F.col("mn")) / (F.col("mx") - F.col("mn"))
        nscore = (
            F.when(F.col("mx") == F.col("mn"), F.lit(SINGLE_RESULT_SCORE))
            .when(raw == 0.0, F.lit(MIN_SCORE))
            .otherwise(raw)
        )
        return out.withColumn("nscore", nscore).drop("mn", "mx")
    if technique == "l2":
        stats = scores.groupBy("subquery_idx").agg(
            F.sqrt(F.sum(F.col("score") * F.col("score"))).alias("nrm")
        )
        out = scores.join(F.broadcast(stats), "subquery_idx")
        nscore = F.when(F.col("nrm") == 0.0, F.lit(0.0)).otherwise(F.col("score") / F.col("nrm"))
        return out.withColumn("nscore", nscore).drop("nrm")
    raise ValueError(f"unknown normalization technique [{technique}]")


def combine(
    normalized: DataFrame,
    technique: str = "arithmetic_mean",
    weights: list[float] | None = None,
    n_subqueries: int | None = None,
) -> DataFrame:
    """(doc_id, score): weighted combination across sub-queries."""
    if n_subqueries is None:
        n_subqueries = normalized.agg(F.max("subquery_idx")).collect()[0][0] + 1
    w = weights if weights is not None else [1.0] * n_subqueries
    wmap = F.element_at(
        F.array(*[F.lit(float(x)) for x in w]), F.col("subquery_idx").cast("int") + 1
    )
    df = normalized.withColumn("w", wmap)
    pos = df.where(F.col("nscore") > 0.0)
    if technique == "arithmetic_mean":
        total_w = float(sum(w))
        # zero-filled missing scores keep their weight in the denominator
        return (
            df.where(F.col("nscore") >= 0.0)
            .groupBy("doc_id")
            .agg((F.sum(F.col("w") * F.col("nscore")) / F.lit(total_w)).alias("score"))
        )
    if technique == "harmonic_mean":
        return pos.groupBy("doc_id").agg(
            (F.sum("w") / F.sum(F.col("w") / F.col("nscore"))).alias("score")
        )
    if technique == "geometric_mean":
        return pos.groupBy("doc_id").agg(
            F.exp(F.sum(F.col("w") * F.log(F.col("nscore"))) / F.sum("w")).alias("score")
        )
    raise ValueError(f"unknown combination technique [{technique}]")


def hybrid_search(
    subqueries: list[DataFrame],
    normalization: str = "min_max",
    combination: str = "arithmetic_mean",
    weights: list[float] | None = None,
    k: int = 10,
    round_to: int | None = None,
) -> DataFrame:
    """Full hybrid pipeline over per-sub-query score DataFrames
    (each ``(doc_id, score)``) → top-k ``(doc_id, score, rank)``."""
    spec = HybridSpec(
        n_subqueries=len(subqueries),
        normalization=normalization,
        combination=combination,
        weights=weights,
        k=k,
    ).validate()
    tagged = None
    for i, sq in enumerate(subqueries):
        t = sq.select(F.lit(i).alias("subquery_idx"), "doc_id", "score")
        tagged = t if tagged is None else tagged.unionByName(t)
    normed = normalize(tagged, spec.normalization)
    combined = combine(normed, spec.combination, spec.effective_weights(), len(subqueries))
    from .exhaustive import topk

    return topk(combined, k=spec.k, round_to=round_to)
