"""Hybrid query-spec validation — the reference's query-surface rules.

Mirrors (semantics, not code):
 * max 5 sub-queries, >5 rejected — query/HybridQueryBuilder.java:56,
   173-178 (MAX_NUMBER_OF_SUB_QUERIES)
 * boost unsupported on hybrid — HybridQueryBuilder.java:190-196
 * weights: each in [0,1], sum == 1.0 ± 0.01, count == #sub-queries —
   processor/combination/ScoreCombinationUtil.java:97-140
 * hybrid must be top-level; from != 0 pagination rejected —
   search/query/HybridQueryPhaseSearcher.java:63-66,123-148
"""

from __future__ import annotations

from dataclasses import dataclass, field

MAX_SUBQUERIES = 5
WEIGHT_SUM_TOL = 0.01

# z_score and rrf ship in newer public releases of the plugin than this
# snapshot (see query/hybrid.py docstring); rrf is rank-based and pairs
# with the "rrf" combination only.
NORMALIZATIONS = ("min_max", "l2", "z_score", "rrf")
COMBINATIONS = ("arithmetic_mean", "harmonic_mean", "geometric_mean", "rrf")


class HybridSpecError(ValueError):
    pass


@dataclass
class HybridSpec:
    n_subqueries: int
    normalization: str = "min_max"
    combination: str = "arithmetic_mean"
    weights: list[float] | None = None
    k: int = 10
    from_: int = 0
    boost: float | None = None

    def validate(self) -> "HybridSpec":
        if self.n_subqueries < 1:
            raise HybridSpecError("hybrid query needs at least one sub-query")
        if self.n_subqueries > MAX_SUBQUERIES:
            raise HybridSpecError(
                f"Number of sub-queries exceeds maximum supported by [hybrid] query: {MAX_SUBQUERIES}"
            )
        if self.boost is not None and self.boost != 1.0:
            raise HybridSpecError("[hybrid] query does not support [boost]")
        if self.from_ != 0:
            raise HybridSpecError("In the current release, [from] is not supported in hybrid query")
        if self.normalization not in NORMALIZATIONS:
            raise HybridSpecError(f"unknown normalization technique [{self.normalization}]")
        if self.combination not in COMBINATIONS:
            raise HybridSpecError(f"unknown combination technique [{self.combination}]")
        if self.weights is not None:
            if len(self.weights) != self.n_subqueries:
                raise HybridSpecError(
                    "number of weights must match number of sub-queries in hybrid query"
                )
            for w in self.weights:
                if not (0.0 <= w <= 1.0):
                    raise HybridSpecError("all weights must be in range [0.0 ... 1.0]")
            if abs(sum(self.weights) - 1.0) > WEIGHT_SUM_TOL:
                raise HybridSpecError("sum of all weights must be equal to 1.0")
        return self

    def effective_weights(self) -> list[float]:
        return self.weights if self.weights is not None else [1.0] * self.n_subqueries


def validate_sort_spec(sorts: list[tuple[str, str]], track_scores: bool = False) -> None:
    """Hybrid sort rules [HybridCollectorManager.java:265-293,
    HybridQuerySortIT.java:182-236]: `_score` may not be combined with
    field sorts; directions must be asc/desc; `track_scores` is only
    meaningful with a field sort (scores are implicit otherwise)."""
    if not sorts:
        raise HybridSpecError("sort spec must name at least one sort key")
    fields = [f for f, _ in sorts]
    if "_score" in fields and len(fields) > 1:
        raise HybridSpecError(
            "_score sort cannot be combined with field sorts in hybrid query"
        )
    for f, d in sorts:
        if d not in ("asc", "desc"):
            raise HybridSpecError(f"invalid sort direction [{d}] for [{f}]")
    if track_scores and fields == ["_score"]:
        raise HybridSpecError(
            "track_scores is redundant when sorting by _score"
        )
