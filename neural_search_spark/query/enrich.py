"""Query enrichment: default model-id injection + hybrid placement rules.

Mirrors (semantics, not code):
 * NeuralQueryEnricherProcessor — a search-request processor holding a
   ``default_model_id`` plus a per-field ``neural_field_default_id``
   map; it walks the query tree and fills in the model id on any
   neural / neural_sparse clause that doesn't set one
   (processor/NeuralQueryEnricherProcessor.java:29-105).
 * NeuralSearchQueryVisitor — the tree walk itself: visit a clause,
   recurse into compound children
   (query/visitor/NeuralSearchQueryVisitor.java:21-60).
 * HybridQueryPhaseSearcher validation — hybrid must be the TOP-LEVEL
   query; hybrid nested inside bool/nested/compound clauses is
   rejected (search/query/HybridQueryPhaseSearcher.java:63-66). One
   level of ``nested`` wrapping is unwrapped before the check
   (the reference tolerates the index-mapping-induced nested wrapper).

Queries are plain dicts — the engine's logical query model:
``{"type": "neural", "field": ..., "model_id": ...}``,
``{"type": "bool", "must": [...], "should": [...], ...}``,
``{"type": "hybrid", "queries": [...]}``, etc. Driver-side config
plumbing: O(query size), no Spark involvement.
"""

from __future__ import annotations

from typing import Any

from .spec import HybridSpecError

NEURAL_TYPES = ("neural", "neural_sparse")
_CHILD_LIST_KEYS = ("must", "must_not", "should", "filter", "queries")
_CHILD_KEYS = ("query",)


def visit_queries(query: dict[str, Any], fn) -> None:
    """Depth-first visitor over a query tree (NeuralSearchQueryVisitor
    analog): ``fn`` sees every clause dict, parents before children."""
    fn(query)
    for key in _CHILD_LIST_KEYS:
        for child in query.get(key) or []:
            visit_queries(child, fn)
    for key in _CHILD_KEYS:
        child = query.get(key)
        if isinstance(child, dict):
            visit_queries(child, fn)


def enrich_model_ids(
    query: dict[str, Any],
    default_model_id: str | None = None,
    neural_field_default_id: dict[str, str] | None = None,
) -> dict[str, Any]:
    """Fill missing model ids on neural clauses, field-specific defaults
    winning over the global default — in place AND returned
    (NeuralQueryEnricherProcessor.java:29-105 precedence). A missing
    query body is a no-op (NeuralQueryEnricherProcessorTests.java:49);
    a non-string default id is a config error (:32)."""
    if default_model_id is not None and not isinstance(default_model_id, str):
        raise HybridSpecError(
            f"default_model_id must be a string, got {type(default_model_id).__name__}"
        )
    if query is None:
        return query
    field_map = neural_field_default_id or {}

    def fill(clause: dict[str, Any]) -> None:
        if clause.get("type") in NEURAL_TYPES and not clause.get("model_id"):
            fld = clause.get("field")
            if fld in field_map:
                clause["model_id"] = field_map[fld]
            elif default_model_id is not None:
                clause["model_id"] = default_model_id

    visit_queries(query, fill)
    return query


def validate_hybrid_placement(query: dict[str, Any]) -> None:
    """Reject hybrid anywhere but the top level
    (HybridQueryPhaseSearcher.java:63-66); a single top-level ``nested``
    wrapper is unwrapped first."""
    top = query
    if top.get("type") == "nested" and isinstance(top.get("query"), dict):
        top = top["query"]

    def check_no_hybrid(clause: dict[str, Any]) -> None:
        if clause.get("type") == "hybrid":
            raise HybridSpecError(
                "hybrid query must be a top-level query and cannot be wrapped into other queries"
            )

    # below the (possibly unwrapped) top clause, no hybrid may appear —
    # including inside the top-level hybrid's own sub-queries
    for key in _CHILD_LIST_KEYS:
        for child in top.get(key) or []:
            visit_queries(child, check_no_hybrid)
    for key in _CHILD_KEYS:
        child = top.get(key)
        if isinstance(child, dict):
            visit_queries(child, check_no_hybrid)
