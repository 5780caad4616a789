"""Training-data pipeline operators (dedup, similarity, text analysis,
multimodal plumbing) — the operations a 100 TB training-data pipeline
needs beyond the reference's retrieval surface.

Every operator is expressed Spark-first (DataFrame ops, broadcast joins,
salted/banded candidate generation) with a DuckDB oracle twin generated
from the same expression builders (see ``pipeline/oracle.py``), so the
driver's side-by-side hash compare exercises the real semantics.
"""
