"""Structured Streaming operators over the events stream.

The reference has no streaming surface (SURVEY.md §2.13 — its ingest is
request-driven batch), so this package covers the engine's own streaming
obligations: event-time windowed aggregation with watermarks and
session-window analysis, written so the SAME transformation runs on a
batch DataFrame (DuckDB-oracle-checkable) and on a readStream source
(tests run it with trigger availableNow and assert batch equivalence).
"""
