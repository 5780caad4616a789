"""Event-time windowed aggregations — batch/stream dual-mode.

Each builder takes ANY events DataFrame (static or streaming) with
``(ts timestamp, user_id long, event_type string, value double)`` and
returns the transformed frame. On a streaming input add
``with_watermark=...`` so state can be bounded and late rows beyond the
watermark dropped; on batch input the same plan computes the exact
answer the DuckDB oracle checks (oracle.events_*_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WINDOW = "1 day"
DEFAULT_WATERMARK = "2 hours"
DEFAULT_SESSION_GAP = "12 hours"


def windowed_event_agg(
    events: DataFrame,
    window: str = DEFAULT_WINDOW,
    with_watermark: str | None = None,
    round_to: int = 4,
) -> DataFrame:
    """(window_start, event_type, n, sum_value): tumbling event-time
    windows. Spark's window() aligns tumbling windows to the epoch, so a
    '1 day' window start == date_trunc('day', ts) — the oracle relation."""
    # NTZ → LTZ (session TZ is UTC): watermarks/event-time require TIMESTAMP
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if with_watermark:
        src = src.withWatermark("ts", with_watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), round_to).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sessionized_user_stats(
    events: DataFrame,
    gap: str = DEFAULT_SESSION_GAP,
    with_watermark: str | None = None,
) -> DataFrame:
    """(user_id, n_sessions, n_events): session windows per user — a new
    session starts when the user is idle longer than ``gap``
    (F.session_window; streaming state is per (user, open session))."""
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if with_watermark:
        src = src.withWatermark("ts", with_watermark)
    sessions = src.groupBy(
        F.session_window("ts", gap).alias("sw"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_ev"))
    return sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"), F.sum("n_ev").alias("n_events")
    )


def run_stream_available_now(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
):
    """Drain a streaming transformation into an in-memory table with
    trigger availableNow; returns the StreamingQuery (await it, then read
    ``spark.table(query_name)``)."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
