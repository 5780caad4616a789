"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's ingest processors are stateless per doc, but a
streaming ingest pipeline needs custom per-key state Spark's built-in
windows can't express: here, a per-user **streaming deduplicating
counter** — each user's state holds the set-digest of content hashes
seen so far (bounded: one 8-byte slot per distinct hash), and every
micro-batch emits the user's running (n_events, n_distinct) counts.
This is the `applyInPandasWithState` pattern the build brief names for
custom stateful operators: state schema + output schema declared, the
per-key callback sees the key's rows as pandas batches, event-time
timeout finalizes idle users.

Batch parity: ``dedup_counts_batch`` computes the same final counts
with a plain aggregate; the stream==batch test pins the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_distinct", T.LongType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("hashes", T.ArrayType(T.LongType())),
    ]
)


def _dedup_fn(key, pdfs, state):
    """Per-user callback: merge this batch's 56-bit content hashes into
    the state's sorted distinct set, emit the running counts. State is
    O(distinct hashes per user) — the per-key analog of the exact-dedup
    groupBy, kept incremental so the stream never reprocesses history."""
    import numpy as np

    if state.hasTimedOut:
        # idle user: emit final counts once more, then drop the state
        (n_events, hashes) = state.get
        state.remove()
        import pandas as pd

        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n_events], "n_distinct": [len(hashes)]}
        )
        return
    n_events, hashes = state.get if state.exists else (0, [])
    seen = np.asarray(hashes, dtype=np.int64)
    for pdf in pdfs:
        n_events += len(pdf)
        batch = pdf["content_hash"].to_numpy(dtype=np.int64)
        seen = np.union1d(seen, batch)  # sorted distinct merge
    state.update((int(n_events), [int(x) for x in seen]))
    state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 24 * 3600 * 1000)
    import pandas as pd

    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n_events], "n_distinct": [len(seen)]}
    )


def _with_hash(events: DataFrame) -> DataFrame:
    from ..pipeline.hashing import hash64_sql

    spark_h, _ = hash64_sql("concat(event_type, ':', CAST(value AS STRING))")
    return events.withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
        "content_hash", F.expr(spark_h)
    )


def streaming_dedup_counts(
    events: DataFrame, with_watermark: str = "2 hours"
) -> DataFrame:
    """Streaming per-user (n_events, n_distinct) via custom state."""
    src = _with_hash(events).withWatermark("ts", with_watermark)
    return (
        # ts stays in the projection — the event-time watermark column
        # must reach the stateful operator for EventTimeTimeout
        src.select("ts", "user_id", "content_hash")
        .groupBy("user_id")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf="EventTimeTimeout",
        )
    )


def dedup_counts_batch(events: DataFrame) -> DataFrame:
    """Batch twin: the final (n_events, n_distinct) per user."""
    return (
        _with_hash(events)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("content_hash").alias("n_distinct"),
        )
    )
