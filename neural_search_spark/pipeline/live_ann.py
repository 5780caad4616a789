"""Live (streaming) vector index: micro-batch → graph growth.

The dense mirror of ``index/live.py``. The reference's engine ingests
vectors through the same Lucene write path as text: each refresh makes
new vectors searchable, and the k-NN graph grows with the segment
(Lucene HNSW appends to the in-progress segment graph; merges rebuild).
Re-expressed for Structured Streaming over the persisted-graph tier:

* ``append_vector_batch``: write one micro-batch of vectors under
  ``vectors/ingest_batch=K`` (dynamic partition overwrite — a retried
  batch replaces exactly its own partition, the exactly-once contract
  of foreachBatch's stable batch ids), then grow the stored graph with
  ``hnsw_append`` over the full vector table into a NEW versioned
  directory and flip a one-line manifest via ``os.replace`` — a single
  atomic step, so a crash at ANY point leaves the manifest pointing at
  the previous complete graph (same discipline as index/live.py's
  manifest swap).
* ``streaming_vector_ingest``: readStream → foreachBatch(append) —
  after the stream drains, the stored graph is BIT-IDENTICAL to a
  from-scratch ``hnsw_build_frame`` over everything ingested
  (hnsw_append's pinned invariant), so serving quality never depends
  on the batching.

Idempotency of the graph step comes free from that invariant: a retry
sees vectors it already inserted, finds zero new rows per segment, and
rewrites the same bytes.

Scale shape: per batch the graph kernel inserts only the new vectors
(O(|new|·ef_construction·M·log n) per segment), but the swap rewrites
the whole graph frame — the growable-single-graph trade-off. Lucene's
own answer at scale is batch-as-new-segment + periodic merge (exactly
what ``index/live.py`` does for postings); with ``pmod`` segment
assignment every batch touches every segment, so this module keeps the
single-graph shape and documents the rewrite as the compaction cost.

Reference: query/NeuralQueryBuilder.java:300-325 (graph searched at
query time, built/grown at index time by the k-NN engine).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .graph_ann import (
    DEFAULT_EF_CONSTRUCTION,
    DEFAULT_M,
    DEFAULT_SEGMENTS,
    hnsw_append,
    hnsw_build_frame,
)


def _vectors_dir(store_dir: str) -> str:
    return os.path.join(store_dir, "vectors")


def _manifest_path(store_dir: str) -> str:
    return os.path.join(store_dir, "graph_manifest.json")


def _gc_stale_versions(store_dir: str, prefix: str, keep_name: str) -> None:
    """Remove every versioned dir that is not the manifest's current
    target. A crash between the manifest flip and the old version's
    delete used to orphan that directory forever (later batches only
    removed their OWN name) — sweeping against the manifest, the single
    source of truth, is idempotent and never touches the live target."""
    for name in os.listdir(store_dir):
        if name.startswith(prefix) and name != keep_name:
            path = os.path.join(store_dir, name)
            if os.path.isdir(path):
                shutil.rmtree(path, ignore_errors=True)


def _manifest(store_dir: str) -> dict | None:
    p = _manifest_path(store_dir)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def _graph_dir(store_dir: str) -> str | None:
    """Current graph directory per the manifest; None before the first
    batch lands."""
    m = _manifest(store_dir)
    return None if m is None else os.path.join(store_dir, m["current"])


def _on_disk_batches(data_dir: str) -> list[int]:
    """ingest_batch partition values present on disk (filesystem
    listing — no Spark job). Used to adopt a legacy store's batches
    into the commit gate."""
    out = []
    if os.path.isdir(data_dir):
        for name in os.listdir(data_dir):
            if name.startswith("ingest_batch="):
                out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def adopt_legacy_batches(
    committed: list[int] | None, manifest: dict | None, data_dir: str
) -> list[int]:
    """Committed batch ids, adopting every on-disk batch when the
    manifest predates the commit gate (legacy = all committed). Shared
    by the vector and dedup stores so their crash-recovery behavior
    cannot diverge."""
    if committed is None and manifest is not None:
        return _on_disk_batches(data_dir)
    return committed or []


def _committed(store_dir: str) -> list[int] | None:
    """Batch ids the manifest has committed — the SERVING view filter.
    A crashed batch's vector partition lands before its graph flips;
    gating reads on the manifest's committed list keeps the whole store
    view atomic at the one commit point (kill-tested,
    tests/test_crash_safety.py). A manifest WITHOUT the key (written
    before the commit gate existed) means everything on disk was
    committed — returning [] there would silently hide every prior
    batch, so legacy manifests map to None (read-everything)."""
    m = _manifest(store_dir)
    if m is None or "committed" not in m:
        return None
    return [int(x) for x in m["committed"]]


def read_live_vectors(
    spark: SparkSession, store_dir: str, _plus_batch: int | None = None
) -> DataFrame:
    df = spark.read.parquet(_vectors_dir(store_dir))
    committed = _committed(store_dir)
    if committed is None and _manifest(store_dir) is not None:
        # legacy store (manifest predates the commit gate): everything
        # on disk is committed — filtering would hide prior batches
        return df.drop("ingest_batch")
    if committed is not None or _plus_batch is not None:
        batches = set(committed or [])
        if _plus_batch is not None:
            batches.add(int(_plus_batch))
        df = df.where(F.col("ingest_batch").isin(sorted(batches)))
    return df.drop("ingest_batch")


def read_live_graph(spark: SparkSession, store_dir: str) -> DataFrame:
    gdir = _graph_dir(store_dir)
    if gdir is None:
        raise FileNotFoundError(f"no graph manifest under {store_dir}")
    return spark.read.parquet(gdir)


def append_vector_batch(
    spark: SparkSession,
    batch: DataFrame,
    store_dir: str,
    batch_id: int,
    m: int = DEFAULT_M,
    ef_construction: int = DEFAULT_EF_CONSTRUCTION,
    n_segments: int = DEFAULT_SEGMENTS,
    layered: bool = False,
) -> None:
    """Persist one micro-batch of (vec_id, embedding) rows and grow the
    stored graph. Idempotent per ``batch_id``."""
    vdir = _vectors_dir(store_dir)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            batch.withColumn("ingest_batch", F.lit(int(batch_id)))
            .write.partitionBy("ingest_batch")
            .mode("overwrite")
            .parquet(vdir)
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    emb = read_live_vectors(spark, store_dir, _plus_batch=int(batch_id))
    prev_dir = _graph_dir(store_dir)
    if prev_dir is not None:
        grown = hnsw_append(
            emb,
            spark.read.parquet(prev_dir),
            m=m,
            ef_construction=ef_construction,
            n_segments=n_segments,
        )
    else:
        grown = hnsw_build_frame(
            emb,
            m=m,
            ef_construction=ef_construction,
            n_segments=n_segments,
            layered=layered,
        )
    # versioned write + atomic manifest flip: the ONLY commit point is
    # the os.replace of the one-line manifest — a crash before it
    # leaves the previous manifest (and graph) fully intact; a crash
    # after it leaves a complete new graph. No rename window in which
    # neither graph exists.
    new_name = f"graph.v{int(batch_id)}"
    new_dir = os.path.join(store_dir, new_name)
    if prev_dir is not None and os.path.abspath(new_dir) == os.path.abspath(prev_dir):
        # retried batch whose version IS the live graph: never delete
        # the manifest target — alternate the name so the live graph
        # stays intact until the flip
        new_name += ".r"
        new_dir = os.path.join(store_dir, new_name)
    if os.path.exists(new_dir):
        shutil.rmtree(new_dir)  # stale leftover from a crashed attempt
    grown.write.mode("overwrite").parquet(new_dir)
    tmp = _manifest_path(store_dir) + ".tmp"
    prior = adopt_legacy_batches(_committed(store_dir), _manifest(store_dir), vdir)
    committed = sorted(set(prior) | {int(batch_id)})
    with open(tmp, "w") as fh:
        json.dump({"current": new_name, "committed": committed}, fh)
    os.replace(tmp, _manifest_path(store_dir))
    _gc_stale_versions(store_dir, "graph.v", new_name)


def streaming_vector_ingest(
    stream_df: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    **graph_kwargs,
):
    """Attach a vector stream to the live graph store. Returns the
    StreamingQuery. Requires vec_ids to arrive in ascending order
    across batches (the natural ingest-sequence contract;
    ``hnsw_append`` raises on violations rather than corrupting the
    insertion order)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_vector_batch(
            batch_df.sparkSession, batch_df, store_dir, int(batch_id), **graph_kwargs
        )

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
