"""Live (streaming) corpus dedup: micro-batch → incremental components.

The streaming composition of the dedup family: as document batches
arrive, each batch is sketched once (``doc_sketches`` — shingle-hash
set + minhash signature, zero-shuffle per-row expressions), LSH-joined
against the WHOLE corpus's stored sketches (``minhash_pairs_between`` —
every near-dup pair is emitted exactly once, by the batch its later
member arrives in), and folded into the maintained component store with
``components_update`` (prior star edges are a components certificate,
so each batch pays only for its new structure). The survivors view is
always current: a doc ingested a year ago flips to ``keep=False`` the
moment a lower-id near-duplicate of it arrives — wait, ids ascend, so
in practice the NEW doc is the one marked duplicate, exactly what a
training pipeline wants.

Scale shape per batch: sketching is per-row (no shuffle); the pair join
is |batch| × corpus band-bucket collisions (uniform md5-derived keys);
the component fold is 1-3 alternating-star rounds over star edges ∪ new
pairs. Nothing ever re-tokenizes or re-pairs previously ingested docs.

Storage discipline = index/live.py / live_ann.py: per-batch dynamic
partition overwrite for the sketch/docid stores (idempotent retry) and
a versioned roots directory committed by an atomic one-line manifest
flip (``os.replace``).

Reference analog: none (the plugin never dedups) — this is the
training-pipeline extension mandated by the build brief, composed from
the driver-gated pieces (dedup_components / dedup_survivors gates the
batch semantics; pytest pins streaming == batch).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .live_ann import _gc_stale_versions, adopt_legacy_batches

from .dedup import (
    DEFAULT_BANDS,
    DEFAULT_NUM_PERM,
    components_update,
    connected_components,
    doc_sketches,
    minhash_pairs_between,
)


def _sketch_dir(store_dir: str) -> str:
    return os.path.join(store_dir, "sketches")


def _docids_dir(store_dir: str) -> str:
    return os.path.join(store_dir, "docids")


def _manifest_path(store_dir: str) -> str:
    return os.path.join(store_dir, "roots_manifest.json")


def _manifest(store_dir: str) -> dict | None:
    p = _manifest_path(store_dir)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def _roots_dir(store_dir: str) -> str | None:
    m = _manifest(store_dir)
    return None if m is None else os.path.join(store_dir, m["current"])


def _committed(store_dir: str) -> list[int] | None:
    """Batch ids the manifest has committed — the SERVING view filter.
    A crashed batch's docid/sketch partitions land before its roots
    flip; gating reads on the manifest\'s committed list keeps the
    whole store view atomic at the one commit point (kill-tested,
    tests/test_crash_safety.py). A manifest WITHOUT the key (written
    before the commit gate existed) means everything on disk was
    committed — returning [] there would silently hide every prior
    batch, so legacy manifests map to None (read-everything)."""
    m = _manifest(store_dir)
    if m is None or "committed" not in m:
        return None
    return [int(x) for x in m["committed"]]


def _committed_or_legacy(store_dir: str, data_dir: str) -> list[int]:
    """Committed batch ids, adopting every on-disk batch when the
    manifest predates the commit gate (legacy = all committed) —
    live_ann.adopt_legacy_batches over THIS store's manifest."""
    return adopt_legacy_batches(_committed(store_dir), _manifest(store_dir), data_dir)


def read_live_roots(spark: SparkSession, store_dir: str) -> DataFrame:
    """(u, v) star edges: every non-singleton doc → its component min."""
    rdir = _roots_dir(store_dir)
    if rdir is None:
        raise FileNotFoundError(f"no roots manifest under {store_dir}")
    return spark.read.parquet(rdir)


def live_survivors(spark: SparkSession, store_dir: str) -> DataFrame:
    """Current (doc_id, component_id, group_size, keep) over EVERY doc
    ingested so far — the always-fresh dedup decision view."""
    from pyspark.sql import Window

    ids = spark.read.parquet(_docids_dir(store_dir))
    committed = _committed(store_dir)
    if committed is not None:
        # serve only COMMITTED batches: a crashed batch's docids are
        # invisible until its pairs fold into the roots
        ids = ids.where(F.col("ingest_batch").isin(committed))
    ids = ids.select("doc_id")
    roots = read_live_roots(spark, store_dir).withColumnRenamed("u", "doc_id")
    comp = ids.join(roots, "doc_id", "left").select(
        "doc_id", F.coalesce("v", F.col("doc_id")).alias("component_id")
    )
    w = Window.partitionBy("component_id")
    return comp.select(
        "doc_id",
        "component_id",
        F.count(F.lit(1)).over(w).alias("group_size"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("keep"),
    )


def append_dedup_batch(
    spark: SparkSession,
    batch: DataFrame,
    store_dir: str,
    batch_id: int,
    n: int = 2,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Sketch one micro-batch, pair it against the corpus so far, fold
    the pairs into the component store. Idempotent per ``batch_id``
    (sketch/docid partitions overwrite their own batch; re-folding the
    same pairs into star edges is a no-op — components are
    history-independent)."""
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        sk = doc_sketches(batch, n=n, num_perm=num_perm, id_col=id_col, text_col=text_col)
        (
            sk.withColumn("ingest_batch", F.lit(int(batch_id)))
            .write.partitionBy("ingest_batch")
            .mode("overwrite")
            .parquet(_sketch_dir(store_dir))
        )
        (
            batch.select(F.col(id_col).cast("long").alias("doc_id"))
            .withColumn("ingest_batch", F.lit(int(batch_id)))
            .write.partitionBy("ingest_batch")
            .mode("overwrite")
            .parquet(_docids_dir(store_dir))
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    all_sk = spark.read.parquet(_sketch_dir(store_dir))
    # pair only against COMMITTED batches + this one: sketches from a
    # crashed-and-never-redelivered batch must not contaminate pairs
    visible = sorted(
        set(_committed_or_legacy(store_dir, _sketch_dir(store_dir))) | {int(batch_id)}
    )
    all_sk = all_sk.where(F.col("ingest_batch").isin(visible))
    left_sk = all_sk.where(F.col("ingest_batch") == int(batch_id)).drop("ingest_batch")
    all_sk = all_sk.drop("ingest_batch")
    new_pairs = minhash_pairs_between(
        left_sk, all_sk, num_perm=num_perm, bands=bands, threshold=threshold
    )

    prev_dir = _roots_dir(store_dir)
    if prev_dir is not None:
        roots = components_update(spark.read.parquet(prev_dir), new_pairs)
    else:
        roots = connected_components(new_pairs)

    new_name = f"roots.v{int(batch_id)}"
    new_dir = os.path.join(store_dir, new_name)
    if prev_dir is not None and os.path.abspath(new_dir) == os.path.abspath(prev_dir):
        new_name += ".r"  # retry: never delete the live roots pre-flip
        new_dir = os.path.join(store_dir, new_name)
    if os.path.exists(new_dir):
        shutil.rmtree(new_dir)
    roots.write.mode("overwrite").parquet(new_dir)
    tmp = _manifest_path(store_dir) + ".tmp"
    committed = sorted(
        set(_committed_or_legacy(store_dir, _sketch_dir(store_dir))) | {int(batch_id)}
    )
    with open(tmp, "w") as fh:
        json.dump({"current": new_name, "committed": committed}, fh)
    os.replace(tmp, _manifest_path(store_dir))
    _gc_stale_versions(store_dir, "roots.v", new_name)


def streaming_dedup_ingest(
    stream_df: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    **dedup_kwargs,
):
    """Attach a document stream to the live dedup store. Returns the
    StreamingQuery; after the stream drains, ``live_survivors`` equals
    the batch ``dedup_survivors`` over everything ingested
    (pytest-pinned)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_dedup_batch(
            batch_df.sparkSession, batch_df, store_dir, int(batch_id), **dedup_kwargs
        )

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
