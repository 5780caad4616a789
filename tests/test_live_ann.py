"""Live vector index (pipeline/live_ann.py): micro-batch graph growth
must be invisible to serving — the stored graph after any batching is
bit-identical to a one-shot build, retries are idempotent, and queries
served from the live store equal exact brute force at gate params."""

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from neural_search_spark.pipeline.graph_ann import hnsw_build_frame, hnsw_topk
from neural_search_spark.pipeline.live_ann import (
    append_vector_batch,
    read_live_graph,
    read_live_vectors,
    streaming_vector_ingest,
)


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(os.path.join(SF_SMALL, "embeddings.parquet"))


def _graph_set(g):
    return {
        (r["segment"], r["vec_id"], tuple(r["neighbors"]))
        for r in g.select("segment", "vec_id", "neighbors").collect()
    }


def _batches(embeddings, n=3):
    ids = sorted(r["vec_id"] for r in embeddings.select("vec_id").collect())
    cuts = [ids[len(ids) * i // n] for i in range(1, n)]
    lo = None
    out = []
    for hi in cuts + [None]:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("vec_id") >= lo)
        if hi is not None:
            cond = cond & (F.col("vec_id") < hi)
        out.append(embeddings.where(cond))
        lo = hi
    return out


def test_batched_appends_equal_one_shot_build(spark, embeddings, tmp_path):
    store = str(tmp_path / "store")
    for i, b in enumerate(_batches(embeddings)):
        append_vector_batch(spark, b, store, batch_id=i)
    live_g = read_live_graph(spark, store)
    full_g = hnsw_build_frame(embeddings)
    assert _graph_set(live_g) == _graph_set(full_g)
    # vector store round-trips completely
    assert read_live_vectors(spark, store).count() == embeddings.count()


def test_batch_retry_is_idempotent(spark, embeddings, tmp_path):
    store = str(tmp_path / "store")
    batches = _batches(embeddings)
    for i, b in enumerate(batches):
        append_vector_batch(spark, b, store, batch_id=i)
    before = _graph_set(read_live_graph(spark, store))
    n_before = read_live_vectors(spark, store).count()
    # redeliver the final batch (foreachBatch retry semantics)
    append_vector_batch(spark, batches[-1], store, batch_id=len(batches) - 1)
    assert _graph_set(read_live_graph(spark, store)) == before
    assert read_live_vectors(spark, store).count() == n_before


def test_streaming_ingest_and_serving_parity(spark, embeddings, tmp_path):
    from neural_search_spark.pipeline.similarity import cosine_topk

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    # one file per batch, mtimes ascending so the file source delivers
    # them in vec_id order (the ingest-sequence contract)
    for i, b in enumerate(_batches(embeddings)):
        p = os.path.join(src, f"b{i}.parquet")
        b.coalesce(1).write.parquet(p)
        t = 1_700_000_000 + i * 10
        for root, _, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))
    stream = (
        spark.readStream.schema(embeddings.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*.parquet")
    )
    q = streaming_vector_ingest(stream, store, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    live_g = read_live_graph(spark, store)
    assert _graph_set(live_g) == _graph_set(hnsw_build_frame(embeddings))
    emb = read_live_vectors(spark, store)
    qid = int(embeddings.agg(F.min("vec_id")).first()[0])
    got = {r["vec_id"] for r in hnsw_topk(emb, qid, k=10, graphs=live_g).collect()}
    exact = {r["vec_id"] for r in cosine_topk(embeddings, qid, k=10).collect()}
    assert got == exact


def test_crash_orphan_dirs_are_swept(spark, embeddings, tmp_path):
    """A crash between the manifest flip and the old version's delete
    leaves an orphaned graph.v* dir; the NEXT append must GC every
    versioned dir that is not the manifest's current target (unbounded
    disk growth otherwise), and serving must be unaffected."""
    import json

    store = str(tmp_path / "store")
    b0, b1, b2 = _batches(embeddings)
    append_vector_batch(spark, b0, store, batch_id=0)
    # simulate the crash artifact: an orphan version the manifest does
    # not reference (as if a prior process died right after its flip)
    orphan = os.path.join(store, "graph.v99")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk"), "w") as fh:
        fh.write("x")
    append_vector_batch(spark, b1, store, batch_id=1)
    with open(os.path.join(store, "graph_manifest.json")) as fh:
        current = json.load(fh)["current"]
    vdirs = [n for n in os.listdir(store) if n.startswith("graph.v")]
    assert vdirs == [current]  # orphan AND the v0 graph both swept
    append_vector_batch(spark, b2, store, batch_id=2)
    assert _graph_set(read_live_graph(spark, store)) == _graph_set(
        hnsw_build_frame(embeddings))
