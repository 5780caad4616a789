"""Crash-safety of the streaming stores (VERDICT r04 #9).

The claim at pipeline/live_dedup.py / live_ann.py: the os.replace
manifest flip is the ONLY commit point, so a process dying at ANY other
moment leaves the previous snapshot fully servable and a re-run of the
same batch converges to the no-crash answer.

Proven here with REAL process death: a child python process (own
SparkSession) appends a batch with the module's ``os.replace`` wrapped
to SIGKILL the process at the flip point — the closest reproducible
analog of a machine crash (no atexit, no finally blocks run). The
parent then serves the store and re-runs the batch.
"""

import os
import signal
import subprocess
import sys
import textwrap

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_child(code: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-c", textwrap.dedent(code)],
        capture_output=True, text=True, timeout=600,
        cwd=REPO, env=dict(os.environ, PYTHONPATH=REPO),
    )


CHILD_TEMPLATE = """
import os, signal
from neural_search_spark.session import get_spark
from neural_search_spark.pipeline import {module} as mod

spark = get_spark(app_name="crash-child", master="local[4]", shuffle_partitions=4)
docs = spark.read.parquet("{sf}/documents.parquet").where("doc_id < 120")
b0 = docs.where("doc_id < 60")
b1 = docs.where("doc_id >= 60")
{setup}

_real_replace = os.replace
def _dying_replace(src, dst):
    if dst.endswith("{manifest}"):
        os.kill(os.getpid(), signal.SIGKILL)  # crash AT the commit point
    return _real_replace(src, dst)
mod.os.replace = _dying_replace
{append_b1}
print("UNREACHABLE")
"""


def test_live_dedup_crash_before_flip_serves_prior_state(spark, tmp_path):
    from neural_search_spark.pipeline.live_dedup import (
        append_dedup_batch,
        live_survivors,
    )

    store = str(tmp_path / "store")
    code = CHILD_TEMPLATE.format(
        module="live_dedup", sf=SF_SMALL, manifest="roots_manifest.json",
        setup=f'mod.append_dedup_batch(spark, b0, "{store}", batch_id=0)',
        append_b1=f'mod.append_dedup_batch(spark, b1, "{store}", batch_id=1)',
    )
    # the child must die by SIGKILL (no graceful exit path)
    proc = _run_child(code)
    subprocess.run(["pkill", "-f", "crash-chil[d]"], check=False)  # orphan JVMs
    assert proc.returncode == -signal.SIGKILL, (proc.returncode, proc.stderr[-800:])
    assert "UNREACHABLE" not in proc.stdout

    docs = spark.read.parquet(os.path.join(SF_SMALL, "documents.parquet")).where(
        "doc_id < 120")
    b0 = docs.where("doc_id < 60")
    b1 = docs.where("doc_id >= 60")

    # pre-batch snapshot still serves: survivors == batch-0-only state
    got0 = {(r["doc_id"], r["component_id"], r["keep"])
            for r in live_survivors(spark, store).collect()}
    ref_store = str(tmp_path / "ref0")
    append_dedup_batch(spark, b0, ref_store, batch_id=0)
    exp0 = {(r["doc_id"], r["component_id"], r["keep"])
            for r in live_survivors(spark, ref_store).collect()}
    assert got0 == exp0

    # the redelivered batch converges to the no-crash answer
    append_dedup_batch(spark, b1, store, batch_id=1)
    got1 = {(r["doc_id"], r["component_id"], r["keep"])
            for r in live_survivors(spark, store).collect()}
    append_dedup_batch(spark, b1, ref_store, batch_id=1)
    exp1 = {(r["doc_id"], r["component_id"], r["keep"])
            for r in live_survivors(spark, ref_store).collect()}
    assert got1 == exp1


def test_live_ann_crash_before_flip_serves_prior_graph(spark, tmp_path):
    from neural_search_spark.pipeline.graph_ann import hnsw_build_frame
    from neural_search_spark.pipeline.live_ann import (
        append_vector_batch,
        read_live_graph,
    )

    emb = spark.read.parquet(os.path.join(SF_SMALL, "embeddings.parquet")).where(
        "vec_id < 120")
    store = str(tmp_path / "vstore")
    code = CHILD_TEMPLATE.format(
        module="live_ann", sf=SF_SMALL, manifest="graph_manifest.json",
        setup=(
            f'emb = spark.read.parquet("{SF_SMALL}/embeddings.parquet")'
            '.where("vec_id < 120")\n'
            'b0 = emb.where("vec_id < 60")\n'
            'b1 = emb.where("vec_id >= 60")\n'
            f'mod.append_vector_batch(spark, b0, "{store}", batch_id=0)'
        ),
        append_b1=f'mod.append_vector_batch(spark, b1, "{store}", batch_id=1)',
    )
    proc = _run_child(code)
    subprocess.run(["pkill", "-f", "crash-chil[d]"], check=False)  # orphan JVMs
    assert proc.returncode == -signal.SIGKILL, (proc.returncode, proc.stderr[-800:])

    def gset(g):
        return {(r["segment"], r["vec_id"], tuple(r["neighbors"]))
                for r in g.select("segment", "vec_id", "neighbors").collect()}

    # prior snapshot (batch-0 graph) still serves
    b0 = emb.where("vec_id < 60")
    assert gset(read_live_graph(spark, store)) == gset(hnsw_build_frame(b0))
    # redelivery converges to the one-shot full build
    b1 = emb.where("vec_id >= 60")
    append_vector_batch(spark, b1, store, batch_id=1)
    assert gset(read_live_graph(spark, store)) == gset(hnsw_build_frame(emb))


def _strip_commit_gate(manifest_path):
    """Rewrite a store manifest to the legacy shape (no 'committed'
    key) — what stores written before the commit gate look like."""
    import json

    with open(manifest_path) as fh:
        m = json.load(fh)
    m.pop("committed")
    with open(manifest_path, "w") as fh:
        json.dump(m, fh)


def test_legacy_dedup_manifest_serves_and_adopts_prior_batches(spark, tmp_path):
    """A manifest without the 'committed' key means everything on disk
    was committed: serving must NOT hide prior batches, and the next
    append must adopt them into the gate instead of orphaning them."""
    import json

    from neural_search_spark.pipeline import live_dedup as mod

    docs = spark.read.parquet(os.path.join(SF_SMALL, "documents.parquet")).where(
        "doc_id < 120")
    b0, b1 = docs.where("doc_id < 60"), docs.where("doc_id >= 60")

    store = str(tmp_path / "legacy_dedup")
    mod.append_dedup_batch(spark, b0, store, batch_id=0)
    _strip_commit_gate(mod._manifest_path(store))

    # serving still covers every batch-0 doc
    assert len(mod.live_survivors(spark, store).collect()) == b0.count()

    # the next append folds the legacy batch into the gate
    mod.append_dedup_batch(spark, b1, store, batch_id=1)
    with open(mod._manifest_path(store)) as fh:
        assert json.load(fh)["committed"] == [0, 1]

    ref = str(tmp_path / "ref_dedup")
    mod.append_dedup_batch(spark, b0, ref, batch_id=0)
    mod.append_dedup_batch(spark, b1, ref, batch_id=1)
    key = lambda df: {(r["doc_id"], r["component_id"], r["keep"])
                      for r in df.collect()}
    assert key(mod.live_survivors(spark, store)) == key(mod.live_survivors(spark, ref))


def test_legacy_ann_manifest_serves_and_adopts_prior_batches(spark, tmp_path):
    import json

    from neural_search_spark.pipeline import live_ann as mod
    from neural_search_spark.pipeline.graph_ann import hnsw_build_frame

    emb = spark.read.parquet(os.path.join(SF_SMALL, "embeddings.parquet")).where(
        "vec_id < 120")
    b0, b1 = emb.where("vec_id < 60"), emb.where("vec_id >= 60")

    store = str(tmp_path / "legacy_ann")
    mod.append_vector_batch(spark, b0, store, batch_id=0)
    _strip_commit_gate(mod._manifest_path(store))

    assert mod.read_live_vectors(spark, store).count() == b0.count()

    mod.append_vector_batch(spark, b1, store, batch_id=1)
    with open(mod._manifest_path(store)) as fh:
        assert json.load(fh)["committed"] == [0, 1]

    gset = lambda g: {(r["segment"], r["vec_id"], tuple(r["neighbors"]))
                      for r in g.select("segment", "vec_id", "neighbors").collect()}
    assert gset(mod.read_live_graph(spark, store)) == gset(hnsw_build_frame(emb))
