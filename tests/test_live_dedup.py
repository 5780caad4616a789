"""Streaming dedup (pipeline/live_dedup.py): batching must be invisible
— pairs-between reproduces the batch pair set, and the maintained
survivors view equals the batch dedup over everything ingested."""

import os

import pytest
from pyspark.sql import functions as F

from neural_search_spark.pipeline.dedup import (
    dedup_survivors,
    doc_sketches,
    minhash_lsh_pairs,
    minhash_pairs_between,
)
from neural_search_spark.pipeline.live_dedup import (
    append_dedup_batch,
    live_survivors,
    streaming_dedup_ingest,
)


def _pairset(df):
    return {(r["a"], r["b"], r["jaccard"]) for r in df.collect()}


def test_pairs_between_self_equals_lsh_pairs(spark, documents):
    sk = doc_sketches(documents).persist()
    got = _pairset(minhash_pairs_between(sk, sk))
    exp = _pairset(minhash_lsh_pairs(documents))
    assert got == exp and got


def _batches(documents, nb=3):
    return [documents.where(F.pmod("doc_id", F.lit(nb)) == i) for i in range(nb)]


def test_streaming_survivors_equal_batch_dedup(spark, documents, tmp_path):
    store = str(tmp_path / "store")
    for i, b in enumerate(_batches(documents)):
        append_dedup_batch(spark, b, store, batch_id=i)
    got = {
        (r["doc_id"], r["component_id"], r["group_size"], r["keep"])
        for r in live_survivors(spark, store).collect()
    }
    exp = {
        (r["doc_id"], r["component_id"], r["group_size"], r["keep"])
        for r in dedup_survivors(documents, minhash_lsh_pairs(documents)).collect()
    }
    assert got == exp
    # retry the final batch: the view must not change
    append_dedup_batch(spark, _batches(documents)[-1], store, batch_id=2)
    got2 = {
        (r["doc_id"], r["component_id"], r["group_size"], r["keep"])
        for r in live_survivors(spark, store).collect()
    }
    assert got2 == exp


def test_streaming_dedup_ingest_file_stream(spark, documents, tmp_path):
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    for i, b in enumerate(_batches(documents)):
        p = os.path.join(src, f"b{i}.parquet")
        b.coalesce(1).write.parquet(p)
        t = 1_700_000_000 + i * 10
        for root, _, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))
    stream = (
        spark.readStream.schema(documents.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*.parquet")
    )
    q = streaming_dedup_ingest(stream, store, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    got = {
        (r["doc_id"], r["component_id"], r["keep"])
        for r in live_survivors(spark, store).collect()
    }
    exp = {
        (r["doc_id"], r["component_id"], r["keep"])
        for r in dedup_survivors(documents, minhash_lsh_pairs(documents)).collect()
    }
    assert got == exp
