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


def test_dedup_aware_search(spark, documents, tmp_path):
    """The production loop: the live survivors view feeds the indexed
    query as a FILTER-occur allow-list — duplicates never reach the
    top-k, scores/stats stay global (same semantics as the gated
    bm25_filtered family)."""
    from neural_search_spark.index.builder import build_index
    from neural_search_spark.query.exhaustive import bm25_scores, topk
    from neural_search_spark.query.filters import filtered_scores
    from neural_search_spark.query.wand import IndexReader, bm25_topk_indexed

    store = str(tmp_path / "dedup_store")
    for i, b in enumerate(_batches(documents)):
        append_dedup_batch(spark, b, store, batch_id=i)
    kept = live_survivors(spark, store).where("keep").select("doc_id")

    idx = str(tmp_path / "idx")
    build_index(spark, documents, idx, key_cols=["doc_id"], text_col="text",
                tokenizer="simple", num_segments=4, range_block=64)
    reader = IndexReader(spark, idx, cache_hot=True)
    allowed = reader.docmap().join(kept, "doc_id").select("nss_doc_id")
    got = bm25_topk_indexed(reader, ["spark", "window"], k=10, mode="or",
                            allowed=allowed)
    got_rows = {(r["doc_id"], round(r["score"], 4)) for r in got.collect()}

    exp = topk(
        filtered_scores(bm25_scores(documents, ["spark", "window"], round_to=None),
                        documents.join(kept, "doc_id"), F.lit(True)),
        k=10,
    )
    exp_rows = {(r["doc_id"], r["score"]) for r in exp.collect()}
    assert got_rows == exp_rows
    keep_ids = {r["doc_id"] for r in kept.collect()}
    assert {d for d, _ in got_rows} <= keep_ids
