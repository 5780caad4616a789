"""Segment merge: merged index must answer every query rank- AND
score-identically to the unmerged index (BM25 stats are untouched by
merging — N, avgdl, df, norms all survive doc-id rebasing)."""

import pytest
from pyspark.sql import functions as F

from neural_search_spark.index.builder import build_index, verify_sha256
from neural_search_spark.index.merge import merge_segments
from neural_search_spark.query.wand import IndexReader, bm25_topk_indexed

QUERIES = [
    (["def", "return"], "or"),
    (["import", "class", "lambda"], "or"),
    (["def", "import"], "and"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    from neural_search_spark.corpus import corpus_df

    return corpus_df(spark, 600, partitions=4).cache()


@pytest.fixture(scope="module")
def merged_pair(spark, corpus, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("idx_base"))
    out = str(tmp_path_factory.mktemp("idx_merged"))
    build_index(
        spark, corpus, base, key_cols=["repo", "path", "commit"], text_col="content",
        tokenizer="code", num_segments=8, range_block=64, term_buckets=4,
    )
    metrics = merge_segments(spark, base, out, factor=4)
    return base, out, metrics


def test_merge_reduces_segments(spark, merged_pair):
    base, out, metrics = merged_pair
    assert metrics["segments_in"] == 8 and metrics["segments_out"] == 2
    segs = {r.segment_id for r in spark.read.parquet(out + "/postings").select("segment_id").distinct().collect()}
    assert segs == {0, 1}


def test_merge_preserves_stats(spark, merged_pair):
    base, out, _ = merged_pair
    rb, rm = IndexReader(spark, base), IndexReader(spark, out)
    assert rb.global_stats() == rm.global_stats()
    for terms, _ in QUERIES:
        assert rb.term_dfs(terms) == rm.term_dfs(terms)


def test_merge_rank_and_score_identical(spark, merged_pair):
    base, out, _ = merged_pair
    rb, rm = IndexReader(spark, base), IndexReader(spark, out)
    for terms, mode in QUERIES:
        a = bm25_topk_indexed(rb, terms, k=10, mode=mode).select("repo", "path", "commit", "score").collect()
        b = bm25_topk_indexed(rm, terms, k=10, mode=mode).select("repo", "path", "commit", "score").collect()
        assert [(r.repo, r.path, r.commit) for r in a] == [(r.repo, r.path, r.commit) for r in b]
        assert all(abs(x.score - y.score) < 1e-9 for x, y in zip(a, b))


def test_merge_docmap_consistent(spark, corpus, merged_pair):
    base, out, _ = merged_pair
    assert verify_sha256(spark, corpus, out) == 0
    dm = spark.read.parquet(out + "/docmap")
    assert dm.count() == dm.select("nss_doc_id").distinct().count() == 600
    # local ids dense per merged segment
    bad = (
        dm.groupBy("segment_id")
        .agg(F.count(F.lit(1)).alias("c"), F.max("local_id").alias("mx"), F.min("local_id").alias("mn"))
        .where((F.col("mx") != F.col("c") - 1) | (F.col("mn") != 0))
        .count()
    )
    assert bad == 0
