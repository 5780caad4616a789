"""Ingest encoder slots: deterministic stand-in models, Arrow-UDF twin
equality, and the build's structural skew immunity."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from neural_search_spark.operators.encoders import dense_embed, embed_arrow_udf, sparse_encode


def test_sparse_encode_topm_and_weights(spark):
    df = spark.createDataFrame([(1, "a a a b c"), (2, "x y")], ["doc_id", "text"])
    rows = sparse_encode(df, top_m=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.token, r.weight))
    assert sorted(by_doc[1]) == [("a", 0.6), ("b", 0.2)]  # top-2, tie b<c
    assert sorted(by_doc[2]) == [("x", 0.5), ("y", 0.5)]


def test_dense_embed_unit_norm(documents):
    out = dense_embed(documents, dim=16)
    norms = (
        out.groupBy("doc_id")
        .agg(F.sum(F.col("val") * F.col("val")).alias("sq"))
        .collect()
    )
    assert all(abs(r.sq - 1.0) < 1e-2 for r in norms)  # rounded vals ⇒ loose


def test_arrow_udf_matches_catalyst(spark, documents):
    """The pandas-UDF model (length-sorted batching) must equal the
    Catalyst feature-hashing path element-for-element."""
    sample = documents.limit(30)
    udf_rows = sample.select("doc_id", embed_arrow_udf(16)(F.col("text")).alias("v")).collect()
    udf = {r.doc_id: np.array(r.v) for r in udf_rows}
    cat_rows = dense_embed(sample, dim=16, round_to=10).collect()
    cat = {}
    for r in cat_rows:
        cat.setdefault(r.doc_id, np.zeros(16))[r.dim_idx] = r.val
    assert set(udf) == set(cat)
    for d in udf:
        assert np.allclose(udf[d], cat[d], atol=1e-9), d


def test_build_skew_immunity(spark, tmp_path_factory):
    """Adversarial skew: a stop-word token present in EVERY doc. The
    build's only shuffle key is the uniform segment id, so segment sizes
    must stay balanced regardless of term skew (north rule)."""
    from neural_search_spark.corpus import corpus_df
    from neural_search_spark.index.builder import build_index

    corpus = corpus_df(spark, 800, partitions=8).withColumn(
        "content", F.concat(F.lit("def def def def "), F.col("content"))
    )
    idx = str(tmp_path_factory.mktemp("idx_skew"))
    build_index(spark, corpus, idx, key_cols=["repo", "path", "commit"],
                text_col="content", tokenizer="code", num_segments=8, range_block=64)
    man = spark.read.parquet(idx + "/manifest").select("segment_id", "docs_tokenized").collect()
    counts = np.array([r.docs_tokenized for r in man], dtype=float)
    assert len(counts) == 8 and counts.sum() == 800
    assert counts.std() / counts.mean() < 0.25  # no hot segment
    # the skewed term's postings are spread across every segment
    post = spark.read.parquet(idx + "/postings")
    segs_with_def = post.where(F.col("term") == "def").select("segment_id").distinct().count()
    assert segs_with_def == 8
