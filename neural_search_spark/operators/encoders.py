"""Ingest encoders — the reference's ML-inference processor slots with
deterministic stand-in models.

* ``sparse_encode``  — SparseEncodingProcessor slot (processor/
  SparseEncodingProcessor.java:26-65): text → token→weight map. Model
  stand-in: length-normalized tf (tf/dl), top-``m`` tokens per doc —
  doc-local like a real encoder (no corpus statistics at ingest time).
* ``dense_embed``    — TextEmbeddingProcessor slot (processor/
  TextEmbeddingProcessor.java:25-60): text → float vector. Model
  stand-in: the feature-hashing trick — bucket = md5_56(token) % dim,
  sign from the next hash bit, v[bucket] += sign·tf, then L2 normalize.
  Deterministic and dual-dialect (DuckDB oracle computes the identical
  vector), so the whole ANN path can run on *derived* embeddings.
* ``embed_arrow_udf`` — the same dense model through a pandas UDF with
  the reference's batching micro-optimization (sort the batch by text
  length before the "model" call so fixed-size padding waste shrinks —
  InferenceProcessor.java:206-228); tests assert it equals the Catalyst
  path bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.tokenize import simple_tokens_sql, tokenize_simple
from ..pipeline.hashing import hash64_sql, py_hash64

DEFAULT_DIM = 16
DEFAULT_TOP_M = 8


def _tf(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    spark_toks, _ = simple_tokens_sql(text_col)
    tok = docs.select(F.col(id_col).alias("doc_id"), F.expr(spark_toks).alias("toks"))
    return (
        tok.select("doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("token"))
        .groupBy("doc_id", "dl", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def sparse_encode(
    docs: DataFrame,
    top_m: int = DEFAULT_TOP_M,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """(doc_id, token, weight): top-m length-normalized-tf features per
    doc (long form of the rank_features map — MapType assembly is one
    map_from_entries away when a map column is wanted)."""
    tf = _tf(docs, id_col, text_col)
    w = Window.partitionBy("doc_id").orderBy(
        (F.col("tf") / F.col("dl")).desc(), F.col("token").asc()
    )
    return (
        tf.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= top_m)
        .select(
            "doc_id",
            "token",
            F.round(F.col("tf") / F.col("dl"), round_to).alias("weight"),
        )
    )


def hash_embed_from_tf(tf: DataFrame, dim: int = DEFAULT_DIM, round_to: int = 4) -> DataFrame:
    """(doc_id, dim_idx, val) from any (doc_id, token, tf) frame:
    the feature-hashing ladder (bucket = md5_56 % dim, sign from the
    next hash bit, L2 normalize) — shared by the text-only and the
    joint text+image embedders."""
    spark_h, _ = hash64_sql("token")
    tf = tf.withColumn("h", F.expr(spark_h))
    tf = tf.withColumn("bucket", F.col("h") % dim).withColumn(
        "sgn", F.when((F.expr(f"shiftright(h, {8})") % 2) == 0, F.lit(1.0)).otherwise(F.lit(-1.0))
    )
    raw = (
        tf.groupBy("doc_id", F.col("bucket").alias("dim_idx"))
        .agg(F.sum(F.col("sgn") * F.col("tf")).alias("v"))
    )
    nrm = raw.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm"))
    return (
        raw.join(nrm, "doc_id")
        .select(
            "doc_id",
            F.col("dim_idx").cast("int").alias("dim_idx"),
            F.round(
                F.when(F.col("nrm") == 0.0, F.lit(0.0)).otherwise(F.col("v") / F.col("nrm")),
                round_to,
            ).alias("val"),
        )
    )


def dense_embed(
    docs: DataFrame,
    dim: int = DEFAULT_DIM,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """(doc_id, dim_idx, val): L2-normalized feature-hashing embedding in
    long form — Catalyst-only (whole-stage codegen), oracle-checkable."""
    return hash_embed_from_tf(
        _tf(docs, id_col, text_col).select("doc_id", "token", "tf"), dim, round_to
    )


def embed_arrow_udf(dim: int = DEFAULT_DIM):
    """pandas UDF twin of ``dense_embed`` (returns array<double>),
    batching like InferenceProcessor: the batch is processed in
    ascending-text-length order (the padding-waste micro-opt at
    InferenceProcessor.java:206-228) and results are restored to input
    order — bit-identical output, different visit order."""

    @F.pandas_udf("array<double>")
    def embed(texts: pd.Series) -> pd.Series:
        order = texts.str.len().sort_values(kind="mergesort").index
        out = pd.Series([None] * len(texts), index=texts.index, dtype=object)
        for i in order:  # "model" call, shortest first
            vec = np.zeros(dim, dtype=np.float64)
            for tok in tokenize_simple(pd.Series([texts[i]]))[0]:
                h = py_hash64(tok)
                sgn = 1.0 if (h >> 8) % 2 == 0 else -1.0
                vec[h % dim] += sgn
            # note: per-token weight is tf because each occurrence adds 1
            n = np.sqrt((vec * vec).sum())
            out[i] = (vec / n if n else vec).tolist()
        return out

    return embed
