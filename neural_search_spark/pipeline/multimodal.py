"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video content is carried as an opaque ``binary`` column with
a typed metadata struct, the standard lakehouse pattern for multimodal
training data. The Spark-side plumbing — schema, Arrow batch shape over
``mapInPandas``, partition-preserving feature extraction — is real and
tested; the actual media *decode* (PIL/ffmpeg-style) is stubbed behind
``NotImplementedError`` because media libraries are not available here
(build brief: make the plumbing real, stub the codec).

Reference analog: TextImageEmbeddingProcessor (processor/
TextImageEmbeddingProcessor.java:37-189) carries a base64 image next to
text through inference; here the payload is a first-class binary column.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
    ]
)


def attach_payload(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, payload binary, meta struct): synthesize the multimodal
    shape deterministically — the payload is the UTF-8 bytes of the text
    (a real pipeline reads image/audio bytes from object storage)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.encode(F.col(text_col), "UTF-8")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> object:
    """Decode an image payload to pixels. STUB — media codecs are not
    available in this environment; wire PIL/torchvision here in prod."""
    raise NotImplementedError("image decode requires a media codec library")


def sample_frames(payload: bytes, every_n: int = 30) -> list[bytes]:
    """Sample video frames. STUB — requires ffmpeg-style demuxing."""
    raise NotImplementedError("video frame sampling requires a media codec library")


def extract_features(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column via
    ``mapInPandas`` — byte length + md5 as deterministic stand-ins for
    decoded-media features (same batch shape, schema, and partitioning a
    real extractor uses; swap the per-batch body for the codec call)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "payload_md5": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                }
            )

    return with_payload.select("doc_id", "payload").mapInPandas(batches, FEATURE_SCHEMA)


def multimodal_features(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """End-to-end: attach payload → Arrow roundtrip → features. The md5
    equals DuckDB's md5 of the same text, proving the binary column
    survives the Arrow batch transfer byte-exactly."""
    return extract_features(attach_payload(docs, id_col, text_col))


IMG_GRAMS = 8  # 32-hex md5 → 8 pseudo-tokens of 4 hex chars


def joint_embed(
    docs: DataFrame,
    dim: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """(doc_id, dim_idx, val): ONE embedding from BOTH modalities — the
    TextImageEmbeddingProcessor semantics (processor/
    TextImageEmbeddingProcessor.java:37-189 builds a single vector from
    the {text, image} inference map, one knn field for both).

    Stand-in model: the text contributes its tokens (tf-weighted), the
    image payload contributes ``IMG_GRAMS`` pseudo-tokens ("img:" +
    4-hex-char grams of the payload md5 — i.e. features of the BYTES,
    standing in for visual features); both feed one feature-hashing +
    L2-normalize pass (operators/encoders.hash_embed_from_tf). The
    payload here is the UTF-8 text bytes (attach_payload), which keeps
    the whole op Catalyst-expressible and lets the DuckDB oracle verify
    the exact fusion — swap the gram extractor for a real image encoder
    UDF in prod without touching the fusion/normalization."""
    from ..functions.tokenize import simple_tokens_sql
    from ..operators.encoders import hash_embed_from_tf

    spark_toks, _ = simple_tokens_sql(text_col)
    text_tf = (
        docs.select(F.col(id_col).alias("doc_id"), F.expr(spark_toks).alias("toks"))
        .select("doc_id", F.explode("toks").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    grams = ", ".join(
        f"concat('img:', substring(md5({text_col}), {i * 4 + 1}, 4))" for i in range(IMG_GRAMS)
    )
    img_tf = (
        docs.select(
            F.col(id_col).alias("doc_id"), F.explode(F.expr(f"array({grams})")).alias("token")
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return hash_embed_from_tf(text_tf.unionByName(img_tf), dim, round_to)
