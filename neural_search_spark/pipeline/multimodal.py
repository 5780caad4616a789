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
