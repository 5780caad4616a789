"""Index settings/mappings validation — the reference's
index-creation-time checks, re-expressed for the Parquet-segment sink.

The plugin validates mappings when an index is created (field types,
analyzer names, knn/rank_features settings) and rejects bad requests
before any data moves. The analog here: ``validate_index_spec`` runs
against the corpus DataFrame's schema BEFORE ``build_index`` schedules
any job, so a misconfigured build fails in milliseconds instead of
after a cluster-wide tokenize pass. ``build_index`` calls it on entry;
``index_meta.json`` then records the validated spec (the mappings
document of the built index).
"""

from __future__ import annotations

from pyspark.sql import types as T

from ..functions.tokenize import SPLIT_RES

VALID_CODECS = ("varint", "pfor")


class IndexSpecError(ValueError):
    pass


def validate_index_spec(
    schema: T.StructType,
    key_cols: list[str],
    text_col: str,
    tokenizer: str,
    num_segments: int,
    range_block: int,
    term_buckets: int = 0,
    codec: str = "varint",
) -> None:
    fields = {f.name: f.dataType for f in schema.fields}
    if not key_cols:
        raise IndexSpecError("key_cols must be non-empty (doc identity)")
    if len(set(key_cols)) != len(key_cols):
        raise IndexSpecError(f"duplicate key_cols: {key_cols}")
    missing = [c for c in [*key_cols, text_col] if c not in fields]
    if missing:
        raise IndexSpecError(f"columns not in corpus schema: {missing}")
    if text_col in key_cols:
        raise IndexSpecError(f"text_col [{text_col}] cannot be a key column")
    if not isinstance(fields[text_col], T.StringType):
        raise IndexSpecError(
            f"text_col [{text_col}] must be string, got {fields[text_col].simpleString()}"
        )
    # tokenizer: registry name, or a custom split regex (must compile)
    if tokenizer not in SPLIT_RES:
        import re

        try:
            re.compile(tokenizer)
        except re.error as exc:
            raise IndexSpecError(
                f"tokenizer [{tokenizer}] is neither a registered analyzer "
                f"{sorted(SPLIT_RES)} nor a valid split regex: {exc}"
            ) from exc
    if num_segments < 1:
        raise IndexSpecError(f"num_segments must be >= 1, got {num_segments}")
    if range_block < 2:
        raise IndexSpecError(f"range_block must be >= 2, got {range_block}")
    if term_buckets < 0:
        raise IndexSpecError(f"term_buckets must be >= 0, got {term_buckets}")
    if codec not in VALID_CODECS:
        raise IndexSpecError(f"codec [{codec}] not in {VALID_CODECS}")
