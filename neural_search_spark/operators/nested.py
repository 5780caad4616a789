"""Nested-document ingest — the reference's recursive field-map walk.

The reference's InferenceProcessor builds embeddings for fields
addressed by dotted paths inside nested Map documents
(processor/InferenceProcessor.java:297-367 — buildMapWithTargetKeys /
processMapEntryValue) and TextChunkingProcessor chunks nested string
fields in place (processor/TextChunkingProcessor.java:238-270).

Spark analog: documents arrive as JSON (or struct) columns; a dotted
path selects the nested text field JVM-side (``get_json_object`` —
no Python), the selected text runs through the delimiter chunker, and
each chunk is sparse-encoded (top-m length-normalized tf — the
deterministic stand-in model of operators/encoders.py). Everything is
Catalyst-expressible, so the DuckDB oracle reproduces it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .chunkers import delimiter_chunks_sql

# chunk_idx is folded into a composite id for the per-chunk encode
# groupBy; max_chunk_limit is 100, so a factor of 1000 never collides
CHUNK_ID_FACTOR = 1000


def nested_doc_json(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, doc_json): a genuinely nested JSON document built from
    the flat table — {"meta": {"lang", "source"}, "sec": {"title",
    "body"}} — standing in for the reference's Map<String,Object> doc."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.to_json(
            F.struct(
                F.struct(F.col("lang"), F.col("source")).alias("meta"),
                F.struct(
                    F.substring("text", 1, 40).alias("title"), F.col("text").alias("body")
                ).alias("sec"),
            )
        ).alias("doc_json"),
    )


def chunk_sparse_features(
    chunks: DataFrame, top_m: int = 8, round_to: int = 4
) -> DataFrame:
    """(doc_id, chunk_idx, token, weight) from a (doc_id, chunk_idx,
    chunk) frame — the per-chunk deterministic stand-in encoder (top-m
    length-normalized tf, token-asc tiebreak, rounded weights). The ONE
    encoder that ingest (``nested_chunk_encode``) and query-time inner
    scoring (``nested_sparse_scores``) share, so the two can never
    drift on tie rule, top-m cut, or rounding."""
    from pyspark.sql import Window

    from ..functions.tokenize import simple_tokens_sql

    spark_toks, _ = simple_tokens_sql("chunk")
    tf = (
        chunks.select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.expr(spark_toks).alias("toks"),
        )
        .select(
            "doc_id", "chunk_idx", F.size("toks").alias("dl"), F.explode("toks").alias("token")
        )
        .groupBy("doc_id", "chunk_idx", "dl", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.partitionBy("doc_id", "chunk_idx").orderBy(
        (F.col("tf") / F.col("dl")).desc(), F.col("token").asc()
    )
    return (
        tf.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= top_m)
        .select(
            "doc_id",
            "chunk_idx",
            "token",
            F.round(F.col("tf") / F.col("dl"), round_to).alias("weight"),
        )
    )


def nested_chunk_encode(
    nested: DataFrame,
    path: str = "$.sec.body",
    delimiter: str = "\n\n",
    top_m: int = 8,
    round_to: int = 4,
) -> DataFrame:
    """(doc_id, chunk_idx, token, weight): dotted-path extract →
    delimiter chunk → per-chunk sparse encode, end-to-end JVM-side.

    At 100 TB this is one narrow projection + one explode + one
    groupBy on (doc, chunk) — the encode aggregate partial-combines
    map-side; no shuffle is keyed on anything skewed."""
    body = nested.select(
        "doc_id", F.get_json_object("doc_json", path).alias("text")
    )
    spark_chunks, _ = delimiter_chunks_sql("text", delimiter)
    chunks = body.select(
        "doc_id", F.posexplode(F.expr(spark_chunks)).alias("chunk_idx", "chunk")
    )
    return chunk_sparse_features(chunks, top_m=top_m, round_to=round_to)


NESTED_CHUNK_ID_BASE = 100_000  # chunk_id = parent * BASE + chunk_idx


# Lucene ScoreMode for block join (ToParentBlockJoinQuery): how the
# matching children's scores become the parent score. "total" is the
# ScoreMode.Total alias for sum; "avg" averages over MATCHING children
# only (non-matching chunks contribute nothing), exactly as Lucene's
# ParentApproximation accumulates.
NESTED_SCORE_MODES = {
    "max": F.max, "sum": F.sum, "total": F.sum, "avg": F.avg, "min": F.min,
}


def nested_chunk_scores(
    docs: DataFrame,
    terms: list[str],
    delimiter: str,
    score_mode: str = "max",
    id_col: str = "doc_id",
    text_col: str = "text",
    operator: str = "or",
) -> DataFrame:
    """Per-chunk BM25 scoring rolled up per-parent — the
    ToParentBlockJoinQuery(ScoreMode) analog: the reference's nested
    support scores nested (chunk) docs and joins the child scores to
    the parent (HybridQueryPhaseSearcher.java:86-104 unwraps
    bool-wrapped hybrid for nested contexts; Lucene block-join does the
    child->parent rollup; the reference's ITs use ScoreMode.Total —
    HybridQueryIT.java:436-440, TextEmbeddingProcessorIT.java:130-135).

    Chunks become the scored corpus: BM25 stats (N, avgdl, df) are
    CHUNK-level, exactly as Lucene computes them over nested docs in the
    same index. One chunk explode feeds tokenize -> score; the rollup is
    one groupBy(parent) agg per ``score_mode``. Returns the FULL parent
    match set (doc_id, score), unrounded — callers cut/rank.

    ``operator="and"`` scores a CHUNK only if it contains every term
    (MatchQueryBuilder's Operator.AND applied to the inner query —
    conjunction is per nested doc, not per parent, exactly as Lucene
    evaluates the child query before the block-join rollup)."""
    from ..query.exhaustive import bm25_conjunctive, bm25_scores

    if score_mode not in NESTED_SCORE_MODES:
        raise ValueError(
            f"score_mode must be one of {sorted(NESTED_SCORE_MODES)}, "
            f"got [{score_mode}]")
    if operator not in ("or", "and"):
        raise ValueError(f"operator must be or|and, got [{operator}]")

    spark_chunks, _ = delimiter_chunks_sql(text_col, delimiter)
    chunks = docs.select(
        F.col(id_col).alias("parent_id"),
        F.posexplode(F.expr(spark_chunks)).alias("chunk_idx", "chunk_text"),
    ).select(
        # guard the arithmetic packing: a doc with >= BASE chunks would
        # silently collide into another parent's id space (and the
        # oracle shares the encoding, so parity could never catch it)
        F.when(
            F.col("chunk_idx") < F.lit(NESTED_CHUNK_ID_BASE),
            F.col("parent_id") * NESTED_CHUNK_ID_BASE + F.col("chunk_idx"),
        )
        .otherwise(
            F.raise_error(
                F.format_string(
                    "nested_chunk_topk: parent %s has >= %s chunks — "
                    "chunk_id packing would collide; raise "
                    "NESTED_CHUNK_ID_BASE or pre-chunk the document",
                    F.col("parent_id"),
                    F.lit(NESTED_CHUNK_ID_BASE),
                )
            ).cast("long")
        )
        .alias("chunk_id"),
        "chunk_text",
    )
    score_fn = bm25_conjunctive if operator == "and" else bm25_scores
    scored = score_fn(chunks, sorted(set(terms)), id_col="chunk_id",
                      text_col="chunk_text", round_to=None)
    agg = NESTED_SCORE_MODES[score_mode]
    return scored.groupBy(
        F.floor(F.col("doc_id") / NESTED_CHUNK_ID_BASE).cast("long").alias("doc_id")
    ).agg(agg("score").alias("score"))


def nested_sparse_scores(
    docs: DataFrame,
    query: dict[str, float],
    delimiter: str,
    score_mode: str = "max",
    top_m: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    weight_round_to: int = 4,
) -> DataFrame:
    """Nested + neural inner query, the reference's actual IT shape
    (TextEmbeddingProcessorIT.java:130-135 wraps a NeuralQueryBuilder
    in nestedQuery(ScoreMode.Total)): the ingest pipeline encodes each
    CHUNK (``nested_chunk_encode``'s deterministic stand-in model —
    per-chunk top-m length-normalized tf, weights rounded exactly as
    ingest writes them), the inner query scores chunks by the sparse
    linear product, and the block-join ScoreMode rolls chunk scores up
    to the parent. Full (doc_id, score) match set, unrounded.

    Plan shape: one posexplode + one (doc, chunk) encode aggregate
    (map-side partial) + one top-m window bounded per chunk + one
    parent rollup — nothing keyed on a skewed column."""
    if score_mode not in NESTED_SCORE_MODES:
        raise ValueError(
            f"score_mode must be one of {sorted(NESTED_SCORE_MODES)}, "
            f"got [{score_mode}]")
    if not query:
        return docs.sparkSession.createDataFrame([], "doc_id long, score double")
    spark_chunks, _ = delimiter_chunks_sql(text_col, delimiter)
    chunks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.expr(spark_chunks)).alias("chunk_idx", "chunk"),
    )
    feats = chunk_sparse_features(chunks, top_m=top_m, round_to=weight_round_to)
    qdf = F.create_map(
        *[x for t, v in sorted(query.items()) for x in (F.lit(t), F.lit(float(v)))]
    )
    chunk_scores = (
        feats.where(F.col("token").isin(list(query)))
        .withColumn("qw", F.element_at(qdf, F.col("token")))
        .groupBy("doc_id", "chunk_idx")
        .agg(F.sum(F.col("qw") * F.col("weight")).alias("score"))
    )
    agg = NESTED_SCORE_MODES[score_mode]
    return chunk_scores.groupBy("doc_id").agg(agg("score").alias("score"))


def nested_chunk_topk(
    docs: DataFrame,
    terms: list[str],
    delimiter: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
    score_mode: str = "max",
) -> DataFrame:
    """Deterministic top-k parents over ``nested_chunk_scores`` (the
    final cut is TakeOrderedAndProject; standard (score desc, doc_id
    asc) tiebreak)."""
    from pyspark.sql import Window

    rolled = nested_chunk_scores(docs, terms, delimiter,
                                 score_mode=score_mode,
                                 id_col=id_col, text_col=text_col)
    top = rolled.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.select(
        "doc_id",
        F.round("score", round_to).alias("score"),
        F.row_number().over(w).cast("int").alias("rank"),
    )
