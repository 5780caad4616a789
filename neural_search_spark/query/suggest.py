"""Term suggester (spell correction from the term dictionary).

Lucene/OpenSearch analog (public semantics): the ``suggest`` section's
``term`` suggester — for each analyzed input token, propose dictionary
terms within ``max_edits`` Levenshtein distance, ranked by similarity
then document frequency (``sort: score`` default), ``size`` per token;
``suggest_mode: missing`` (default) suggests only for tokens absent
from the dictionary, ``popular`` only terms more frequent than the
input, ``always`` for every token.

Determinism: Lucene's DirectSpellChecker ranks by a float string
similarity with internal tiebreaks; here the rank is the total order
(distance ASC, df DESC, term ASC) — distance is the integer Levenshtein
both engines compute identically, so the DuckDB oracle applies the
exact same cut.

Scale posture: candidate generation is a dictionary scan per distinct
input token (the same vocabulary-sized aggregate the multi-term
rewrites use — length-windowed before the O(len²) edit distance), never
a corpus scan; the output is ≤ tokens × size rows of query metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .exhaustive import tokenized

MAX_EDITS = 2
SUGGEST_SIZE = 5


def _dictionary(docs: DataFrame, id_col: str, text_col: str,
                analyzer: str) -> DataFrame:
    """(term, df): the term dictionary BOTH suggesters draw from, built
    with the caller's analyzer so suggestions exist in the same token
    stream the corpus is scored with."""
    tok = tokenized(docs, id_col, text_col, analyzer)
    return (
        tok.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )


def term_suggest(
    docs: DataFrame,
    text: str,
    size: int = SUGGEST_SIZE,
    max_edits: int = MAX_EDITS,
    suggest_mode: str = "missing",
    analyzer: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (token, suggestion, distance, freq, rank) — ``size`` ranked
    suggestions per analyzed input token (its own exact occurrence is
    never suggested)."""
    from ..functions.tokenize import analyze_query

    if max_edits not in (1, 2):
        raise ValueError(f"max_edits must be 1 or 2 (Lucene bound), got {max_edits}")
    if suggest_mode not in ("missing", "popular", "always"):
        raise ValueError(f"unknown suggest_mode [{suggest_mode}]")
    toks = sorted(set(analyze_query(text, analyzer or "simple")))
    if not toks:
        raise ValueError("suggest text analyzed to zero tokens")
    spark = docs.sparkSession
    dictionary = _dictionary(docs, id_col, text_col, analyzer or "simple")
    inputs = spark.createDataFrame([(t,) for t in toks], ["token"])
    # input df (0 when absent) for the missing/popular gates
    in_df = (
        inputs.join(dictionary.withColumnRenamed("term", "token"), "token", "left")
        .select("token", F.coalesce("df", F.lit(0)).alias("token_df"))
    )
    # length window prefilter, then exact Levenshtein — the same
    # two-step both engines run (multiterm._matcher_sql's fuzzy shape)
    cand = (
        in_df.crossJoin(dictionary)
        .where(
            (F.length("term") >= F.length("token") - max_edits)
            & (F.length("term") <= F.length("token") + max_edits)
            & (F.col("term") != F.col("token"))
        )
        .withColumn("distance", F.levenshtein("token", "term"))
        .where(F.col("distance") <= max_edits)
    )
    if suggest_mode == "missing":
        cand = cand.where(F.col("token_df") == 0)
    elif suggest_mode == "popular":
        cand = cand.where(F.col("df") > F.col("token_df"))
    w = Window.partitionBy("token").orderBy(
        F.col("distance").asc(), F.col("df").desc(), F.col("term").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= size)
        .select("token", F.col("term").alias("suggestion"),
                F.col("distance").cast("int").alias("distance"),
                F.col("df").cast("long").alias("freq"), "rank")
        .orderBy("token", "rank")
    )


def completion_suggest(
    docs: DataFrame,
    prefix: str | None = None,
    matcher: str | None = None,
    size: int = SUGGEST_SIZE,
    analyzer: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Completion suggester analog → (suggestion, weight, rank).

    OpenSearch's completion suggester matches a prefix (or regex)
    against a dedicated completion field's FST and returns entries by
    weight. The corpus here carries no separate completion field, so
    the term DICTIONARY stands in for it and document frequency is the
    weight — the prefix/regex matching and the (weight DESC, suggestion
    ASC) cut are the suggester's semantics on that input. ``matcher``
    is a prebuilt shared-SQL predicate over ``term`` (the regex mode,
    via multiterm.regexp_matcher); otherwise ``prefix`` builds the LIKE
    matcher. Integer weights, total tiebreak — both engines cut
    identically."""
    from .multiterm import _matcher_sql, like_escape

    if (prefix is None) == (matcher is None):
        raise ValueError("exactly one of prefix= / matcher= is required")
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    if matcher is None:
        if not isinstance(prefix, str) or not prefix:
            raise ValueError("prefix must be a non-empty string")
        matcher = _matcher_sql(like=like_escape(prefix) + "%")
    dictionary = _dictionary(docs, id_col, text_col, analyzer or "simple")
    w = Window.orderBy(F.col("df").desc(), F.col("term").asc())
    return (
        dictionary.where(F.expr(matcher))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= size)
        .select(F.col("term").alias("suggestion"),
                F.col("df").cast("long").alias("weight"), "rank")
        .orderBy("rank")
    )
