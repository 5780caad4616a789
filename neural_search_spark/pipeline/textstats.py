"""Text analysis operators: language ID, quality scoring, token counts,
document fingerprinting.

Everything is built from JVM-side SQL expressions (regexp counts,
higher-order array functions) — no Python in the plan — and every
expression has a DuckDB twin in ``pipeline/oracle.py`` generated from the
same constants, so the driver hash-compare covers the real formulas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import simple_tokens_sql
from .hashing import hash64_sql, shingles_sql

# Tiny deterministic stopword lists per language — the n-gram/stopword
# heuristic standard for cheap language ID (public CLD-style approach).
LANG_WORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
}
STOPWORDS = LANG_WORDS["en"]

# BPE-ish pre-tokenizer: letter runs | single digits | single punct.
BPE_ISH_RE = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"
WS_RE = "\\s+"
PUNCT_RE = "[^a-zA-Z0-9\\s]"
WINNOW_N = 5  # winnowing shingle width for the rolling-hash fingerprint


def _spark_re(pattern: str) -> str:
    """Escape a regex for embedding in a Spark SQL string literal —
    Spark's parser consumes backslash escapes inside literals (DuckDB
    doesn't), so the dialects need different quoting of the same regex."""
    return pattern.replace("\\", "\\\\")


def _in_list(col: str, words: list[str]) -> str:
    inner = ", ".join("'" + w + "'" for w in words)
    return f"size(filter({col}, x -> x IN ({inner})))"


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_ws_tokens, n_bpe_tokens): analyzer tokens,
    whitespace tokens, and BPE-ish pre-tokens per document."""
    spark_toks, _ = simple_tokens_sql(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"size({spark_toks})").alias("n_tokens"),
        F.expr(f"size(filter(split({text_col}, '{_spark_re(WS_RE)}'), x -> x <> ''))").alias(
            "n_ws_tokens"
        ),
        F.expr(f"size(regexp_extract_all({text_col}, '{_spark_re(BPE_ISH_RE)}', 0))").alias(
            "n_bpe_tokens"
        ),
    )


def quality_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_tokens, avg_token_len, stopword_ratio,
    punct_ratio, digit_ratio, quality): length/punct/stopword heuristics
    with a composite [0,1] quality score (public C4/Gopher-style rules)."""
    spark_toks, _ = simple_tokens_sql(text_col)
    toks = f"({spark_toks})"
    n_tok = f"size({toks})"
    tok_chars = f"aggregate(transform({toks}, x -> length(x)), 0L, (acc, x) -> acc + x)"
    n_chars = f"length({text_col})"
    n_punct = f"size(regexp_extract_all({text_col}, '{_spark_re(PUNCT_RE)}', 0))"
    n_digit = f"size(regexp_extract_all({text_col}, '[0-9]', 0))"
    stop_hits = _in_list(toks, STOPWORDS)
    # Spark parses bare decimal literals (1.0) as DECIMAL and does decimal
    # division; force float64 by casting the numerator — so results (and
    # the driver's value hash) match DuckDB's float64 arithmetic exactly.
    avg_len = f"CAST({tok_chars} AS DOUBLE) / greatest({n_tok}, 1)"
    stop_ratio = f"CAST({stop_hits} AS DOUBLE) / greatest({n_tok}, 1)"
    punct_ratio = f"CAST({n_punct} AS DOUBLE) / greatest({n_chars}, 1)"
    digit_ratio = f"CAST({n_digit} AS DOUBLE) / greatest({n_tok}, 1)"
    quality = (
        f"least(CAST(1.0 AS DOUBLE), CAST({n_tok} AS DOUBLE) / 50.0)"
        f" * least(CAST(1.0 AS DOUBLE), 4.0 * {stop_ratio} + 0.2)"
        f" * (CAST(1.0 AS DOUBLE) - least(CAST(1.0 AS DOUBLE), 2.0 * {punct_ratio}))"
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.expr(n_chars).cast("long").alias("n_chars"),
        F.expr(n_tok).cast("long").alias("n_tokens"),
        F.round(F.expr(avg_len), 4).alias("avg_token_len"),
        F.round(F.expr(stop_ratio), 4).alias("stopword_ratio"),
        F.round(F.expr(punct_ratio), 4).alias("punct_ratio"),
        F.round(F.expr(digit_ratio), 4).alias("digit_ratio"),
        F.round(F.expr(quality), 4).alias("quality"),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, hits_en, hits_de, hits_fr, lang_pred): stopword-hit
    language ID; 'und' (undetermined) when no list scores > 0. Ties break
    in fixed en > de > fr order."""
    spark_toks, _ = simple_tokens_sql(text_col)
    toks = f"({spark_toks})"
    hits = {lg: _in_list(toks, ws) for lg, ws in LANG_WORDS.items()}
    pred = (
        f"CASE WHEN greatest({hits['en']}, {hits['de']}, {hits['fr']}) = 0 THEN 'und' "
        f"WHEN {hits['en']} >= {hits['de']} AND {hits['en']} >= {hits['fr']} THEN 'en' "
        f"WHEN {hits['de']} >= {hits['fr']} THEN 'de' ELSE 'fr' END"
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.expr(hits["en"]).cast("long").alias("hits_en"),
        F.expr(hits["de"]).cast("long").alias("hits_de"),
        F.expr(hits["fr"]).cast("long").alias("hits_fr"),
        F.expr(pred).alias("lang_pred"),
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, fp_exact, fp_tokenset, fp_winnow): exact-content md5,
    order-insensitive token-set md5, and a winnowing-style rolling-hash
    fingerprint (min 56-bit hash over {WINNOW_N}-token shingles)."""
    spark_toks, _ = simple_tokens_sql(text_col)
    t = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"),
                    F.expr(spark_toks).alias("toks"))
    sh_spark, _ = shingles_sql("toks", WINNOW_N)
    h_spark, _ = hash64_sql("x")
    winnow = (
        f"CASE WHEN size({sh_spark}) = 0 THEN CAST(-1 AS BIGINT) "
        f"ELSE array_min(transform({sh_spark}, x -> {h_spark})) END"
    )
    return t.select(
        "doc_id",
        F.md5("text").alias("fp_exact"),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct("toks")))).alias("fp_tokenset"),
        F.expr(winnow).alias("fp_winnow"),
    )


def repetition_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, top_unigram_frac, top_bigram_frac, dup_trigram_frac):
    repetition-based quality signals, the token-level analogs of the
    published Gopher/C4 repetition filters (fraction of content owned
    by the most frequent n-gram; fraction of n-gram occurrences that
    are repeats). High values flag boilerplate/degenerate docs for the
    training-data pipeline. All JVM-side: tokenize → n-gram transform →
    groupBy-free aggregates via higher-order functions (per-doc arrays
    stay inside one task — no shuffle at all)."""
    spark_toks, _ = simple_tokens_sql(text_col)
    spark_tri_all = (
        "(CASE WHEN size(toks) >= 3 THEN "
        "transform(sequence(0, size(toks) - 3), i -> "
        "concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])) "
        "ELSE array() END)"
    )
    # max multiplicity of an element of arr, computed without explode:
    # count each element's occurrences via filter, take array_max
    def top_count(arr: str) -> str:
        return (
            f"(CASE WHEN size({arr}) = 0 THEN 0 ELSE "
            f"array_max(transform(array_distinct({arr}), d -> "
            f"size(filter({arr}, x -> x = d)))) END)"
        )

    tok = docs.select(F.col(id_col).alias("doc_id"), F.expr(spark_toks).alias("toks"))
    bi_all = (
        "(CASE WHEN size(toks) >= 2 THEN "
        "transform(sequence(0, size(toks) - 2), i -> concat_ws(' ', toks[i], toks[i + 1])) "
        "ELSE array() END)"
    )
    out = tok.select(
        "doc_id",
        F.col("toks"),
        F.expr(bi_all).alias("bis"),
        F.expr(spark_tri_all).alias("tris"),
    )
    return out.select(
        "doc_id",
        F.round(
            F.expr(top_count("toks")) / F.greatest(F.size("toks"), F.lit(1)), 4
        ).alias("top_unigram_frac"),
        F.round(
            F.expr(top_count("bis")) / F.greatest(F.size("bis"), F.lit(1)), 4
        ).alias("top_bigram_frac"),
        F.round(
            (F.size("tris") - F.size(F.array_distinct("tris")))
            / F.greatest(F.size("tris"), F.lit(1)),
            4,
        ).alias("dup_trigram_frac"),
    )


def unigram_logprob(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, mean_logprob): per-doc mean log-probability
    under a unigram LM trained on the corpus itself — the CCNet-style
    perplexity filter reduced to its SQL-expressible core (low
    mean_logprob = tokens unusual for the corpus → candidate junk; high
    = boilerplate). Add-one smoothing over the observed vocabulary.

    Shape at 100 TB: the LM is ONE token-frequency aggregate (map-side
    combined) joined back per token occurrence — the frequency table is
    vocabulary-sized (broadcastable for real corpora after a min-count
    cut); no Python anywhere."""
    spark_toks, _ = simple_tokens_sql(text_col)
    tok = docs.select(F.col(id_col).alias("doc_id"), F.expr(spark_toks).alias("toks")).select(
        "doc_id", F.explode("toks").alias("token")
    )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cf"))
    totals = freq.agg(
        F.sum("cf").alias("corpus_tokens"), F.count(F.lit(1)).alias("vocab")
    )
    # p(t) = (cf + 1) / (corpus_tokens + vocab); all-integer inputs so
    # the double math is order-independent and oracle-exact
    scored = (
        tok.join(freq, "token")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "lp",
            F.log((F.col("cf") + 1).cast("double") / (F.col("corpus_tokens") + F.col("vocab")).cast("double")),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("lp"), 4).alias("mean_logprob"),
        )
    )
