"""DuckDB oracle SQL generators.

Each function returns ANSI SQL (DuckDB dialect) computing the same result
as the corresponding engine query in ``__spark_entry__.queries()``. The
BM25 math, the SmallFloat quantization ladder, and the tokenizer split
regex are shared with the Spark side (single source of truth in
functions/norms.py, functions/tokenize.py, query/bm25.py), so the
driver's side-by-side comparison exercises the real semantics.
"""

from __future__ import annotations

from .functions.norms import quantized_dl_sql
from .functions.tokenize import simple_tokens_sql
from .query.bm25 import B, K1, bm25_sql


def _terms_list(terms: list[str]) -> str:
    inner = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"({inner})"


def bm25_base_ctes(terms: list[str], table: str = "documents") -> str:
    """Shared CTE prefix: tokenize, stats, per-doc-term tf, df."""
    _, duck_toks = simple_tokens_sql("text")
    return f"""
WITH tok AS (
  SELECT doc_id, {duck_toks} AS toks FROM {table}
),
stats AS (
  SELECT count(*) AS N, sum(len(toks)) * 1.0 / count(*) AS avgdl FROM tok
),
tf AS (
  SELECT doc_id, dl, term, count(*) AS tf
  FROM (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM tok)
  WHERE term IN {_terms_list(terms)}
  GROUP BY doc_id, dl, term
),
dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
)"""


def bm25_scores_sql(
    terms: list[str],
    table: str = "documents",
    k1: float = K1,
    b: float = B,
    quantize: bool = True,
    round_to: int = 4,
) -> str:
    dl_expr = quantized_dl_sql("dl") if quantize else "dl"
    contrib = bm25_sql(tf="tf", dl_q=f"({dl_expr})", N="N", df="df", avgdl="avgdl", k1=k1, b=b)
    return f"""{bm25_base_ctes(terms, table)}
SELECT tf.doc_id AS doc_id, round(sum({contrib}), {round_to}) AS score
FROM tf JOIN dfreq USING (term), stats
GROUP BY tf.doc_id"""


def bm25_conjunctive_sql(
    terms: list[str],
    table: str = "documents",
    round_to: int = 4,
) -> str:
    uniq = sorted(set(terms))
    dl_expr = quantized_dl_sql("dl")
    contrib = bm25_sql(tf="tf", dl_q=f"({dl_expr})", N="N", df="df", avgdl="avgdl")
    return f"""{bm25_base_ctes(uniq, table)},
scored AS (
  SELECT tf.doc_id AS doc_id, sum({contrib}) AS score,
         count(DISTINCT tf.term) AS nt
  FROM tf JOIN dfreq USING (term), stats
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score, {round_to}) AS score
FROM scored WHERE nt = {len(uniq)}"""


def bm25_topk_sql(
    terms: list[str],
    k: int = 10,
    table: str = "documents",
    round_to: int = 4,
) -> str:
    dl_expr = quantized_dl_sql("dl")
    contrib = bm25_sql(tf="tf", dl_q=f"({dl_expr})", N="N", df="df", avgdl="avgdl")
    return f"""{bm25_base_ctes(terms, table)},
scored AS (
  SELECT tf.doc_id AS doc_id, sum({contrib}) AS score
  FROM tf JOIN dfreq USING (term), stats
  GROUP BY tf.doc_id
)
SELECT doc_id, round(scored.score, {round_to}) AS score,
       CAST(row_number() OVER (ORDER BY scored.score DESC, scored.doc_id ASC) AS INT) AS rank
FROM scored
ORDER BY scored.score DESC, scored.doc_id ASC
LIMIT {k}"""


def bm25_and_topk_sql(
    terms: list[str],
    k: int = 10,
    table: str = "documents",
    round_to: int = 4,
) -> str:
    uniq = sorted(set(terms))
    dl_expr = quantized_dl_sql("dl")
    contrib = bm25_sql(tf="tf", dl_q=f"({dl_expr})", N="N", df="df", avgdl="avgdl")
    return f"""{bm25_base_ctes(uniq, table)},
scored AS (
  SELECT tf.doc_id AS doc_id, sum({contrib}) AS score,
         count(DISTINCT tf.term) AS nt
  FROM tf JOIN dfreq USING (term), stats
  GROUP BY tf.doc_id
)
SELECT doc_id, round(scored.score, {round_to}) AS score,
       CAST(row_number() OVER (ORDER BY scored.score DESC, scored.doc_id ASC) AS INT) AS rank
FROM scored WHERE nt = {len(uniq)}
ORDER BY scored.score DESC, scored.doc_id ASC
LIMIT {k}"""


def doc_stats_sql(table: str = "documents") -> str:
    _, duck_toks = simple_tokens_sql("text")
    return f"""
SELECT count(*) AS n_docs,
       sum(len({duck_toks})) AS total_tokens,
       round(sum(len({duck_toks})) * 1.0 / count(*), 4) AS avgdl
FROM {table}"""


def term_stats_sql(min_df: int = 50, table: str = "documents") -> str:
    """Per-term df and collection tf for frequent terms (index parity)."""
    _, duck_toks = simple_tokens_sql("text")
    return f"""
WITH tok AS (SELECT doc_id, unnest({duck_toks}) AS term FROM {table})
SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf
FROM tok GROUP BY term HAVING count(DISTINCT doc_id) >= {min_df}"""
