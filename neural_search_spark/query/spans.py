"""Lucene span queries as window-function dataflow.

The reference accepts any core OpenSearch query type as a hybrid
sub-query (`HybridQueryBuilder` parses arbitrary inner builders,
query/HybridQueryBuilder.java:219-252), so the span family —
`span_term`, `span_or`, `span_near`, `span_first`, `span_not`,
`span_multi` — completes the sub-query space the DSL translator
exposes.

Match semantics follow the modern (Lucene 5.3+) span iterators, which
enumerate per-position with monotone sub-pointers and NO backtracking:

* ordered ``span_near`` (NearSpansOrdered.nextStartPosition): for each
  position ``a`` of the FIRST clause, stretch the remaining clauses
  forward — ``e_i`` = the least clause-``i`` position after ``e_{i-1}``
  — and match iff the total inter-clause gap
  ``e_last - a - (n_clauses - 1)`` is <= ``slop``. Every first-clause
  position yields at most one match; matches may overlap.
* unordered ``span_near`` (NearSpansUnordered: a start-ordered queue
  whose minimum is advanced after every window): for each position
  ``s`` of EITHER clause, pair it with the least other-clause position
  after ``s``; match iff the gap is <= ``slop``. Two clauses only —
  exactly the queue semantics; wider unordered nears are rejected
  upstream.
* ``span_first`` keeps spans with ``endPosition() <= end``
  (SpanPositionRangeQuery with start 0).
* ``span_not`` drops include spans that overlap an exclude span
  expanded by ``pre`` before and ``post`` after (SpanNotQuery):
  a single-token exclude at ``q`` kills an include token at ``p`` iff
  ``p - pre <= q <= p + post``.

Scoring follows SpanScorer.setFreqCurrentDoc (Lucene 8+ accumulation):
every accepted span contributes ``1 / (1 + matchLength)`` with
``matchLength = endPosition - startPosition`` (so a single-token span
contributes 1/2 — span_term deliberately scores BELOW the equivalent
term query, the documented Lucene behavior), and the document score is

    score = idf_total * freq / (freq + k1*(1 - b + b*dl_q/avgdl))

with ``idf_total`` the sum of BM25 idf over every term in the span
tree that exists in the corpus (SpanWeight builds one simWeight from
all gathered termStates) and ``dl_q`` the SmallFloat-quantized length.
For ``span_not`` the idf sum covers the include tree only.

Every step is JVM-side: one posexplode over the tokenized corpus
filtered to the query's term universe (a few hundred rows per matched
doc at most), then per-doc window functions — no Python UDF, no
driver-side loop, and the shuffles are partitioned by doc_id so the
plan scales with corpus partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.norms import quantized_dl_sql
from .bm25 import B, K1
from .exhaustive import tokenized

__all__ = [
    "span_near_scores",
    "span_set_scores",
    "span_not_scores",
]

MAX_ORDERED_CLAUSES = 4


def _clause_map(clause_terms: list[list[str]]) -> dict[str, int]:
    """term -> clause index; a term in two clauses would make the
    position tagging ambiguous (and Lucene's per-clause iterators would
    share postings) — rejected upstream with a clear error."""
    out: dict[str, int] = {}
    for i, terms in enumerate(clause_terms):
        if not terms:
            raise ValueError(f"span clause {i} has no terms")
        for t in terms:
            if t in out and out[t] != i:
                raise ValueError(
                    f"term [{t}] appears in two span_near clauses; "
                    "clause term sets must be disjoint")
            out[t] = i
    return out


def _pos_frame(tok: DataFrame, term_clause: dict[str, int]) -> DataFrame:
    """(doc_id, dl, p, c): every occurrence of a query term, tagged with
    its clause index. One corpus traversal for the whole span tree."""
    mapping = F.create_map(
        *[F.lit(x) for t in sorted(term_clause) for x in (t, term_clause[t])]
    )
    return (
        tok.select("doc_id", "dl", F.posexplode("toks").alias("p", "term"))
        .where(F.col("term").isin(list(term_clause)))
        .withColumn("c", mapping[F.col("term")])
        .select("doc_id", "dl", "p", "c")
    )


def _score_matches(
    tok: DataFrame,
    matches: DataFrame,
    idf_terms: list[str],
    k1: float,
    b: float,
    quantize: bool,
    round_to: int | None,
) -> DataFrame:
    """matches(doc_id, dl, mlen) -> (doc_id, score). freq is the
    slop-adjusted sum; idf_total sums over the tree's corpus-present
    terms (absent terms carry no termStates in Lucene either)."""
    stats = tok.agg(
        F.count(F.lit(1)).alias("N"),
        (F.sum("dl") * F.lit(1.0) / F.count(F.lit(1))).alias("avgdl"),
    )
    dfreq = (
        tok.select("doc_id", F.explode("toks").alias("term"))
        .where(F.col("term").isin(idf_terms))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    idf_tot = (
        dfreq.crossJoin(F.broadcast(stats))
        .agg(F.coalesce(
            F.sum(F.expr("ln(1.0 + (N - df + 0.5) / (df + 0.5))")),
            F.lit(0.0)).alias("idf_total"))
    )
    freq = matches.groupBy("doc_id", "dl").agg(
        F.sum(F.lit(1.0) / (F.lit(1.0) + F.col("mlen"))).alias("freq")
    )
    dl_expr = quantized_dl_sql("dl") if quantize else "dl"
    scored = (
        freq.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(idf_tot))
        .withColumn(
            "score",
            F.expr(
                f"idf_total * (freq / (freq + {k1!r} * "
                f"(1.0 - {b!r} + {b!r} * ({dl_expr}) / avgdl)))"
            ),
        )
        .select("doc_id", "score")
    )
    if round_to is not None:
        scored = scored.withColumn("score", F.round("score", round_to))
    return scored


def span_near_scores(
    docs: DataFrame,
    clause_terms: list[list[str]],
    slop: int = 0,
    in_order: bool = True,
    max_end: int | None = None,
    analyzer: str = "simple",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    quantize: bool = True,
    round_to: int | None = None,
) -> DataFrame:
    """(doc_id, score) for a span_near whose clauses are position SETS
    (span_term -> one term; span_or / span_multi -> several). ``max_end``
    applies a wrapping span_first (endPosition <= max_end, 0-based
    positions so a match ending at token index e has endPosition e+1)."""
    n = len(clause_terms)
    if n < 2:
        raise ValueError("span_near needs >= 2 clauses")
    if in_order and n > MAX_ORDERED_CLAUSES:
        raise ValueError(
            f"ordered span_near supports at most {MAX_ORDERED_CLAUSES} "
            f"clauses, got {n}")
    if not in_order and n != 2:
        raise ValueError("unordered span_near supports exactly 2 clauses")
    if slop < 0:
        raise ValueError(f"slop must be >= 0, got {slop}")
    term_clause = _clause_map(clause_terms)
    tok = tokenized(docs, id_col, text_col, analyzer)
    pos = _pos_frame(tok, term_clause)
    matches = (
        _ordered_matches(pos, n, slop)
        if in_order
        else _unordered_matches(pos, slop)
    )
    if max_end is not None:
        # a wrapping span_first: keep spans with endPosition <= end
        matches = matches.where(F.col("e") + 1 <= F.lit(max_end))
    return _score_matches(tok, matches.select("doc_id", "dl", "mlen"),
                          sorted(term_clause), k1, b, quantize, round_to)


def _ordered_matches(pos: DataFrame, n: int, slop: int) -> DataFrame:
    """Per first-clause position: chain each later clause to its least
    position after the running end. Chaining step i is one union + one
    per-doc window (min following clause-i position) — the DataFrame
    analog of NearSpansOrdered's monotone sub-pointers. Returns
    (doc_id, dl, e, mlen) with e the 0-based last token index."""
    cur = pos.where(F.col("c") == 0).select(
        "doc_id", "dl", F.col("p").alias("a"), F.col("p").alias("e")
    )
    for i in range(1, n):
        chain = cur.select(
            "doc_id", "dl", "a", F.col("e").alias("k"),
            F.lit(1).alias("is_chain"),
        )
        nxt = pos.where(F.col("c") == i).select(
            "doc_id",
            F.lit(None).cast("int").alias("dl"),
            F.lit(None).cast("int").alias("a"),
            F.col("p").alias("k"),
            F.lit(0).alias("is_chain"),
        )
        # clause position sets are disjoint, so a pos row never ties a
        # chain row on k; ties among chain rows (two starts sharing one
        # chained end) don't affect the min over strictly-greater pos
        # rows, keeping the ROWS frame deterministic
        wf = (
            Window.partitionBy("doc_id")
            .orderBy(F.col("k").asc(), F.col("is_chain").asc())
            .rowsBetween(1, Window.unboundedFollowing)
        )
        cur = (
            chain.unionByName(nxt)
            .withColumn(
                "e2",
                F.min(F.when(F.col("is_chain") == 0, F.col("k"))).over(wf),
            )
            .where((F.col("is_chain") == 1) & F.col("e2").isNotNull())
            .select("doc_id", "dl", "a", F.col("e2").alias("e"))
        )
    return cur.where(
        F.col("e") - F.col("a") - F.lit(n - 1) <= F.lit(slop)
    ).select("doc_id", "dl", "e", (F.col("e") + 1 - F.col("a")).alias("mlen"))


def _unordered_matches(pos: DataFrame, slop: int) -> DataFrame:
    """Two-clause unordered: every tagged position pairs with the least
    other-clause position after it (the queue's min-start advance).
    Returns (doc_id, dl, e, mlen)."""
    wf = (
        Window.partitionBy("doc_id")
        .orderBy(F.col("p").asc())
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nxt0 = F.min(F.when(F.col("c") == 0, F.col("p"))).over(wf)
    nxt1 = F.min(F.when(F.col("c") == 1, F.col("p"))).over(wf)
    return (
        pos.withColumn("o", F.when(F.col("c") == 0, nxt1).otherwise(nxt0))
        .where(
            F.col("o").isNotNull()
            & (F.col("o") - F.col("p") - 1 <= F.lit(slop))
        )
        .select("doc_id", "dl", F.col("o").alias("e"),
                (F.col("o") + 1 - F.col("p")).alias("mlen"))
    )


def span_set_scores(
    docs: DataFrame,
    terms: list[str],
    max_end: int | None = None,
    analyzer: str = "simple",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    quantize: bool = True,
    round_to: int | None = None,
) -> DataFrame:
    """span_term (one term), span_or / span_multi (several terms), each
    optionally wrapped in span_first via ``max_end``: every occurrence
    is a width-1 span contributing 1/2 to freq."""
    if not terms:
        raise ValueError("span term set is empty")
    tok = tokenized(docs, id_col, text_col, analyzer)
    pos = _pos_frame(tok, {t: 0 for t in terms})
    if max_end is not None:
        pos = pos.where(F.col("p") + 1 <= F.lit(max_end))
    matches = pos.select("doc_id", "dl", F.lit(1).alias("mlen"))
    return _score_matches(tok, matches, sorted(set(terms)), k1, b,
                          quantize, round_to)


def span_not_scores(
    docs: DataFrame,
    include_terms: list[str],
    exclude_terms: list[str],
    pre: int = 0,
    post: int = 0,
    analyzer: str = "simple",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    quantize: bool = True,
    round_to: int | None = None,
) -> DataFrame:
    """SpanNotQuery over single-token include/exclude sets: an include
    occurrence at p survives iff no exclude occurrence q satisfies
    p - pre <= q <= p + post. idf covers the include tree only."""
    if not include_terms or not exclude_terms:
        raise ValueError("span_not needs include and exclude terms")
    if pre < 0 or post < 0:
        raise ValueError(f"pre/post must be >= 0, got {pre}/{post}")
    overlap = set(include_terms) & set(exclude_terms)
    if overlap:
        raise ValueError(
            f"include/exclude term sets overlap: {sorted(overlap)}")
    term_clause = {t: 0 for t in include_terms}
    term_clause.update({t: 1 for t in exclude_terms})
    tok = tokenized(docs, id_col, text_col, analyzer)
    pos = _pos_frame(tok, term_clause)
    wb = (
        Window.partitionBy("doc_id")
        .orderBy(F.col("p").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wf = (
        Window.partitionBy("doc_id")
        .orderBy(F.col("p").asc())
        .rowsBetween(1, Window.unboundedFollowing)
    )
    prev_x = F.max(F.when(F.col("c") == 1, F.col("p"))).over(wb)
    next_x = F.min(F.when(F.col("c") == 1, F.col("p"))).over(wf)
    matches = (
        pos.withColumn("prev_x", prev_x)
        .withColumn("next_x", next_x)
        .where(
            (F.col("c") == 0)
            & (F.col("prev_x").isNull()
               | (F.col("prev_x") < F.col("p") - F.lit(pre)))
            & (F.col("next_x").isNull()
               | (F.col("next_x") > F.col("p") + F.lit(post)))
        )
        .select("doc_id", "dl", F.lit(1).alias("mlen"))
    )
    return _score_matches(tok, matches, sorted(set(include_terms)), k1, b,
                          quantize, round_to)


def span_contain_scores(
    docs: DataFrame,
    big_clause_terms: list[list[str]],
    little_terms: list[str],
    slop: int = 0,
    within: bool = False,
    analyzer: str = "simple",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    quantize: bool = True,
    round_to: int | None = None,
) -> DataFrame:
    """SpanContainingQuery / SpanWithinQuery over an ordered span_near
    "big" (single-position clauses) and a single-token "little" set.

    * containing (within=False): the BIG spans that contain a little
      occurrence (big.start <= q <= big.end) survive and score with
      their own matchLength — freq = sum over surviving big spans of
      1/(1 + matchLength); idf covers the big tree.
    * within (within=True): the LITTLE occurrences inside some big
      span survive (single-token spans, 1/2 each); idf covers the
      little set.

    The containment probe is a per-doc equi-join on doc_id with a range
    filter — co-partitioned by doc_id, cardinality bounded by the two
    match streams, never a corpus product."""
    if len(big_clause_terms) < 2:
        raise ValueError("span_containing/within needs a span_near big "
                         "with >= 2 clauses")
    if len(big_clause_terms) > MAX_ORDERED_CLAUSES:
        raise ValueError(
            f"big span_near supports at most {MAX_ORDERED_CLAUSES} clauses")
    if not little_terms:
        raise ValueError("little span term set is empty")
    if slop < 0:
        raise ValueError(f"slop must be >= 0, got {slop}")
    big_map = _clause_map(big_clause_terms)
    overlap = set(big_map) & set(little_terms)
    if overlap:
        raise ValueError(
            f"big/little term sets overlap: {sorted(overlap)}")
    tok = tokenized(docs, id_col, text_col, analyzer)
    pos_all = _pos_frame(tok, {**big_map,
                               **{t: len(big_clause_terms)
                                  for t in little_terms}})
    pos_big = pos_all.where(F.col("c") < len(big_clause_terms))
    little = (
        pos_all.where(F.col("c") == len(big_clause_terms))
        .select("doc_id", "dl", F.col("p").alias("q"))
    )
    big = _ordered_matches(pos_big, len(big_clause_terms), slop).select(
        "doc_id", "dl", "e", "mlen",
        (F.col("e") + 1 - F.col("mlen")).alias("a"),
    )
    if within:
        big_iv = big.select(F.col("doc_id").alias("bdoc"),
                            F.col("a").alias("ba"), F.col("e").alias("be"))
        matches = little.join(
            big_iv,
            on=[F.col("doc_id") == F.col("bdoc"),
                F.col("q") >= F.col("ba"), F.col("q") <= F.col("be")],
            how="leftsemi",
        ).select("doc_id", "dl", F.lit(1).alias("mlen"))
        idf_terms = sorted(set(little_terms))
    else:
        little_iv = little.select(F.col("doc_id").alias("ldoc"),
                                  F.col("q"))
        matches = big.join(
            little_iv,
            on=[F.col("doc_id") == F.col("ldoc"),
                F.col("q") >= F.col("a"), F.col("q") <= F.col("e")],
            how="leftsemi",
        ).select("doc_id", "dl", "mlen")
        idf_terms = sorted(big_map)
    return _score_matches(tok, matches, idf_terms, k1, b, quantize,
                          round_to)
