"""Span query family (query/spans.py + the DSL surface).

Three layers of evidence:
* a brute-force Python reference implementing the modern Lucene span
  iterators (per-first-clause ordered stretch; min-start-queue
  unordered pairing) scores hand-written and seeded-random corpora —
  the engine must match exactly;
* hand-computed fixtures pin the enumeration edge cases (overlap,
  slop-excluded stretch, pre/post exclusion windows, span_first cuts);
* the DuckDB oracle builders replay the same windows in SQL and must
  match the engine on the real test corpus (value-level; the registry
  rows re-run this at sf0.01 via tests/test_entry.py).
"""

import math

import numpy as np
import pytest

from neural_search_spark.functions.norms import quantize_length
from neural_search_spark.query.dsl import DslError, SearchContext, search
from neural_search_spark.query.spans import (
    span_near_scores,
    span_not_scores,
    span_set_scores,
)

K1, B = 1.2, 0.75


# ---------------------------------------------------------------- reference

def ref_near_matches(tokens, clause_sets, slop, in_order):
    """(start, end) pairs per the modern Lucene span iterators."""
    pos = [(i, ci) for i, t in enumerate(tokens)
           for ci, s in enumerate(clause_sets) if t in s]
    out = []
    if in_order:
        for a, ci in pos:
            if ci != 0:
                continue
            e, ok = a, True
            for i in range(1, len(clause_sets)):
                nxts = [p for p, c in pos if c == i and p > e]
                if not nxts:
                    ok = False
                    break
                e = min(nxts)
            if ok and e - a - (len(clause_sets) - 1) <= slop:
                out.append((a, e))
    else:
        for s, ci in pos:
            others = [p for p, c in pos if c != ci and p > s]
            if others and min(others) - s - 1 <= slop:
                out.append((s, min(others)))
    return out


class RefScorer:
    def __init__(self, corpus):
        self.toks = {d: t.split() for d, t in corpus}
        self.N = len(self.toks)
        self.avgdl = sum(len(v) for v in self.toks.values()) / self.N

    def idf(self, terms):
        tot = 0.0
        for t in sorted(set(terms)):
            df = sum(1 for v in self.toks.values() if t in v)
            if df:
                tot += math.log(1.0 + (self.N - df + 0.5) / (df + 0.5))
        return tot

    def score(self, d, freq, idf_terms):
        dlq = float(quantize_length(np.array([len(self.toks[d])]))[0])
        return self.idf(idf_terms) * freq / (
            freq + K1 * (1 - B + B * dlq / self.avgdl))

    def near(self, clause_sets, slop, in_order):
        allt = [t for s in clause_sets for t in s]
        exp = {}
        for d, tk in self.toks.items():
            m = ref_near_matches(tk, clause_sets, slop, in_order)
            if m:
                freq = sum(1.0 / (1.0 + e + 1 - a) for a, e in m)
                exp[d] = round(self.score(d, freq, allt), 6)
        return exp

    def span_set(self, terms, max_end=None):
        exp = {}
        for d, tk in self.toks.items():
            c = sum(1 for i, t in enumerate(tk) if t in terms
                    and (max_end is None or i + 1 <= max_end))
            if c:
                exp[d] = round(self.score(d, c * 0.5, terms), 6)
        return exp

    def span_not(self, include, exclude, pre, post):
        exp = {}
        for d, tk in self.toks.items():
            xs = [i for i, t in enumerate(tk) if t in exclude]
            c = sum(1 for i, t in enumerate(tk) if t in include
                    and not any(i - pre <= q <= i + post for q in xs))
            if c:
                exp[d] = round(self.score(d, c * 0.5, include), 6)
        return exp


HAND_CORPUS = [
    (0, "alpha beta gamma alpha delta beta"),
    (1, "beta alpha alpha beta gamma"),
    (2, "gamma delta epsilon"),
    (3, "alpha gamma gamma beta alpha beta alpha"),
    (4, "beta beta alpha"),
]


@pytest.fixture(scope="module")
def hand_docs(spark):
    return spark.createDataFrame(HAND_CORPUS, ["doc_id", "text"])


def _collect(df):
    return {r["doc_id"]: round(r["score"], 6) for r in df.collect()}


# ------------------------------------------------- engine vs reference

NEAR_CASES = [
    ([["alpha"], ["beta"]], 0, True),
    ([["alpha"], ["beta"]], 2, True),
    ([["alpha"], ["beta"]], 1, False),
    ([["alpha"], ["beta"]], 0, False),
    ([["alpha"], ["gamma"], ["beta"]], 3, True),
    ([["alpha", "delta"], ["beta"]], 1, True),
    ([["beta"], ["epsilon"]], 5, True),  # epsilon: df 1, no co-occurrence
]


@pytest.mark.parametrize("clauses,slop,in_order", NEAR_CASES)
def test_near_matches_reference(hand_docs, clauses, slop, in_order):
    ref = RefScorer(HAND_CORPUS)
    got = _collect(span_near_scores(hand_docs, clauses, slop=slop,
                                    in_order=in_order, round_to=6))
    assert got == ref.near(clauses, slop, in_order)


def test_span_set_and_first_match_reference(hand_docs):
    ref = RefScorer(HAND_CORPUS)
    got = _collect(span_set_scores(hand_docs, ["alpha", "delta"], round_to=6))
    assert got == ref.span_set(["alpha", "delta"])
    got = _collect(span_set_scores(hand_docs, ["alpha", "delta"],
                                   max_end=3, round_to=6))
    assert got == ref.span_set(["alpha", "delta"], max_end=3)


def test_span_not_matches_reference(hand_docs):
    ref = RefScorer(HAND_CORPUS)
    got = _collect(span_not_scores(hand_docs, ["alpha"], ["gamma"],
                                   pre=1, post=1, round_to=6))
    assert got == ref.span_not(["alpha"], ["gamma"], 1, 1)
    # asymmetric window
    got = _collect(span_not_scores(hand_docs, ["beta"], ["delta"],
                                   pre=0, post=2, round_to=6))
    assert got == ref.span_not(["beta"], ["delta"], 0, 2)


def test_near_random_corpora_match_reference(spark):
    rng = np.random.default_rng(45021)
    vocab = list("abcdefg")
    for trial in range(3):
        corpus = [
            (d, " ".join(rng.choice(vocab, size=rng.integers(3, 25))))
            for d in range(30)
        ]
        docs = spark.createDataFrame(corpus, ["doc_id", "text"])
        ref = RefScorer(corpus)
        for clauses, slop, in_order in (
            ([["a"], ["b"]], int(rng.integers(0, 4)), True),
            ([["a", "c"], ["b"]], int(rng.integers(0, 4)), False),
            ([["a"], ["b"], ["c"]], int(rng.integers(0, 6)), True),
            ([["a"], ["b"], ["c"], ["d"]], 8, True),
        ):
            got = _collect(span_near_scores(docs, clauses, slop=slop,
                                            in_order=in_order, round_to=6))
            assert got == ref.near(clauses, slop, in_order), (
                trial, clauses, slop, in_order)


# ------------------------------------------------------ hand-pinned cases

def test_ordered_enumeration_is_per_first_clause_position(spark):
    # alpha at 0 and 1 both match beta at 2 (no shrink, overlap allowed):
    # spans (0,2) mlen 3 and (1,2) mlen 2 -> freq = 1/4 + 1/3
    docs = spark.createDataFrame([(0, "alpha alpha beta")], ["doc_id", "text"])
    ref = RefScorer([(0, "alpha alpha beta")])
    got = _collect(span_near_scores(docs, [["alpha"], ["beta"]], slop=2,
                                    round_to=6))
    freq = 1.0 / 4 + 1.0 / 3
    assert got == {0: round(ref.score(0, freq, ["alpha", "beta"]), 6)}


def test_ordered_stretch_skips_consumed_positions(spark):
    # beta at 1 pairs with the LEAST alpha after it (2); beta at 4 has
    # no later alpha -> exactly one span (1,2), matchLength 2 -> 1/3
    docs = spark.createDataFrame([(0, "alpha beta alpha gamma beta")],
                                 ["doc_id", "text"])
    ref = RefScorer([(0, "alpha beta alpha gamma beta")])
    got = _collect(span_near_scores(docs, [["beta"], ["alpha"]], slop=0,
                                    round_to=6))
    assert got == {0: round(ref.score(0, 1.0 / 3, ["alpha", "beta"]), 6)}


def test_unordered_counts_both_directions(spark):
    # pairs: alpha0->beta1, beta1->alpha3 (gap 1), alpha3->beta4
    docs = spark.createDataFrame([(0, "alpha beta gamma alpha beta")],
                                 ["doc_id", "text"])
    ref = RefScorer([(0, "alpha beta gamma alpha beta")])
    got = _collect(span_near_scores(docs, [["alpha"], ["beta"]], slop=1,
                                    in_order=False, round_to=6))
    # spans (0,1) and (3,4) have matchLength 2, (1,3) has matchLength 3
    freq = 1.0 / 3 + 1.0 / 4 + 1.0 / 3
    assert got == {0: round(ref.score(0, freq, ["alpha", "beta"]), 6)}


def test_span_first_cuts_at_end_position(spark):
    # ends (0-based token index + 1): alpha -> 1 and 4; end=3 keeps one
    docs = spark.createDataFrame([(0, "alpha beta gamma alpha")],
                                 ["doc_id", "text"])
    ref = RefScorer([(0, "alpha beta gamma alpha")])
    got = _collect(span_set_scores(docs, ["alpha"], max_end=3, round_to=6))
    assert got == {0: round(ref.score(0, 0.5, ["alpha"]), 6)}


def test_span_not_pre_post_window_edges(spark):
    # gamma at 2; alpha at 0,1,3,5: pre=1,post=2 kills p in [1,4] ->
    # wait: exclude q=2 kills include p with p-1 <= 2 <= p+2, i.e.
    # p in [0,3] -> survivors: alpha at 5 only
    docs = spark.createDataFrame([(0, "alpha alpha gamma alpha beta alpha")],
                                 ["doc_id", "text"])
    ref = RefScorer([(0, "alpha alpha gamma alpha beta alpha")])
    got = _collect(span_not_scores(docs, ["alpha"], ["gamma"],
                                   pre=1, post=2, round_to=6))
    assert got == {0: round(ref.score(0, 0.5, ["alpha"]), 6)}
    assert got == ref.span_not(["alpha"], ["gamma"], 1, 2)


# --------------------------------------------------------- oracle parity

def test_engine_matches_duckdb_oracle(documents, duck):
    import pandas as pd

    from neural_search_spark.oracle import (
        span_near_topk_sql,
        span_not_topk_sql,
        span_set_topk_sql,
    )
    from neural_search_spark.query.exhaustive import topk

    # round-then-rank on both sides (the dictionary-expansion
    # convention — span freq sums are cross-engine ULP-prone)
    cases = [
        (topk(span_near_scores(documents, [["spark"], ["window"]], slop=2,
                               round_to=4), k=10, round_to=None),
         span_near_topk_sql([["spark"], ["window"]], slop=2, k=10)),
        (topk(span_near_scores(documents, [["key"], ["value"], ["table"]],
                               slop=5, round_to=4), k=10, round_to=None),
         span_near_topk_sql([["key"], ["value"], ["table"]], slop=5, k=10)),
        (topk(span_near_scores(documents, [["big"], ["table"]], slop=3,
                               in_order=False, round_to=4), k=10,
              round_to=None),
         span_near_topk_sql([["big"], ["table"]], slop=3, in_order=False,
                            k=10)),
        (topk(span_set_scores(documents, ["agg", "join"], max_end=8,
                              round_to=4), k=10, round_to=None),
         span_set_topk_sql(["agg", "join"], max_end=8, k=10)),
        (topk(span_not_scores(documents, ["merge", "scan"], ["slow"],
                              pre=1, post=2, round_to=4), k=10,
              round_to=None),
         span_not_topk_sql(["merge", "scan"], ["slow"], pre=1, post=2,
                           k=10)),
    ]
    for got_df, sql in cases:
        got = got_df.toPandas().sort_values(["rank"]).reset_index(drop=True)
        exp = duck.execute(sql).fetchdf().sort_values(["rank"]).reset_index(
            drop=True)
        assert len(got) == len(exp)
        pd.testing.assert_frame_equal(
            got[["doc_id", "score", "rank"]],
            exp[["doc_id", "score", "rank"]],
            check_dtype=False, atol=1e-4)


def test_span_multi_expansion_stays_under_cap(spark):
    """The dsl_span_unordered_multi oracle uses an UNCAPPED LIKE
    predicate — valid only while the engine-side expansion stays under
    max_expansions=50. Pin that at the driver's sf0.01."""
    import os

    from neural_search_spark.query.multiterm import (
        _matcher_sql,
        expand_terms_corpus,
        like_escape,
    )
    from tests.conftest import SF_MED

    docs = spark.read.parquet(os.path.join(SF_MED, "documents.parquet"))
    exp = expand_terms_corpus(docs, matcher=_matcher_sql(
        like=like_escape("s") + "%"))
    assert 0 < len(exp) < 50
    # disjoint from the other clause of the registry row
    assert "table" not in exp


# ------------------------------------------------------------- DSL surface

@pytest.fixture(scope="module")
def ctx(documents):
    return SearchContext(docs=documents)


def test_dsl_span_bodies_run(ctx):
    near = search(ctx, {"query": {"span_near": {"clauses": [
        {"span_term": {"text": "spark"}},
        {"span_term": {"text": "window"}}], "slop": 2}}, "size": 5})
    assert near.columns == ["doc_id", "score", "rank"] and near.count() == 5
    first_near = search(ctx, {"query": {"span_first": {"match": {
        "span_near": {"clauses": [
            {"span_term": {"text": "key"}},
            {"span_term": {"text": "value"}}], "slop": 4}},
        "end": 12}}, "size": 5})
    assert first_near.count() > 0
    multi = search(ctx, {"query": {"span_near": {"clauses": [
        {"span_multi": {"match": {"wildcard": {"text": {"value": "s?an"}}}}},
        {"span_term": {"text": "table"}}], "slop": 3, "in_order": False}},
        "size": 5})
    assert multi.count() > 0


def test_dsl_span_hybrid_subquery(ctx):
    body = {"query": {"hybrid": {"queries": [
        {"match": {"text": "spark window"}},
        {"span_near": {"clauses": [
            {"span_term": {"text": "spark"}},
            {"span_term": {"text": "window"}}], "slop": 2}}]}}, "size": 5}
    out = search(ctx, body, pipeline={"normalization": "min_max",
                                      "combination": "arithmetic_mean"})
    assert out.count() == 5


def test_dsl_span_empty_expansion_matches_nothing(ctx):
    out = search(ctx, {"query": {"span_near": {"clauses": [
        {"span_multi": {"match": {"prefix": {"text": {"value": "zzzz"}}}}},
        {"span_term": {"text": "spark"}}], "slop": 2}}, "size": 5})
    assert out.count() == 0
    assert out.columns == ["doc_id", "score", "rank"]


@pytest.mark.parametrize("body,frag", [
    ({"span_term": {"text": "Spark Window"}}, "already-analyzed"),
    ({"span_term": {"other_col": "spark"}}, "text column"),
    ({"span_near": {"clauses": [{"span_term": {"text": "a"}}]}}, ">= 2"),
    ({"span_near": {"clauses": [
        {"span_term": {"text": "a"}}, {"span_term": {"text": "b"}},
        {"span_term": {"text": "c"}}], "in_order": False}}, "exactly 2"),
    ({"span_near": {"clauses": [
        {"span_term": {"text": "a"}}, {"span_term": {"text": "b"}}],
        "slop": -1}}, "slop"),
    ({"span_near": {"clauses": [
        {"span_term": {"text": "a"}}, {"span_term": {"text": "b"}}],
        "slop": "x"}}, "integer"),
    ({"span_near": {"clauses": [
        {"span_multi": {"match": {"prefix": {"text": {"value": "s"}}}}},
        {"span_term": {"text": "spark"}}], "slop": 1}}, "two span_near"),
    ({"span_not": {"include": {"span_term": {"text": "scan"}},
                   "exclude": {"span_term": {"text": "slow"}},
                   "dist": 1, "pre": 2}}, "shorthand"),
    ({"span_not": {"include": {"span_term": {"text": "scan"}},
                   "exclude": {"span_term": {"text": "scan"}}}}, "overlap"),
    ({"span_first": {"match": {"span_term": {"text": "a"}}}}, "needs"),
    ({"span_first": {"match": {"span_not": {
        "include": {"span_term": {"text": "a"}},
        "exclude": {"span_term": {"text": "b"}}}}, "end": 3}},
     "unsupported"),
    ({"span_or": {"clauses": [{"span_or": {"clauses": [
        {"span_term": {"text": "a"}}]}}]}}, "flatten"),
    ({"span_or": {"clauses": []}}, "non-empty"),
    ({"span_multi": {"match": {"match": {"text": "a"}}}}, "unsupported"),
    ({"span_near": {"clauses": [
        {"span_term": {"text": "a"}}, {"match": {"text": "b"}}]}},
     "span clause type"),
])
def test_dsl_span_rejections(ctx, body, frag):
    with pytest.raises(DslError, match="(?s)" + frag.replace("[", r"\[")):
        search(ctx, {"query": body, "size": 5})


def test_dsl_span_not_dist_shorthand(ctx, documents):
    via_dist = search(ctx, {"query": {"span_not": {
        "include": {"span_term": {"text": "scan"}},
        "exclude": {"span_term": {"text": "slow"}}, "dist": 2}}, "size": 10})
    via_prepost = search(ctx, {"query": {"span_not": {
        "include": {"span_term": {"text": "scan"}},
        "exclude": {"span_term": {"text": "slow"}},
        "pre": 2, "post": 2}}, "size": 10})
    assert [r.asDict() for r in via_dist.collect()] == [
        r.asDict() for r in via_prepost.collect()]


# ------------------------------------------------------ indexed dispatch

@pytest.fixture(scope="module")
def span_reader_ctx(positional_reader_ctx):
    return positional_reader_ctx


SPAN_BODIES = {
    "near": {"query": {"span_near": {"clauses": [
        {"span_term": {"text": "spark"}},
        {"span_term": {"text": "window"}}], "slop": 2}}, "size": 10},
    "near3": {"query": {"span_near": {"clauses": [
        {"span_term": {"text": "key"}}, {"span_term": {"text": "value"}},
        {"span_term": {"text": "table"}}], "slop": 5}}, "size": 10},
    "unord_multi": {"query": {"span_near": {"clauses": [
        {"span_multi": {"match": {"prefix": {"text": {"value": "s"}}}}},
        {"span_term": {"text": "table"}}],
        "slop": 3, "in_order": False}}, "size": 10},
    "first_or": {"query": {"span_first": {"match": {"span_or": {"clauses": [
        {"span_term": {"text": "agg"}}, {"span_term": {"text": "join"}}]}},
        "end": 8}}, "size": 10},
    "first_near": {"query": {"span_first": {"match": {
        "span_near": {"clauses": [
            {"span_term": {"text": "key"}},
            {"span_term": {"text": "value"}}], "slop": 4}},
        "end": 12}}, "size": 10},
    "span_not": {"query": {"span_not": {
        "include": {"span_or": {"clauses": [
            {"span_term": {"text": "scan"}},
            {"span_term": {"text": "merge"}}]}},
        "exclude": {"span_term": {"text": "slow"}},
        "pre": 1, "post": 2}}, "size": 10},
    "set": {"query": {"span_term": {"text": "spark"}}, "size": 10},
}


@pytest.mark.parametrize("name", sorted(SPAN_BODIES))
def test_indexed_span_identical_to_exhaustive(ctx, span_reader_ctx, name):
    """The positional-index span kernel must be rank- AND
    rounded-score-identical to the exhaustive window-function path —
    the same identity bar every other indexed family meets."""
    body = SPAN_BODIES[name]
    ex = [(r.doc_id, r.score, r.rank) for r in search(ctx, body).collect()]
    ix = [(r.doc_id, r.score, r.rank)
          for r in search(span_reader_ctx, body).collect()]
    assert ex == ix


def test_indexed_span_empty_expansion(span_reader_ctx):
    out = search(span_reader_ctx, {"query": {"span_near": {"clauses": [
        {"span_multi": {"match": {"prefix": {"text": {"value": "zzzz"}}}}},
        {"span_term": {"text": "spark"}}], "slop": 2}}, "size": 5})
    assert out.count() == 0 and out.columns == ["doc_id", "score", "rank"]


def test_indexed_span_rejections_still_apply(span_reader_ctx):
    with pytest.raises(DslError, match="exactly 2"):
        search(span_reader_ctx, {"query": {"span_near": {"clauses": [
            {"span_term": {"text": "a"}}, {"span_term": {"text": "b"}},
            {"span_term": {"text": "c"}}], "in_order": False}}, "size": 5})
    with pytest.raises(DslError, match="disjoint"):
        search(span_reader_ctx, {"query": {"span_near": {"clauses": [
            {"span_multi": {"match": {"prefix": {"text": {"value": "s"}}}}},
            {"span_term": {"text": "spark"}}], "slop": 1}}, "size": 5})


# ---------------------------------------------- span_containing / span_within

def test_span_containing_and_within_match_reference(spark):
    from neural_search_spark.query.spans import span_contain_scores

    corpus = [
        (0, "alpha beta gamma alpha delta beta"),
        (1, "beta alpha gamma alpha beta gamma"),
        (2, "gamma delta epsilon"),
        (3, "alpha gamma beta gamma alpha beta"),
        (4, "alpha beta"),
    ]
    docs = spark.createDataFrame(corpus, ["doc_id", "text"])
    ref = RefScorer(corpus)

    def expected(bsets, little, slop, within):
        exp = {}
        for d, tk in ref.toks.items():
            bigs = ref_near_matches(tk, bsets, slop, True)
            qs = [i for i, t in enumerate(tk) if t in little]
            if within:
                surv = [q for q in qs if any(a <= q <= e for a, e in bigs)]
                freq, ts = 0.5 * len(surv), little
            else:
                surv = [(a, e) for a, e in bigs
                        if any(a <= q <= e for q in qs)]
                freq = sum(1.0 / (1.0 + e + 1 - a) for a, e in surv)
                ts = [t for s in bsets for t in s]
            if surv:
                exp[d] = round(ref.score(d, freq, ts), 6)
        return exp

    for bsets, little, slop, within in (
        ([["alpha"], ["beta"]], ["gamma"], 3, False),
        ([["alpha"], ["beta"]], ["gamma"], 3, True),
        ([["alpha"], ["beta"]], ["delta"], 4, False),
        ([["alpha"], ["beta"]], ["delta"], 4, True),
        ([["alpha"], ["gamma"], ["beta"]], ["delta"], 5, False),
    ):
        got = _collect(span_contain_scores(docs, bsets, little, slop=slop,
                                           within=within, round_to=6))
        assert got == expected(bsets, little, slop, within), (
            bsets, little, slop, within)


def test_dsl_span_containing_bodies(ctx):
    for typ in ("span_containing", "span_within"):
        out = search(ctx, {"query": {typ: {
            "big": {"span_near": {"clauses": [
                {"span_term": {"text": "spark"}},
                {"span_term": {"text": "window"}}], "slop": 4}},
            "little": {"span_term": {"text": "table"}}}}, "size": 5})
        assert out.columns == ["doc_id", "score", "rank"]
        assert out.count() > 0
    # containment rides the exhaustive path as a hybrid sub-query too
    hb = {"query": {"hybrid": {"queries": [
        {"match": {"text": "spark window"}},
        {"span_within": {
            "big": {"span_near": {"clauses": [
                {"span_term": {"text": "spark"}},
                {"span_term": {"text": "window"}}], "slop": 4}},
            "little": {"span_term": {"text": "table"}}}}]}}, "size": 5}
    assert search(ctx, hb, pipeline={
        "normalization": "min_max",
        "combination": "arithmetic_mean"}).count() == 5


def test_dsl_span_containing_indexed_falls_back(span_reader_ctx, ctx):
    """No kernel mode for containment yet: with a reader the body must
    still serve (exhaustively) and match the no-reader twin."""
    body = {"query": {"span_containing": {
        "big": {"span_near": {"clauses": [
            {"span_term": {"text": "spark"}},
            {"span_term": {"text": "window"}}], "slop": 4}},
        "little": {"span_term": {"text": "table"}}}}, "size": 10}
    ex = [(r.doc_id, r.score, r.rank) for r in search(ctx, body).collect()]
    ix = [(r.doc_id, r.score, r.rank)
          for r in search(span_reader_ctx, body).collect()]
    assert ex == ix and len(ex) > 0


@pytest.mark.parametrize("body,frag", [
    ({"span_containing": {"big": {"span_term": {"text": "a"}},
                          "little": {"span_term": {"text": "b"}}}},
     "must be a span_near"),
    ({"span_within": {"big": {"span_near": {"clauses": [
        {"span_term": {"text": "a"}}, {"span_term": {"text": "b"}}],
        "in_order": False}},
        "little": {"span_term": {"text": "c"}}}}, "in_order"),
    ({"span_containing": {"big": {"span_near": {"clauses": [
        {"span_term": {"text": "a"}}, {"span_term": {"text": "b"}}]}},
        "little": {"span_term": {"text": "a"}}}}, "overlap"),
    ({"span_containing": {"big": {"span_near": {"clauses": [
        {"span_term": {"text": "a"}}, {"span_term": {"text": "b"}}]}}}},
     "needs"),
])
def test_dsl_span_containing_rejections(ctx, body, frag):
    with pytest.raises(DslError, match="(?s)" + frag.replace("[", r"\[")):
        search(ctx, {"query": body, "size": 5})


def test_dsl_span_containing_structural_check_precedes_expansion(ctx):
    """A structurally-invalid big (in_order: false) must reject even
    when a clause's dictionary expansion is empty — validation cannot
    be data-dependent."""
    with pytest.raises(DslError, match="in_order"):
        search(ctx, {"query": {"span_within": {
            "big": {"span_near": {"clauses": [
                {"span_multi": {"match": {"prefix": {
                    "text": {"value": "zzzz"}}}}},
                {"span_term": {"text": "spark"}}],
                "in_order": False}},
            "little": {"span_term": {"text": "table"}}}}, "size": 5})
