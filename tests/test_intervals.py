"""Intervals query (query/intervals.py + the DSL surface).

The brute-force reference implements the Clarke–Cormack minimal
interval algebra directly (enumerate ALL candidate intervals, drop any
containing a smaller match); the engine's window/chain formulation
must coincide — that containment-based reference is deliberately
different code from the engine's "per distinct end keep latest start"
cut, so agreement is evidence, not tautology.
"""

import math

import numpy as np
import pytest

from neural_search_spark.functions.norms import quantize_length
from neural_search_spark.query.dsl import DslError, SearchContext, search
from neural_search_spark.query.intervals import interval_scores

K1, B = 1.2, 0.75


def ref_minimal_intervals(tokens, clause_sets, max_gaps, ordered):
    """All minimal intervals by definition: candidates = every (a, e)
    window containing one position per clause (in order if ordered);
    keep those containing no other candidate strictly inside."""
    n = len(clause_sets)
    pos = [(i, ci) for i, t in enumerate(tokens)
           for ci, s in enumerate(clause_sets) if t in s]
    if n == 1:
        cand = [(p, p) for p, _ in pos]
    else:
        import itertools

        cand = set()
        groups = [[p for p, c in pos if c == ci] for ci in range(n)]
        for combo in itertools.product(*groups):
            if ordered:
                if all(combo[i] < combo[i + 1] for i in range(n - 1)):
                    cand.add((combo[0], combo[-1]))
            else:
                cand.add((min(combo), max(combo)))
        cand = sorted(cand)
    minimal = [
        (a, e) for a, e in cand
        if not any((a2 >= a and e2 <= e and (a2, e2) != (a, e))
                   for a2, e2 in cand)
    ]
    if max_gaps >= 0:
        minimal = [(a, e) for a, e in minimal
                   if e - a - (n - 1) <= max_gaps]
    return minimal


class RefScorer:
    def __init__(self, corpus):
        self.toks = {d: t.split() for d, t in corpus}
        self.N = len(self.toks)
        self.avgdl = sum(len(v) for v in self.toks.values()) / self.N

    def score(self, d, freq, terms):
        tot = 0.0
        for t in sorted(set(terms)):
            df = sum(1 for v in self.toks.values() if t in v)
            if df:
                tot += math.log(1.0 + (self.N - df + 0.5) / (df + 0.5))
        dlq = float(quantize_length(np.array([len(self.toks[d])]))[0])
        return tot * freq / (freq + K1 * (1 - B + B * dlq / self.avgdl))

    def intervals(self, clause_sets, max_gaps, ordered):
        allt = [t for s in clause_sets for t in s]
        exp = {}
        for d, tk in self.toks.items():
            m = ref_minimal_intervals(tk, clause_sets, max_gaps, ordered)
            if m:
                freq = sum(1.0 / (e - a + 1) for a, e in m)
                exp[d] = round(self.score(d, freq, allt), 6)
        return exp


CORPUS = [
    (0, "alpha beta gamma alpha delta beta"),
    (1, "beta alpha alpha beta gamma"),
    (2, "gamma delta epsilon"),
    (3, "alpha gamma gamma beta alpha beta alpha"),
    (4, "beta beta alpha alpha"),
    (5, "alpha alpha beta beta"),
]


@pytest.fixture(scope="module")
def iv_docs(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def _collect(df):
    return {r["doc_id"]: round(r["score"], 6) for r in df.collect()}


CASES = [
    ([["alpha"], ["beta"]], -1, True),
    ([["alpha"], ["beta"]], 0, True),
    ([["alpha"], ["beta"]], 2, False),
    ([["alpha"], ["beta"]], 0, False),
    ([["alpha"], ["gamma"], ["beta"]], -1, True),
    ([["alpha"], ["gamma"], ["beta"]], 2, True),
    ([["alpha", "delta"]], -1, False),  # any_of: every occurrence
    ([["beta"]], -1, True),             # single term: freq = tf
]


@pytest.mark.parametrize("clauses,max_gaps,ordered", CASES)
def test_intervals_match_reference(iv_docs, clauses, max_gaps, ordered):
    ref = RefScorer(CORPUS)
    got = _collect(interval_scores(iv_docs, clauses, max_gaps=max_gaps,
                                   ordered=ordered, round_to=6))
    assert got == ref.intervals(clauses, max_gaps, ordered)


def test_intervals_random_corpora_match_reference(spark):
    rng = np.random.default_rng(77011)
    vocab = list("abcde")
    for trial in range(3):
        corpus = [
            (d, " ".join(rng.choice(vocab, size=rng.integers(3, 22))))
            for d in range(25)
        ]
        docs = spark.createDataFrame(corpus, ["doc_id", "text"])
        ref = RefScorer(corpus)
        for clauses, mg, ordered in (
            ([["a"], ["b"]], int(rng.integers(0, 4)), True),
            ([["a"], ["b"]], int(rng.integers(0, 4)), False),
            ([["a"], ["b"], ["c"]], int(rng.integers(0, 6)), True),
            ([["a"], ["b"]], -1, True),
        ):
            got = _collect(interval_scores(docs, clauses, max_gaps=mg,
                                           ordered=ordered, round_to=6))
            assert got == ref.intervals(clauses, mg, ordered), (
                trial, clauses, mg, ordered)


def test_intervals_differ_from_spans_on_nesting(spark):
    """'alpha alpha beta': spans emit BOTH (0,2) and (1,2); minimal
    intervals keep only (1,2) — the semantic difference pinned."""
    from neural_search_spark.query.spans import span_near_scores

    docs = spark.createDataFrame([(0, "alpha alpha beta")],
                                 ["doc_id", "text"])
    ref = RefScorer([(0, "alpha alpha beta")])
    iv = _collect(interval_scores(docs, [["alpha"], ["beta"]], max_gaps=-1,
                                  ordered=True, round_to=6))
    assert iv == {0: round(ref.score(0, 1.0 / 2, ["alpha", "beta"]), 6)}
    sp = _collect(span_near_scores(docs, [["alpha"], ["beta"]], slop=2,
                                   round_to=6))
    assert sp == {0: round(ref.score(0, 1.0 / 4 + 1.0 / 3,
                                     ["alpha", "beta"]), 6)}


def test_intervals_gap_filter_after_minimization(spark):
    """'alpha beta gamma alpha ... beta' with max_gaps=0: the minimal
    interval for end=5 starts at alpha@3 (gap 1) — it is DROPPED, and
    the nested-but-larger (0, 1)-style candidates never resurrect."""
    docs = spark.createDataFrame([(0, "alpha beta gamma alpha zeta beta")],
                                 ["doc_id", "text"])
    ref = RefScorer([(0, "alpha beta gamma alpha zeta beta")])
    got = _collect(interval_scores(docs, [["alpha"], ["beta"]], max_gaps=0,
                                   ordered=True, round_to=6))
    # only (0,1) survives: (3,5) is minimal for end 5 but gap 1 > 0
    assert got == {0: round(ref.score(0, 1.0 / 2, ["alpha", "beta"]), 6)}


def test_intervals_oracle_parity(documents, duck):
    import pandas as pd

    from neural_search_spark.oracle import intervals_topk_sql
    from neural_search_spark.query.exhaustive import topk

    cases = [
        (topk(interval_scores(documents, [["key"], ["value"]], max_gaps=3,
                              ordered=True, round_to=4), k=10,
              round_to=None),
         intervals_topk_sql([["key"], ["value"]], max_gaps=3, ordered=True,
                            k=10)),
        (topk(interval_scores(documents, [["big"], ["table"]], max_gaps=4,
                              round_to=4), k=10, round_to=None),
         intervals_topk_sql([["big"], ["table"]], max_gaps=4, k=10)),
        (topk(interval_scores(documents, [["spark"], ["window"], ["agg"]],
                              max_gaps=8, ordered=True, round_to=4), k=10,
              round_to=None),
         intervals_topk_sql([["spark"], ["window"], ["agg"]], max_gaps=8,
                            ordered=True, k=10)),
        (topk(interval_scores(documents, [["scan", "merge"]], round_to=4),
              k=10, round_to=None),
         intervals_topk_sql([["scan", "merge"]], k=10)),
    ]
    for got_df, sql in cases:
        got = got_df.toPandas().sort_values("rank").reset_index(drop=True)
        exp = duck.execute(sql).fetchdf().sort_values("rank").reset_index(
            drop=True)
        assert len(got) == len(exp)
        pd.testing.assert_frame_equal(
            got[["doc_id", "score", "rank"]],
            exp[["doc_id", "score", "rank"]],
            check_dtype=False, atol=1e-4)


@pytest.fixture(scope="module")
def ctx(documents):
    return SearchContext(docs=documents)


def test_dsl_intervals_bodies(ctx):
    out = search(ctx, {"query": {"intervals": {"text": {"match": {
        "query": "key value", "max_gaps": 3, "ordered": True}}}},
        "size": 5})
    assert out.columns == ["doc_id", "score", "rank"] and out.count() == 5
    out = search(ctx, {"query": {"intervals": {"text": {"any_of": {
        "intervals": [{"match": {"query": "scan"}},
                      {"match": {"query": "merge"}}]}}}}, "size": 5})
    assert out.count() == 5
    hybrid = {"query": {"hybrid": {"queries": [
        {"match": {"text": "key value"}},
        {"intervals": {"text": {"match": {"query": "key value",
                                          "max_gaps": 3,
                                          "ordered": True}}}}]}}, "size": 5}
    assert search(ctx, hybrid, pipeline={
        "normalization": "min_max",
        "combination": "arithmetic_mean"}).count() == 5


@pytest.mark.parametrize("src,frag", [
    ({"match": {"query": "a b c", "ordered": False}}, "at most 2"),
    ({"match": {"query": "a a b", "ordered": True}}, "repeated"),
    ({"match": {"query": "", "ordered": True}}, "non-empty"),
    ({"match": {"query": "a b", "max_gaps": -2}}, ">= -1"),
    ({"match": {"query": "a b", "max_gaps": "x"}}, "integer"),
    ({"match": {"query": "a b", "ordered": 1}}, "boolean"),
    ({"all_of": {"intervals": []}}, "unsupported"),
    ({"any_of": {"intervals": [{"match": {"query": "a b"}}]}},
     "exactly one term"),
    ({"any_of": {"intervals": [{"prefix": {"prefix": "a"}}]}},
     "single-term"),
    ({"any_of": {"intervals": [{"match": {"query": ["a"]}}]}},
     "non-empty string"),
    ({"any_of": {"intervals": [{"match": {"query": 42}}]}},
     "non-empty string"),
    ({"match": {"query": "a b", "filter": {}}}, "does not support"),
])
def test_dsl_intervals_rejections(ctx, src, frag):
    with pytest.raises(DslError, match="(?s)" + frag.replace("[", r"\[")):
        search(ctx, {"query": {"intervals": {"text": src}}, "size": 5})


# ------------------------------------------------------ indexed dispatch

@pytest.fixture(scope="module")
def iv_reader_ctx(positional_reader_ctx):
    return positional_reader_ctx


IV_BODIES = {
    "ordered": {"query": {"intervals": {"text": {"match": {
        "query": "key value", "max_gaps": 3, "ordered": True}}}},
        "size": 10},
    "ordered3": {"query": {"intervals": {"text": {"match": {
        "query": "spark window agg", "max_gaps": 8, "ordered": True}}}},
        "size": 10},
    "ordered_unbounded": {"query": {"intervals": {"text": {"match": {
        "query": "big table", "ordered": True}}}}, "size": 10},
    "unordered": {"query": {"intervals": {"text": {"match": {
        "query": "big table", "max_gaps": 4}}}}, "size": 10},
    "any_of": {"query": {"intervals": {"text": {"any_of": {"intervals": [
        {"match": {"query": "scan"}}, {"match": {"query": "merge"}}]}}}},
        "size": 10},
}


@pytest.mark.parametrize("name", sorted(IV_BODIES))
def test_indexed_intervals_identical_to_exhaustive(ctx, iv_reader_ctx, name):
    body = IV_BODIES[name]
    ex = [(r.doc_id, r.score, r.rank) for r in search(ctx, body).collect()]
    ix = [(r.doc_id, r.score, r.rank)
          for r in search(iv_reader_ctx, body).collect()]
    assert ex == ix and len(ex) > 0


def test_indexed_intervals_unordered_cap(iv_reader_ctx):
    """>2 unordered terms must reject on the INDEXED path too — the
    pair-based kernel enumeration would otherwise silently score
    any-2-adjacency instead of all-terms proximity."""
    with pytest.raises(DslError, match="at most 2"):
        search(iv_reader_ctx, {"query": {"intervals": {"text": {"match": {
            "query": "spark window agg"}}}}, "size": 5})
