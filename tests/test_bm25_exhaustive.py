"""Milestone-0 gate: exhaustive DataFrame BM25 vs two independent oracles.

1. a pandas brute-force scorer written from the BM25 formula directly
   (float64), playing the role the reference's *QueryIT suites play;
2. the DuckDB SQL from neural_search_spark.oracle (the driver's own
   comparison path, mirrored locally).
"""

import numpy as np
import pandas as pd
import pytest

from neural_search_spark import oracle
from neural_search_spark.functions.norms import quantize_length
from neural_search_spark.functions.tokenize import tokenize_simple
from neural_search_spark.query.exhaustive import bm25_conjunctive, bm25_scores, topk

TERMS = ["spark", "window", "merge"]


def pandas_bm25(pdf: pd.DataFrame, terms, k1=1.2, b=0.75, quantize=True):
    toks = tokenize_simple(pdf["text"])
    dl = toks.map(len).to_numpy()
    N = len(pdf)
    avgdl = dl.sum() / N
    dl_q = quantize_length(dl) if quantize else dl
    rows = {}
    df_ = {t: sum(t in set(ts) for ts in toks) for t in terms}
    for i, ts in enumerate(toks):
        s = 0.0
        for t in terms:
            tf = ts.count(t)
            if tf == 0 or df_[t] == 0:
                continue
            idf = np.log(1.0 + (N - df_[t] + 0.5) / (df_[t] + 0.5))
            s += idf * (tf / (tf + k1 * (1 - b + b * dl_q[i] / avgdl)))
        if s > 0:
            rows[int(pdf["doc_id"].iloc[i])] = s
    return rows


@pytest.fixture(scope="module")
def docs_pdf(documents):
    return documents.select("doc_id", "text").toPandas()


def test_scores_match_pandas_oracle(spark, documents, docs_pdf):
    got = {r["doc_id"]: r["score"] for r in bm25_scores(documents, TERMS, round_to=None).collect()}
    expect = pandas_bm25(docs_pdf, TERMS)
    assert set(got) == set(expect)
    for d in expect:
        assert got[d] == pytest.approx(expect[d], abs=1e-9)


def test_scores_match_duckdb_oracle(spark, documents, duck):
    got = (
        bm25_scores(documents, TERMS, round_to=4)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = (
        duck.execute(oracle.bm25_scores_sql(TERMS))
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_topk_matches_duckdb(spark, documents, duck):
    got = topk(bm25_scores(documents, TERMS, round_to=None), k=10).toPandas()
    exp = duck.execute(oracle.bm25_topk_sql(TERMS, k=10)).fetchdf()
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    np.testing.assert_allclose(got["score"], exp["score"], atol=1e-4)


def test_conjunctive(spark, documents, duck, docs_pdf):
    got = bm25_conjunctive(documents, TERMS, round_to=4).toPandas().sort_values("doc_id")
    exp = duck.execute(oracle.bm25_conjunctive_sql(TERMS)).fetchdf().sort_values("doc_id")
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    np.testing.assert_allclose(got["score"], exp["score"], atol=1e-9)
    # AND ⊆ OR and each AND doc contains all terms
    toks = tokenize_simple(docs_pdf["text"])
    all_terms = {int(d): set(t) for d, t in zip(docs_pdf["doc_id"], toks)}
    for d in got["doc_id"]:
        assert all(t in all_terms[int(d)] for t in TERMS)


def test_absent_term_empty(spark, documents):
    assert bm25_scores(documents, ["zzz_not_a_term_zzz"]).count() == 0


def test_quantization_changes_scores_as_expected(spark, documents, docs_pdf):
    got = {r["doc_id"]: r["score"] for r in bm25_scores(documents, TERMS, quantize=False, round_to=None).collect()}
    expect = pandas_bm25(docs_pdf, TERMS, quantize=False)
    for d in expect:
        assert got[d] == pytest.approx(expect[d], abs=1e-9)
