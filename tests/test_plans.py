"""Physical-plan assertions backing PLANS.md's claims: these pin the
SHAPE Catalyst actually picks, not just the results — a regression
that silently de-optimizes (lost pushdown, broadcast turned shuffle,
global sort instead of TakeOrderedAndProject) turns a test red even
though every value stays correct."""

import contextlib
import io
import os

import pytest

from tests.conftest import SF_SMALL


def _plan(df, mode="formatted"):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(os.path.join(SF_SMALL, "embeddings.parquet"))


def test_filtered_knn_pushes_predicate_into_scan(spark, embeddings):
    """PLANS.md round-4 addendum: the exact filtered-kNN branch shows
    PushedFilters on the parquet scan — filtered search reads ONLY
    matching rows, so it gets cheaper as the filter gets more
    selective."""
    from neural_search_spark.pipeline.similarity import cosine_topk

    plan = _plan(cosine_topk(embeddings, 0, k=10, predicate="vec_id < 100"))
    assert "PushedFilters" in plan
    # the candidate-side scan carries the pushed range predicate
    assert "LessThan(vec_id,100)" in plan.replace(" ", "")


def test_bm25_stats_and_df_joins_broadcast(spark, documents):
    """PLANS.md: the 1-row stats frame and the per-term df table reach
    the scorer as broadcasts — never a shuffle join keyed on the
    corpus."""
    from neural_search_spark.query.exhaustive import bm25_scores

    plan = _plan(bm25_scores(documents, ["spark", "window"], round_to=None))
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_topk_compiles_to_take_ordered(spark, documents):
    """PLANS.md: orderBy+limit is TakeOrderedAndProject (distributed
    per-partition top-k + merge), never a global Sort."""
    from neural_search_spark.query.exhaustive import bm25_scores, topk

    plan = _plan(topk(bm25_scores(documents, ["spark"], round_to=None), k=10),
                 mode="simple")
    assert "TakeOrderedAndProject" in plan


def test_sketches_have_no_shuffle(spark, documents):
    """PLANS.md: doc_sketches (tokenize→shingle→hash→minhash) is pure
    per-row projection — zero Exchange operators in the whole plan."""
    from neural_search_spark.pipeline.dedup import doc_sketches

    plan = _plan(doc_sketches(documents), mode="simple")
    assert "Exchange" not in plan


def test_leaf_range_filter_pushes_into_scan(spark, documents):
    """Round-5: a DSL range/constant_score leaf's predicate reaches the
    parquet scan as a pushed filter — the constant-score match set is a
    pruned scan, never a post-filter over all rows."""
    from neural_search_spark.query.dsl import SearchContext, search

    ctx = SearchContext(docs=documents)
    df = search(ctx, {"query": {"range": {"n_chars": {"gte": 200, "lte": 400}}},
                      "size": 5})
    plan = _plan(df)
    assert "PushedFilters" in plan
    flat = plan.replace(" ", "")
    assert "GreaterThanOrEqual(n_chars" in flat and "LessThanOrEqual(n_chars" in flat


def test_sort_body_compiles_to_take_ordered(spark, documents):
    """Round-5: a sort body's full-hit-set ordering cuts with
    TakeOrderedAndProject (never a global sort + limit)."""
    from neural_search_spark.query.dsl import SearchContext, search

    ctx = SearchContext(docs=documents)
    df = search(ctx, {"query": {"match": {"text": "spark window"}}, "size": 5,
                      "sort": [{"n_chars": {"order": "desc"}}]})
    assert "TakeOrderedAndProject" in _plan(df)


def test_nested_rollup_partial_aggregates(spark, documents):
    """PLANS.md round-5 addendum: the block-join ScoreMode rollup is a
    groupBy with MAP-SIDE partial aggregation (partial_sum before its
    exchange), so the parent shuffle carries per-partition partials of
    matched chunks, never the chunk corpus."""
    from neural_search_spark.operators.nested import nested_chunk_scores

    plan = _plan(nested_chunk_scores(documents, ["spark", "window"],
                                     " the ", score_mode="total"))
    flat = plan.replace(" ", "")
    # the rollup keys on floor(chunk_id / BASE) and partial-aggregates
    # before the exchange that co-locates parents
    assert "FLOOR(" in plan
    assert flat.count("partial_sum") >= 2  # chunk score agg AND rollup
    # the only joins are the BM25 stats broadcasts (1-row stats frame,
    # per-term df) — the chunk corpus itself is a posexplode, and
    # nothing falls back to a shuffled sort-merge join
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
