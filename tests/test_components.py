"""Connected-components / cluster-dedup tests.

The alternating-star contraction must agree with (a) hand-computed
components on adversarial shapes (long chains force multiple rounds;
naive one-round min-propagation would fail them) and (b) the DuckDB
recursive-closure oracle over the real MinHash-LSH pair graph.
"""

import pandas as pd
import pytest

from neural_search_spark.pipeline.dedup import (
    connected_components,
    dedup_components,
    dedup_survivors,
    minhash_lsh_pairs,
)
from neural_search_spark.pipeline import oracle as poracle


def _pairs(spark, edges):
    return spark.createDataFrame(pd.DataFrame(edges, columns=["a", "b"]), "a long, b long")


def test_components_hand_fixture(spark):
    # {1,2,3} via transitivity, {5,6}, and an edge listed backwards
    roots = connected_components(_pairs(spark, [(1, 2), (3, 2), (6, 5)]))
    got = {r["u"]: r["v"] for r in roots.collect()}
    assert got == {2: 1, 3: 1, 6: 5}


def test_components_long_chain(spark):
    # a 12-node path: diameter 11 — exercises the O(log n) multi-round
    # convergence (single-round min-propagation gets this wrong)
    edges = [(i, i + 1) for i in range(11)]
    roots = connected_components(_pairs(spark, edges))
    got = {r["u"]: r["v"] for r in roots.collect()}
    assert got == {i: 0 for i in range(1, 12)}


def test_components_two_chains_and_duplicate_edges(spark):
    edges = [(10, 11), (11, 12), (12, 10), (20, 21), (21, 20), (10, 11)]
    roots = connected_components(_pairs(spark, edges))
    got = {r["u"]: r["v"] for r in roots.collect()}
    assert got == {11: 10, 12: 10, 21: 20}


def test_components_matches_union_find(spark):
    # deterministic pseudo-random graph vs a driver-side union-find
    edges = [((i * 7919) % 97, (i * 104729) % 97) for i in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    parent = list(range(97))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    touched = {x for e in edges for x in e}
    for x in touched:
        r = find(x)
        if r != x:
            expected[x] = r
    # union-find roots are not necessarily component minima; normalize
    comp = {}
    for x in touched:
        comp.setdefault(find(x), []).append(x)
    expected = {x: min(members) for members in comp.values() for x in members if x != min(members)}
    roots = connected_components(_pairs(spark, edges))
    got = {r["u"]: r["v"] for r in roots.collect()}
    assert got == expected


def test_components_empty_pairs(spark, documents):
    empty = _pairs(spark, []).limit(0)
    comp = dedup_components(documents.limit(20), empty).toPandas()
    assert (comp["doc_id"] == comp["component_id"]).all()


def test_dedup_components_vs_duckdb_oracle(spark, documents, duck):
    pairs = minhash_lsh_pairs(documents)
    got = (
        dedup_components(documents, pairs)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = (
        duck.execute(poracle.components_sql())
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": "int64", "component_id": "int64"}),
        exp.astype({"doc_id": "int64", "component_id": "int64"}),
    )
    # sanity: the pair graph actually has transitive structure to test
    assert (got["doc_id"] != got["component_id"]).sum() > 0


def test_dedup_survivors_semantics(spark, documents, duck):
    pairs = minhash_lsh_pairs(documents)
    got = dedup_survivors(documents, pairs).toPandas()
    exp = duck.execute(poracle.survivors_sql()).fetchdf()
    key = ["doc_id", "component_id", "group_size", "keep"]
    g = got[key].sort_values("doc_id").reset_index(drop=True)
    e = exp[key].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        g.astype({"group_size": "int64", "keep": bool}),
        e.astype({"group_size": "int64", "keep": bool}),
    )
    # exactly one keeper per component, and it's the min doc_id
    keepers = g[g["keep"]]
    assert (keepers.groupby("component_id").size() == 1).all()
    assert (keepers["doc_id"] == keepers["component_id"]).all()


def test_components_nonconvergence_guard(spark):
    with pytest.raises(RuntimeError):
        connected_components(_pairs(spark, [(1, 2), (2, 3)]), max_iter=0)


def test_components_update_equals_full_recompute(spark):
    # batch 1: two clusters; batch 2 adds a bridge between them plus a
    # fresh chain — the update must equal recomputing over all pairs
    b1 = _pairs(spark, [(1, 2), (2, 3), (10, 11)])
    b2 = _pairs(spark, [(3, 10), (20, 21), (21, 22)])
    from neural_search_spark.pipeline.dedup import components_update

    prior = connected_components(b1)
    got = {r["u"]: r["v"] for r in components_update(prior, b2).collect()}
    full = {r["u"]: r["v"] for r in connected_components(b1.unionByName(b2)).collect()}
    assert got == full
    assert got[11] == 1  # the bridge merged the two old components


def test_components_hypothesis_vs_union_find(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=8, deadline=None)
    @given(st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)), min_size=1, max_size=40,
    ))
    def run(edges):
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            return
        parent = list(range(41))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        comp = {}
        for x in {v for e in edges for v in e}:
            comp.setdefault(find(x), []).append(x)
        expected = {x: min(ms) for ms in comp.values() for x in ms if x != min(ms)}
        got = {r["u"]: r["v"]
               for r in connected_components(_pairs(spark, edges)).collect()}
        assert got == expected

    run()
