"""Similarity search over an embedding column (array<float>).

* ``cosine_topk``  — brute-force exact top-k: broadcast the query vector,
  one JVM-side pass (zip_with/aggregate dot product — no Python in the
  hot path), TakeOrderedAndProject top-k. The exactness baseline.
* ``ivf_topk``     — IVF scale path: deterministic coarse quantizer
  (fixed centroid ids), vectors pre-assigned to their nearest centroid
  (at 100 TB this assignment is a *stored* bucketing column / partition
  key, computed once at ingest), query probes the ``nprobe`` nearest
  centroids and scans only those buckets — an O(nprobe/K) fraction of
  the corpus, with partition pruning doing the skipping when the table
  is written partitioned by ``centroid_id``.

The reference's dense path (knn_vector/HNSW, NeuralQueryBuilder.java:
300-325) delegates to the k-NN plugin; these operators fill that slot
Spark-natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
NORM = "sqrt(aggregate({a}, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x))"

# Deterministic coarse-quantizer seeds: the vectors with these ids are the
# centroids (public IVF practice trains with k-means; a fixed seed set
# keeps both engines and re-runs bit-identical — swap in k-means||
# centroids on a real corpus without touching the query path).
DEFAULT_CENTROID_IDS = [3, 7, 11, 19, 23, 31, 37, 41]


def _as_double(df: DataFrame, id_col: str, vec_col: str, out_id: str, out_vec: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(out_id),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias(out_vec),
    )


def cosine_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    predicate: str | None = None,
) -> DataFrame:
    """Exact top-k by cosine to the vector with id ``query_vec_id``.

    The 1-row query side is crossJoin-broadcast; scoring is whole-stage
    codegen (higher-order functions), top-k is TakeOrderedAndProject.

    ``predicate`` (SQL boolean over the table's columns) is the
    reference's filtered-kNN slot (NeuralQueryBuilder.java:105,178-180,
    318 passes ``filter`` through to the k-NN engine): CANDIDATES are
    restricted before scoring — Catalyst pushes the predicate into the
    parquet scan, so the filtered exact path reads only matching rows —
    while the query vector itself is looked up unfiltered, exactly as
    the k-NN engine resolves the query against the full index.
    """
    vq = _as_double(emb, id_col, vec_col, "vec_id", "v")
    q = vq.where(F.col("vec_id") == query_vec_id).select(F.col("v").alias("qv"))
    src = emb.where(F.expr(predicate)) if predicate else emb
    v = _as_double(src, id_col, vec_col, "vec_id", "v")
    dot = DOT.format(a="v", b="qv")
    na, nq = NORM.format(a="v"), NORM.format(a="qv")
    scored = (
        v.where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .withColumn("cos", F.round(F.expr(dot) / (F.expr(na) * F.expr(nq)), 6))
        .select("vec_id", "cos")
    )
    top = scored.orderBy(F.col("cos").desc(), F.col("vec_id").asc()).limit(k)
    w = Window.orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return top.select("vec_id", "cos", F.row_number().over(w).cast("int").alias("rank"))


def cosine_topk_vector(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    predicate: str | None = None,
) -> DataFrame:
    """Exact top-k by cosine to a LITERAL query vector — the raw
    ``knn`` query shape (KNNQueryBuilder carries the vector itself;
    NeuralQueryBuilder.doRewrite produces exactly this builder with
    the model's embedding, NeuralQueryBuilder.java:300-325).

    Same plan as ``cosine_topk`` minus the query-side lookup: the
    vector is a broadcast literal, scoring is whole-stage codegen,
    the cut is TakeOrderedAndProject. No self-exclusion — a literal
    query has no row identity in the corpus. ``predicate`` restricts
    CANDIDATES before scoring (the k-NN engine's filter slot), pushed
    into the scan by Catalyst.
    """
    if not query_vec or not all(
        isinstance(x, (int, float)) and not isinstance(x, bool) for x in query_vec
    ):
        raise ValueError("query_vec must be a non-empty numeric list")
    src = emb.where(F.expr(predicate)) if predicate else emb
    v = _as_double(src, id_col, vec_col, "vec_id", "v")
    q = F.array(*[F.lit(float(x)).cast("double") for x in query_vec])
    dot = DOT.format(a="v", b="qv")
    na, nq = NORM.format(a="v"), NORM.format(a="qv")
    scored = (
        v.withColumn("qv", q)
        .withColumn("cos", F.round(F.expr(dot) / (F.expr(na) * F.expr(nq)), 6))
        .select("vec_id", "cos")
    )
    top = scored.orderBy(F.col("cos").desc(), F.col("vec_id").asc()).limit(k)
    w = Window.orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return top.select("vec_id", "cos", F.row_number().over(w).cast("int").alias("rank"))


def ivf_assign(
    emb: DataFrame,
    centroid_ids: list[int] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, v, centroid_id): nearest centroid by cosine, tiebreak on
    centroid id. At scale this is the ingest-time bucketing column."""
    ids = centroid_ids or DEFAULT_CENTROID_IDS
    v = _as_double(emb, id_col, vec_col, "vec_id", "v")
    cents = v.where(F.col("vec_id").isin(ids)).select(
        F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv")
    )
    dot = DOT.format(a="v", b="cv")
    na, nc = NORM.format(a="v"), NORM.format(a="cv")
    sim = (
        v.crossJoin(F.broadcast(cents))
        .withColumn("csim", F.round(F.expr(dot) / (F.expr(na) * F.expr(nc)), 6))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), F.col("centroid_id").asc())
    return (
        sim.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "v", "centroid_id")
    )


def ivf_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    nprobe: int = 2,
    centroid_ids: list[int] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: probe the ``nprobe`` centroids nearest the
    query, scan only vectors assigned to them. Deterministic — the DuckDB
    oracle replicates the identical probe/assign logic."""
    ids = centroid_ids or DEFAULT_CENTROID_IDS
    assigned = ivf_assign(emb, ids, id_col, vec_col)
    q = assigned.where(F.col("vec_id") == query_vec_id).select(F.col("v").alias("qv"))
    cents = _as_double(emb, id_col, vec_col, "centroid_id", "cv").where(
        F.col("centroid_id").isin(ids)
    )
    dot_qc = DOT.format(a="cv", b="qv")
    nc, nq = NORM.format(a="cv"), NORM.format(a="qv")
    probe = (
        cents.crossJoin(F.broadcast(q))
        .withColumn("csim", F.round(F.expr(dot_qc) / (F.expr(nc) * F.expr(nq)), 6))
        .orderBy(F.col("csim").desc(), F.col("centroid_id").asc())
        .limit(nprobe)
        .select("centroid_id")
    )
    dot = DOT.format(a="v", b="qv")
    na = NORM.format(a="v")
    scored = (
        assigned.join(F.broadcast(probe), "centroid_id")
        .where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .withColumn("cos", F.round(F.expr(dot) / (F.expr(na) * F.expr(nq)), 6))
        .select("vec_id", "cos")
    )
    top = scored.orderBy(F.col("cos").desc(), F.col("vec_id").asc()).limit(k)
    w = Window.orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return top.select("vec_id", "cos", F.row_number().over(w).cast("int").alias("rank"))


def radial_search(
    emb: DataFrame,
    query_vec_id: int,
    min_score: float | None = None,
    max_distance: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Radial ANN: ALL neighbors within a similarity radius instead of a
    count — the reference's max_distance / min_score kNN variants
    (query/NeuralQueryBuilder.java:300-354). Exactly one of
    ``min_score`` (cosine floor) or ``max_distance`` (cosine distance
    1 − cos ceiling) must be set; the two are equivalent and normalize
    to a cosine floor. Same broadcast-query/codegen-scan shape as
    ``cosine_topk`` but the cut is a WHERE (pushed ahead of the sort),
    so result size is radius-driven, not k-driven."""
    if (min_score is None) == (max_distance is None):
        raise ValueError("set exactly one of min_score / max_distance")
    floor = min_score if min_score is not None else 1.0 - max_distance
    v = _as_double(emb, id_col, vec_col, "vec_id", "v")
    q = v.where(F.col("vec_id") == query_vec_id).select(F.col("v").alias("qv"))
    dot = DOT.format(a="v", b="qv")
    na, nq = NORM.format(a="v"), NORM.format(a="qv")
    return (
        v.where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .withColumn("cos", F.round(F.expr(dot) / (F.expr(na) * F.expr(nq)), 6))
        .where(F.col("cos") >= floor)
        .select("vec_id", "cos")
        .orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    )


def ivf_train_centroids(
    emb: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_ids: list[int] | None = None,
) -> list[list[float]]:
    """Deterministic Lloyd's k-means for the IVF coarse quantizer:
    seeded from fixed vector ids (DEFAULT_CENTROID_IDS — reproducible,
    no RNG), ``iters`` rounds of assign (broadcast centroids, codegen
    cosine) → per-cluster mean (one map-side-combined groupBy). Each
    round is 2 small jobs; k and iters are tiny constants, so the
    driver loop is not a scale concern. Returns the centroid vectors
    (driver-side list: k × dim floats — broadcast-sized by
    construction). Replaces the fixed-seed stand-in with trained
    centroids without touching the query path: pass the result as
    literal centroid vectors to a bucketing column at ingest.
    Public algorithm (Lloyd 1982); empty clusters keep their previous
    centroid (standard fix)."""
    ids = seed_ids or DEFAULT_CENTROID_IDS
    v = _as_double(emb, id_col, vec_col, "vec_id", "v")
    cents = [
        r["v"] for r in v.where(F.col("vec_id").isin(ids))
        .orderBy("vec_id").select("v").collect()
    ][:k]
    spark = emb.sparkSession
    for _ in range(iters):
        cdf = spark.createDataFrame(
            [(i, c) for i, c in enumerate(cents)], "centroid_id int, cv array<double>"
        )
        dot = DOT.format(a="v", b="cv")
        na, nc = NORM.format(a="v"), NORM.format(a="cv")
        sim = v.crossJoin(F.broadcast(cdf)).withColumn(
            "csim", F.round(F.expr(dot) / (F.expr(na) * F.expr(nc)), 6)
        )
        from pyspark.sql import Window

        w = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), F.col("centroid_id").asc())
        assigned = sim.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
        means = (
            assigned.select("centroid_id", F.posexplode("v").alias("d", "x"))
            .groupBy("centroid_id", "d")
            .agg(F.avg("x").alias("m"))
            .groupBy("centroid_id")
            .agg(F.map_from_entries(F.collect_list(F.struct("d", "m"))).alias("mm"))
            .collect()
        )
        new_cents = list(cents)
        dim = len(cents[0])
        for r in means:
            mm = r["mm"]
            new_cents[r["centroid_id"]] = [float(mm.get(d, 0.0)) for d in range(dim)]
        cents = new_cents
    return cents


def ivf_recall_at_k(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    nprobe: int = 2,
    centroid_ids: list[int] | None = None,
) -> float:
    """Measured recall@k of the IVF path vs brute force over a query
    set — the 'measure, don't guess' harness for ANN quality."""
    hit = tot = 0
    for qid in query_ids:
        exact = {r["vec_id"] for r in cosine_topk(emb, qid, k=k).collect()}
        approx = {r["vec_id"] for r in ivf_topk(emb, qid, k=k, nprobe=nprobe,
                                                centroid_ids=centroid_ids).collect()}
        hit += len(exact & approx)
        tot += len(exact)
    return hit / tot if tot else 1.0


def ivf_recall_frame(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    nprobe: int = 2,
    centroid_ids: list[int] | None = None,
) -> DataFrame:
    """One-row (exact_k, matched, recall): recall@k of the IVF probe
    path vs the exact brute-force top-k, fully declarative — the
    driver-gate form of :func:`ivf_recall_at_k` (a green row here would
    catch a silent probe/assignment regression that the mirrored
    ``ivf_topk_sql`` parity oracle cannot, because that oracle replays
    the same probe)."""
    exact = cosine_topk(emb, query_vec_id, k=k).select("vec_id")
    approx = ivf_topk(emb, query_vec_id, k=k, nprobe=nprobe,
                      centroid_ids=centroid_ids).select(
        "vec_id", F.lit(1).alias("hit")
    )
    joined = exact.join(approx, "vec_id", "left")
    return joined.agg(
        F.count(F.lit(1)).alias("exact_k"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("matched"),
    ).select(
        "exact_k", "matched",
        F.round(F.col("matched") / F.col("exact_k"), 4).alias("recall"),
    )
