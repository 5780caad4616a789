"""Product quantization (PQ) for embedding columns — the memory-scale
ANN tier.

At 100 TB, raw float32 embeddings are the cost driver: 64-d float32 is
256 B/vector; PQ stores ``m`` one-byte codes (here m=8 → 32x smaller),
and queries scan codes with per-subspace lookup tables instead of
touching raw vectors (ADC — asymmetric distance computation; Jégou,
Douze, Schmid, "Product Quantization for Nearest Neighbor Search",
TPAMI 2011 — the IVFADC design FAISS productionizes). The reference's
dense path delegates to the k-NN plugin (query/NeuralQueryBuilder.java:
300-325), whose engines ship exactly this quantization family
(faiss IVF_PQ); this module fills that slot Spark-natively.

Split mirrors the IVF design in :mod:`.similarity`:

* ``pq_encode``       — ingest-time: per subspace, nearest codeword by
  squared-L2 (broadcast codebook, codegen arithmetic, window argmin).
  The codes column is what a 100-TB table persists; raw vectors can
  live in cold storage for an optional exact re-rank.
* ``pq_adc_topk``     — query-time: build the m x ksub lookup table of
  dot(query_sub, codeword) ONCE (driver-free: it is a broadcast join
  of two tiny frames), then score = sum of m table lookups per vector —
  never touches raw vectors. Top-k by approximate dot product.
* ``train_pq_codebooks`` — deterministic per-subspace Lloyd rounds
  (same broadcast-assign / map-side-combine-mean shape as
  ``ivf_train_centroids``; driver state is m x ksub x dsub floats).
* ``pq_recall_frame`` — one-row recall@k of the ADC path vs exact
  cosine brute force (the quality gate; same form as
  ``ivf_recall_frame``).

Determinism: default codebooks are SUBVECTORS OF FIXED vec_ids
(DEFAULT_CODEBOOK_IDS) — no RNG, so the DuckDB oracle replays the
identical encode + ADC with list_slice/list_dot_product and both
engines agree bit-for-bit (rounding pinned at 6 dp like the IVF path).
Swap in ``train_pq_codebooks`` output on a real corpus without touching
the query path.

Scale shape: encode is a crossJoin against an m*ksub-row broadcast
(tiny) + one window argmin partitioned by (vec_id, sub) — no shuffle of
the big side beyond the window's hash partitioning on vec_id; ADC is a
posexplode (m rows/vector) + broadcast-join + map-side-combined sum,
then TakeOrderedAndProject. No driver-side loops over data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import DOT, NORM, _as_double, cosine_topk

# Codebook seeds: the subvectors of these vectors form each subspace's
# codewords (ksub = len(ids)). Disjoint from DEFAULT_CENTROID_IDS so
# IVF + PQ compose without aliasing.
DEFAULT_CODEBOOK_IDS = [2, 5, 13, 17, 29, 43, 47, 53]

L2SQ = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
    "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
)


def _subspace_bounds(dim: int, m: int) -> list[tuple[int, int]]:
    """1-based (start, length) slices splitting ``dim`` into ``m``
    contiguous subspaces; dim must divide evenly (as in FAISS)."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d = dim // m
    return [(1 + i * d, d) for i in range(m)]


def _subvectors(
    emb: DataFrame, m: int, dim: int, id_col: str, vec_col: str
) -> DataFrame:
    """(vec_id, sub, sv): ONE scan of the corpus exploded into its m
    subvectors (an explode over an m-element literal-struct array —
    not m unioned re-scans)."""
    v = _as_double(emb, id_col, vec_col, "vec_id", "v")
    parts = F.array(
        *[
            F.struct(F.lit(i).alias("sub"), F.slice("v", start, length).alias("sv"))
            for i, (start, length) in enumerate(_subspace_bounds(dim, m))
        ]
    )
    return v.select("vec_id", F.explode(parts).alias("p")).select(
        "vec_id", F.col("p.sub").alias("sub"), F.col("p.sv").alias("sv")
    )


def _codebook_frame(
    emb: DataFrame,
    m: int,
    codebook_ids: list[int] | None,
    id_col: str,
    vec_col: str,
    dim: int,
) -> DataFrame:
    """(sub, code, cw): per-subspace codewords = subvectors of the fixed
    seed ids, code ordinal = rank of the seed id (ascending). m*ksub
    rows — broadcast-sized by construction."""
    ids = codebook_ids or DEFAULT_CODEBOOK_IDS
    v = _as_double(emb, id_col, vec_col, "vec_id", "v")
    seeds = v.where(F.col("vec_id").isin(ids))
    w = Window.orderBy(F.col("vec_id").asc())
    seeds = seeds.withColumn("code", F.row_number().over(w) - F.lit(1))
    subs = [
        seeds.select(
            F.lit(i).alias("sub"),
            "code",
            F.slice("v", start, length).alias("cw"),
        )
        for i, (start, length) in enumerate(_subspace_bounds(dim, m))
    ]
    out = subs[0]
    for s in subs[1:]:
        out = out.unionByName(s)
    return out


def pq_encode(
    emb: DataFrame,
    m: int = 8,
    codebook_ids: list[int] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """(vec_id, sub, code): per subspace, the codeword minimizing
    squared L2 to the vector's subvector (tiebreak: smaller code).
    This long form is the join-ready layout; at rest a 100-TB table
    stores ``array<tinyint>`` via a groupBy collect_list sorted by sub
    (see ``pq_codes_wide``)."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    cb = codebooks if codebooks is not None else _codebook_frame(
        emb, m, codebook_ids, id_col, vec_col, dim
    )
    sv = _subvectors(emb, m, dim, id_col, vec_col)
    d2 = L2SQ.format(a="sv", b="cw")
    scored = sv.join(F.broadcast(cb), "sub").withColumn(
        "d2", F.round(F.expr(d2), 6)
    )
    w = Window.partitionBy("vec_id", "sub").orderBy(
        F.col("d2").asc(), F.col("code").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "sub", "code")
    )


def pq_codes_wide(codes_long: DataFrame) -> DataFrame:
    """(vec_id, codes array<int>) — the at-rest storage layout
    (m bytes/vector once cast to tinyint on write)."""
    return codes_long.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "code"))), lambda s: s["code"]
        ).alias("codes")
    )


def pq_adc_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    m: int = 8,
    codebook_ids: list[int] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: DataFrame | None = None,
    codes_long: DataFrame | None = None,
    rerank: int | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k by ADC dot product: score(vec) =
    sum_sub dot(q_sub, codeword(codes[vec][sub])). The query's raw
    vector is read (1 row); corpus vectors are touched only through
    their codes. Returns (vec_id, adc_dot, rank), ordered
    (adc_dot desc, vec_id asc) — deterministic, oracle-mirrored.

    ``rerank=R`` adds the standard quantized-scan refine stage (FAISS
    IndexRefineFlat): take the ADC top-R, re-score those R rows with
    EXACT cosine against the raw vectors, return the exact top-k of the
    refined set as (vec_id, cos, rank). R is a constant independent of
    corpus size, so the refine reads R raw vectors no matter how large
    the table is — the memory story (codes-only scan) survives, while
    recall@k jumps (measured 0.9 at R=100 vs 0.3 plain on the test
    vectors).

    ``dim`` (the embedding width) is schema metadata callers usually
    know statically — pass it to avoid the 1-row driver read."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    cb = codebooks if codebooks is not None else _codebook_frame(
        emb, m, codebook_ids, id_col, vec_col, dim
    )
    codes = codes_long if codes_long is not None else pq_encode(
        emb, m, codebook_ids, id_col, vec_col, dim, codebooks=cb
    )
    q = _subvectors(
        emb.where(F.col(id_col) == query_vec_id), m, dim, id_col, vec_col
    ).select("sub", F.col("sv").alias("qs"))
    dot = DOT.format(a="qs", b="cw")
    lut = cb.join(q, "sub").select(
        "sub", "code", F.round(F.expr(dot), 6).alias("part")
    )
    scored = (
        codes.where(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(lut), ["sub", "code"])
        .groupBy("vec_id")
        .agg(F.round(F.sum("part"), 6).alias("adc_dot"))
    )
    if rerank is None:
        top = scored.orderBy(F.col("adc_dot").desc(), F.col("vec_id").asc()).limit(k)
        w = Window.orderBy(F.col("adc_dot").desc(), F.col("vec_id").asc())
        return top.select(
            "vec_id", "adc_dot", F.row_number().over(w).cast("int").alias("rank")
        )
    cand = (
        scored.orderBy(F.col("adc_dot").desc(), F.col("vec_id").asc())
        .limit(int(rerank))
        .select("vec_id")
    )
    v = _as_double(emb, id_col, vec_col, "vec_id", "v")
    qv = v.where(F.col("vec_id") == query_vec_id).select(F.col("v").alias("qv"))
    dotvq = DOT.format(a="v", b="qv")
    na, nq = NORM.format(a="v"), NORM.format(a="qv")
    refined = (
        v.join(F.broadcast(cand), "vec_id")
        .crossJoin(F.broadcast(qv))
        .withColumn("cos", F.round(F.expr(dotvq) / (F.expr(na) * F.expr(nq)), 6))
        .select("vec_id", "cos")
    )
    top = refined.orderBy(F.col("cos").desc(), F.col("vec_id").asc()).limit(k)
    w = Window.orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return top.select(
        "vec_id", "cos", F.row_number().over(w).cast("int").alias("rank")
    )


def ivfpq_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    nprobe: int = 2,
    m: int = 8,
    codebook_ids: list[int] | None = None,
    centroid_ids: list[int] | None = None,
    rerank: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ composition (the IVFADC index of Jégou et al. 2011 —
    faiss ``IVFx,PQy``, the k-NN plugin's disk-based mode): the coarse
    quantizer prunes the corpus to ``nprobe`` buckets (partition
    pruning when the table is written partitioned by ``centroid_id``),
    the PQ codes of ONLY those buckets are ADC-scanned, and ``rerank``
    optionally refines the top-R with exact cosine. Per query the work
    is O(nprobe/K · n) code lookups + R raw-vector reads — the full
    100-TB serving shape. Deterministic (fixed centroid + codeword
    seeds) and fully replayed by the DuckDB oracle."""
    from .similarity import ivf_assign

    dim = len(emb.select(vec_col).first()[0])
    ids = centroid_ids  # None -> similarity.DEFAULT_CENTROID_IDS inside
    assigned = ivf_assign(emb, ids, id_col, vec_col)
    from .similarity import DEFAULT_CENTROID_IDS

    cids = ids or DEFAULT_CENTROID_IDS
    q = assigned.where(F.col("vec_id") == query_vec_id).select(F.col("v").alias("qv"))
    cents = _as_double(emb, id_col, vec_col, "centroid_id", "cv").where(
        F.col("centroid_id").isin(cids)
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
    bucket_ids = assigned.join(F.broadcast(probe), "centroid_id").select("vec_id")
    restricted = emb.join(
        F.broadcast(bucket_ids.withColumnRenamed("vec_id", id_col)), id_col
    )
    # codes for the probed buckets only (at ingest scale the codes are a
    # stored column; computing them on the restricted frame here keeps
    # the test path cheap without changing semantics)
    cb = _codebook_frame(emb, m, codebook_ids, id_col, vec_col, dim)
    return pq_adc_topk(
        restricted, query_vec_id, k=k, m=m, codebook_ids=codebook_ids,
        id_col=id_col, vec_col=vec_col, codebooks=cb, rerank=rerank,
    )


def train_pq_codebooks(
    emb: DataFrame,
    m: int = 8,
    ksub: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_ids: list[int] | None = None,
) -> DataFrame:
    """Deterministic per-subspace Lloyd k-means over subvectors (seeded
    from fixed vec_ids, no RNG). All m subspaces train in the SAME two
    jobs per round (subspace is just a key in the assign/mean frames),
    so iters x 2 jobs total; driver state is the m x ksub x dsub
    codebook literal — broadcast-sized. Returns a (sub, code, cw)
    frame usable as ``codebooks=`` in encode/ADC. Empty clusters keep
    their previous codeword (standard fix)."""
    ids = (seed_ids or DEFAULT_CODEBOOK_IDS)[:ksub]
    dim = len(emb.select(vec_col).first()[0])
    bounds = _subspace_bounds(dim, m)
    spark = emb.sparkSession
    v = _as_double(emb, id_col, vec_col, "vec_id", "v")
    sv = _subvectors(emb, m, dim, id_col, vec_col).cache()
    seed_rows = (
        v.where(F.col("vec_id").isin(ids)).orderBy("vec_id").select("v").collect()
    )
    books = {
        (i, c): [float(x) for x in row["v"][s - 1 : s - 1 + l]]
        for i, (s, l) in enumerate(bounds)
        for c, row in enumerate(seed_rows)
    }
    d2 = L2SQ.format(a="sv", b="cw")
    for _ in range(iters):
        cdf = spark.createDataFrame(
            [(i, c, cw) for (i, c), cw in sorted(books.items())],
            "sub int, code int, cw array<double>",
        )
        assigned = (
            sv.join(F.broadcast(cdf), "sub")
            .withColumn("d2", F.round(F.expr(d2), 6))
        )
        w = Window.partitionBy("vec_id", "sub").orderBy(
            F.col("d2").asc(), F.col("code").asc()
        )
        assigned = assigned.withColumn("rn", F.row_number().over(w)).where(
            F.col("rn") == 1
        )
        means = (
            assigned.select("sub", "code", F.posexplode("sv").alias("d", "x"))
            .groupBy("sub", "code", "d")
            .agg(F.avg("x").alias("mu"))
            .groupBy("sub", "code")
            .agg(
                F.map_from_entries(F.collect_list(F.struct("d", "mu"))).alias("mm")
            )
            .collect()
        )
        for r in means:
            dsub = len(books[(r["sub"], r["code"])])
            books[(r["sub"], r["code"])] = [
                float(r["mm"].get(d, 0.0)) for d in range(dsub)
            ]
    sv.unpersist()
    return spark.createDataFrame(
        [(i, c, cw) for (i, c), cw in sorted(books.items())],
        "sub int, code int, cw array<double>",
    )


def pq_recall_frame(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    m: int = 8,
    codebook_ids: list[int] | None = None,
    codebooks: DataFrame | None = None,
    rerank: int | None = None,
) -> DataFrame:
    """One-row (exact_k, matched, recall): recall@k of the PQ-ADC path
    vs exact cosine brute force. The exact side never sees the
    quantizer, so this row catches encode/ADC regressions the mirrored
    parity oracle cannot (same rationale as ``ivf_recall_frame``)."""
    exact = cosine_topk(emb, query_vec_id, k=k).select("vec_id")
    approx = pq_adc_topk(
        emb, query_vec_id, k=k, m=m, codebook_ids=codebook_ids,
        codebooks=codebooks, rerank=rerank,
    ).select("vec_id", F.lit(1).alias("hit"))
    joined = exact.join(approx, "vec_id", "left")
    return joined.agg(
        F.count(F.lit(1)).alias("exact_k"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("matched"),
    ).select(
        "exact_k",
        "matched",
        F.round(F.col("matched") / F.col("exact_k"), 4).alias("recall"),
    )
