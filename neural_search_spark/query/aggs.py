"""Aggregations over hybrid-query-matched docs — the §2.10 families the
reference exercises in its hybrid-aggregation ITs.

Every function takes the ``matched`` doc-id frame (the hybrid result
set) plus the source ``docs`` table and returns a DataFrame; the math is
pure JVM-side SQL (no Python in any hot path), shapes chosen for the
100 TB regime: the matched set joins against docs on the (uniform)
doc key, bucket counts are partial-aggregated map-side, and every
"top buckets" cut is a TakeOrderedAndProject.

Reference analogs:
 * cardinality / percentile_ranks / scripted_metric —
   MetricAggregationsWithHybridQueryIT.java:83-207
 * range / sampler / diversified_sampler / nested / global —
   BucketAggregationsWithHybridQueryIT.java:70-410
 * stats_bucket (bucket_stats) / bucket_sort —
   PipelineAggregationsWithHybridQueryIT.java:55-97

The HLL cardinality sketch is re-derived from the published
HyperLogLog algorithm (Flajolet et al. 2007) with one engineering
twist for oracle parity: the register harmonic sum Σ 2^(-M_j) is kept
as the exact integer Σ 2^(maxrho - M_j) (all terms and the total fit
int64), so Spark and DuckDB agree bit-for-bit before the single final
float division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..pipeline.hashing import hash64_sql

# --- HyperLogLog (dual-dialect, deterministic) -------------------------

HLL_P = 8                      # 2^8 = 256 registers
HLL_M = 1 << HLL_P
HLL_REM_BITS = 56 - HLL_P      # md5-56bit hash minus the bucket bits
HLL_MAX_RHO = HLL_REM_BITS + 1
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# numerator of the raw estimate, precomputed in ONE python float so both
# dialects divide the identical constant by the identical integer Z
_HLL_NUM = HLL_ALPHA * HLL_M * HLL_M * float(1 << HLL_MAX_RHO)


def _hll_rho_case(rem: str) -> str:
    """rho = 1-indexed position of the leftmost 1-bit of the
    HLL_REM_BITS-wide remainder (0 → HLL_MAX_RHO). Pure comparisons —
    identical syntax in Spark SQL and DuckDB."""
    whens = " ".join(
        f"WHEN {rem} >= {1 << (HLL_REM_BITS - j)} THEN {j}"
        for j in range(1, HLL_REM_BITS + 1)
    )
    return f"(CASE {whens} ELSE {HLL_MAX_RHO} END)"


def hll_parts_sql(col: str) -> dict[str, dict[str, str]]:
    """Per-dialect (bucket, rho) expressions over a string column."""
    mask = (1 << HLL_REM_BITS) - 1
    spark_h, duck_h = hash64_sql(col)
    out = {}
    for name, h, shift in (
        ("spark", spark_h, f"shiftright({spark_h}, {HLL_REM_BITS})"),
        ("duck", duck_h, f"({duck_h} >> {HLL_REM_BITS})"),
    ):
        rem = f"({h} & {mask})"
        out[name] = {"bucket": shift, "rho": _hll_rho_case(rem)}
    return out


def hll_estimate_sql(z_total: str, v: str) -> str:
    """Estimate from the exact-integer harmonic sum ``z_total`` =
    Σ 2^(HLL_MAX_RHO - M_j) (absent registers included at M=0) and the
    zero-register count ``v``; linear-counting small-range correction as
    published. Dialect-neutral."""
    raw = f"({_HLL_NUM!r} / {z_total})"
    lc = f"({HLL_M} * ln({HLL_M} * 1.0 / {v}))"
    return f"(CASE WHEN {v} > 0 AND {raw} <= {2.5 * HLL_M} THEN {lc} ELSE {raw} END)"


def cardinality_hll(ids: DataFrame, col: str) -> DataFrame:
    """1 row (hll_estimate, exact, nonzero_registers): HLL cardinality
    of ``col``'s distinct values next to the exact count.

    At 100 TB the register table is the whole shuffle: 256 rows after a
    map-side-combining groupBy — the sketch IS the reduction, the exact
    count alongside is for the parity check (the reference's cardinality
    agg is exactly this HLL++ shape, precision_threshold →
    register count). [MetricAggregationsWithHybridQueryIT.java:207]
    """
    parts = hll_parts_sql(col)["spark"]
    regs = (
        ids.select(
            F.expr(parts["bucket"]).alias("bucket"), F.expr(parts["rho"]).alias("rho")
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("M"))
    )
    z = regs.agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_MAX_RHO} - M)")).alias("z_present"),
        F.count(F.lit(1)).alias("nonzero"),
    ).select(
        (F.col("z_present") + (F.lit(HLL_M) - F.col("nonzero")) * F.lit(1 << HLL_MAX_RHO)).alias(
            "z_total"
        ),
        (F.lit(HLL_M) - F.col("nonzero")).alias("v"),
        F.col("nonzero").cast("long").alias("nonzero_registers"),
    )
    exact = ids.agg(F.countDistinct(F.expr(col)).alias("exact"))
    est = hll_estimate_sql("z_total", "v")
    return (
        z.crossJoin(F.broadcast(exact))
        .select(
            F.round(F.expr(est), 4).alias("hll_estimate"),
            F.col("exact"),
            "nonzero_registers",
        )
    )


# --- metric aggs -------------------------------------------------------

def cardinality_exact(matched: DataFrame, docs: DataFrame, field: str = "source") -> DataFrame:
    """Exact-mode cardinality — the reference's behavior below
    precision_threshold [MetricAggregationsWithHybridQueryIT.java:207]."""
    return (
        matched.join(docs, "doc_id")
        .agg(F.countDistinct(field).alias("cardinality"))
    )


def percentile_ranks(
    matched: DataFrame, docs: DataFrame, field: str, values: list[int]
) -> DataFrame:
    """(value, pct): % of matched docs with field <= value — inverse
    percentiles [MetricAggregationsWithHybridQueryIT.java:83-179]."""
    vals = F.array(*[F.lit(int(v)) for v in values])
    return (
        matched.join(docs, "doc_id")
        .select(field, F.explode(vals).alias("value"))
        .groupBy("value")
        .agg(
            F.round(
                F.avg(F.when(F.col(field) <= F.col("value"), 1.0).otherwise(0.0)) * 100, 4
            ).alias("pct")
        )
    )


SCRIPT_LANG_WEIGHT = "(CASE WHEN lang = 'en' THEN 1.0 WHEN lang = 'de' THEN 0.8 WHEN lang = 'fr' THEN 0.6 ELSE 0.5 END)"


def scripted_metric(matched: DataFrame, docs: DataFrame) -> DataFrame:
    """map/combine/reduce scripted_metric: per-doc script emits
    n_chars × lang-weight, combine sums per partition (Spark's partial
    agg IS the combine phase), reduce sums partials
    [MetricAggregationsWithHybridQueryIT.java:83-179]."""
    return (
        matched.join(docs, "doc_id")
        .agg(
            F.round(F.sum(F.expr(f"n_chars * {SCRIPT_LANG_WEIGHT}")), 4).alias("script_value"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --- bucket aggs -------------------------------------------------------

def range_buckets(
    matched: DataFrame, docs: DataFrame, field: str, bounds: list[int]
) -> DataFrame:
    """Range bucket agg with OpenSearch-style keys ("*-150", "150-300",
    "300-*"); docs landing in no bucket are impossible (half-open cover)
    [BucketAggregationsWithHybridQueryIT.java:70-228]."""
    whens = []
    edges = [None, *bounds, None]
    for lo, hi in zip(edges[:-1], edges[1:]):
        key = f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"
        cond = []
        if lo is not None:
            cond.append(f"{field} >= {lo}")
        if hi is not None:
            cond.append(f"{field} < {hi}")
        whens.append(f"WHEN {' AND '.join(cond) or 'TRUE'} THEN '{key}'")
    bucket = f"(CASE {' '.join(whens)} END)"
    return (
        matched.join(docs, "doc_id")
        .groupBy(F.expr(bucket).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg(field), 4).alias("avg_val"))
    )


def sampler_agg(scores: DataFrame, docs: DataFrame, shard_size: int = 100) -> DataFrame:
    """sampler bucket agg: sub-aggs run over only the ``shard_size``
    best-scoring matched docs (deterministic score/doc_id cut — a
    TakeOrderedAndProject, then a tiny broadcast join)
    [BucketAggregationsWithHybridQueryIT.java:410]."""
    # the cut orders on the ROUNDED score: collapses cross-engine float
    # ulp noise at the sample boundary (same rule as the oracle)
    top = (
        scores.orderBy(F.round("score", 4).desc(), F.col("doc_id").asc())
        .limit(shard_size)
        .select("doc_id")
    )
    return (
        docs.join(F.broadcast(top), "doc_id")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("n_chars"), 4).alias("avg_chars"))
    )


def diversified_sampler_agg(
    scores: DataFrame,
    docs: DataFrame,
    div_field: str = "source",
    max_docs_per_value: int = 2,
    shard_size: int = 50,
) -> DataFrame:
    """diversified_sampler: like sampler but at most
    ``max_docs_per_value`` docs per ``div_field`` value enter the sample
    (best-scored kept), de-skewing dominant sources
    [BucketAggregationsWithHybridQueryIT.java:410]."""
    from pyspark.sql import Window

    w = Window.partitionBy(div_field).orderBy(F.round("score", 4).desc(), F.col("doc_id").asc())
    diversified = (
        scores.join(docs.select("doc_id", div_field), "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= max_docs_per_value)
        .drop("rn", div_field)
    )
    return sampler_agg(diversified, docs, shard_size)


def nested_chunks_agg(matched: DataFrame, docs: DataFrame, delimiter: str) -> DataFrame:
    """nested agg: parent docs own an array of chunk children (the
    delimiter chunker's output = the nested field); buckets are over the
    PARENT's lang, metrics over the CHILD chunks — the join-to-children
    shape of Lucene's nested docs [BucketAggregationsWithHybridQueryIT
    .java:70-228]. One explode, no extra shuffle beyond the bucket agg."""
    from ..operators.chunkers import delimiter_chunks_sql

    spark_expr, _ = delimiter_chunks_sql("text", delimiter)
    return (
        matched.join(docs, "doc_id")
        .select("lang", F.explode(F.expr(spark_expr)).alias("chunk"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.round(F.avg(F.length("chunk")), 4).alias("avg_chunk_chars"),
        )
    )


def global_agg(matched: DataFrame, docs: DataFrame) -> DataFrame:
    """global bucket: metrics over ALL docs alongside the query-scoped
    ones — two 1-row aggregates crossJoined (no widened shuffle)
    [BucketAggregationsWithHybridQueryIT.java:70-228]."""
    m = matched.join(docs, "doc_id").agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars_matched"),
    )
    g = docs.agg(
        F.count(F.lit(1)).alias("n_global"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars_global"),
    )
    return m.crossJoin(F.broadcast(g))


# --- pipeline aggs -----------------------------------------------------

def _lang_buckets(matched: DataFrame, docs: DataFrame) -> DataFrame:
    return (
        matched.join(docs, "doc_id")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("n_chars"), 4).alias("avg_chars"))
    )


def bucket_stats(matched: DataFrame, docs: DataFrame) -> DataFrame:
    """stats_bucket sibling pipeline agg over the lang buckets' doc
    counts [PipelineAggregationsWithHybridQueryIT.java:55-97]."""
    return _lang_buckets(matched, docs).agg(
        F.min("n").alias("min_n"),
        F.max("n").alias("max_n"),
        F.round(F.avg("n"), 4).alias("avg_n"),
        F.sum("n").alias("sum_n"),
        F.count(F.lit(1)).alias("n_buckets"),
    )


def bucket_sort(
    matched: DataFrame, docs: DataFrame, size: int = 3, frm: int = 1
) -> DataFrame:
    """bucket_sort pipeline agg: order lang buckets by a metric
    (avg_chars desc, lang asc tiebreak), apply from/size truncation
    [PipelineAggregationsWithHybridQueryIT.java:55-97]."""
    from pyspark.sql import Window

    b = _lang_buckets(matched, docs)
    w = Window.orderBy(F.col("avg_chars").desc(), F.col("lang").asc())
    return (
        b.withColumn("pos", F.row_number().over(w))
        .where((F.col("pos") > frm) & (F.col("pos") <= frm + size))
        .select("lang", "n", "avg_chars", F.col("pos").cast("int").alias("pos"))
    )
