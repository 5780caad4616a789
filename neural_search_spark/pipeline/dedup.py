"""Deduplication operators for training-data pipelines.

Five families, each a DataFrame pipeline designed for the 100 TB shape:

* exact        — content-hash groupBy (one shuffle on a 128-bit key).
* fingerprint  — order-insensitive token-set hash (catches shuffled docs).
* n-gram Jaccard — exact pair similarity via shingle self-join (the
  quadratic baseline; candidate join is keyed on shingle so only docs
  *sharing* a shingle ever meet — still the scale-limited path).
* MinHash + LSH — the scale path: per-doc signatures (one groupBy), band
  keys, bucket self-join (candidates only from equal 4-row bands), exact
  Jaccard verification of the candidate set only.
* SimHash      — 48-bit tf-weighted fingerprint; near-dup pairs via
  chunk-banding (4 × 12-bit chunks) + Hamming verify.
* embedding cosine — near-dup pairs over array<float> embeddings.

All hash math is the dual-dialect md5-56-bit scheme in ``hashing.py`` so
the DuckDB oracles (``pipeline/oracle.py``) reproduce results exactly,
including the LSH banding (approximation behavior is part of the spec,
not noise).

Reference analog: the plugin has no dedup (Lucene handles doc identity);
these are the training-pipeline extensions mandated by the build brief.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.tokenize import simple_tokens_sql
from .hashing import hash64_sql, minhash_expr, minhash_params, shingles_sql

DEFAULT_NUM_PERM = 32
DEFAULT_BANDS = 8  # 8 bands x 4 rows


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, group_size, keep): md5-content groups, keeper = min id.

    One shuffle on the hash; at 100 TB the groupBy key is the 32-char
    md5 (uniform — no skew), and the window per group is O(dup count).
    """
    h = docs.select(F.col(id_col).alias("doc_id"), F.md5(text_col).alias("content_hash"))
    w = Window.partitionBy("content_hash")
    return h.select(
        "doc_id",
        F.count(F.lit(1)).over(w).alias("group_size"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("keep"),
    )


def _toks(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    spark_expr, _ = simple_tokens_sql(text_col)
    return docs.select(F.col(id_col).alias("doc_id"), F.expr(spark_expr).alias("toks"))


def fingerprint_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, group_size, keep) keyed on the *sorted distinct token set*
    hash — collapses token-shuffled near-copies exact dedup misses."""
    t = _toks(docs, id_col, text_col)
    fp = t.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct("toks")))).alias("fp"),
    )
    w = Window.partitionBy("fp")
    return fp.select(
        "doc_id",
        F.count(F.lit(1)).over(w).alias("group_size"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("keep"),
    )


def shingle_sets(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, shingle) — distinct n-gram shingles, exploded long form."""
    t = _toks(docs, id_col, text_col)
    spark_sh, _ = shingles_sql("toks", n)
    return t.select("doc_id", F.explode(F.expr(spark_sh)).alias("shingle"))


def _verify_jaccard(cands: DataFrame, sh: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard over candidate pairs only. ``cands``: (a, b) with
    a < b; ``sh``: (doc_id, shingle) distinct. Intersection via a
    two-sided shingle join keyed on the candidate ids; candidate sets are
    small relative to the corpus, so both joins broadcast the pair list."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        cands.join(sh.withColumnRenamed("doc_id", "a"), "a")
        .join(sh.withColumnRenamed("doc_id", "b"), ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n_sh", "na"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n_sh", "nb"), "b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 4).alias("jaccard"))
    )
    return out


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs (a < b, jaccard >= threshold).

    Candidates = docs sharing >= 1 shingle (self-join on shingle). This
    is the exact baseline; a shingle shared by m docs contributes m^2
    candidate rows, so at 100 TB use ``minhash_lsh_pairs`` instead.
    """
    # the shingle table feeds candidate generation, sizes, and the
    # intersection count — persist so tokenization runs once, not 4x
    sh = shingle_sets(docs, n, id_col, text_col).persist()
    a = sh.withColumnRenamed("doc_id", "a")
    b = sh.withColumnRenamed("doc_id", "b")
    cands = (
        a.join(b, "shingle")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        a.join(b, "shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n_sh", "na"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n_sh", "nb"), "b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 4).alias("jaccard"))
    )


def shingle_hash_arrays(
    docs: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, hs array<long>): each doc's DISTINCT shingle set as
    56-bit md5 hashes, computed entirely inside one projection —
    tokenize → shingle → hash → array_distinct are all per-row array
    expressions, so producing this frame involves NO shuffle and NO
    explode (the round-2 layout exploded ~token-count rows and paid a
    doc_id groupBy to re-assemble signatures). Docs with no shingles
    (fewer than n tokens) are dropped, matching the exploded layout's
    absence semantics."""
    t = _toks(docs, id_col, text_col)
    spark_sh, _ = shingles_sql("toks", n)
    spark_h, _ = hash64_sql("s")
    return t.select(
        "doc_id",
        F.expr(f"array_distinct(transform({spark_sh}, s -> {spark_h}))").alias("hs"),
    ).where(F.size("hs") > 0)


def _minhash_cols(num_perm: int) -> list:
    """mh_i = array_min over the permuted per-doc hash set — the same
    universal-hash math as the exploded layout's min() aggregate, as a
    per-row expression (no shuffle)."""
    return [
        F.expr(f"array_min(transform(hs, h -> {minhash_expr('h', a, b)}))").alias(
            f"mh{i}"
        )
        for i, (a, b) in enumerate(minhash_params(num_perm))
    ]


def minhash_signatures(
    docs: DataFrame,
    n: int = 1,
    num_perm: int = DEFAULT_NUM_PERM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, mh0..mh{P-1}) — per-row array expressions over the
    per-doc shingle-hash set; zero shuffles (scale shape: was one
    exploded-shingle groupBy in round 2)."""
    hs = shingle_hash_arrays(docs, n, id_col, text_col)
    return hs.select("doc_id", *_minhash_cols(num_perm))


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 2,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash-LSH near-dup pairs: signatures → band-bucket self-join →
    exact-Jaccard verify of candidates only (a < b, jaccard >= threshold).

    The bucket join is keyed on (band_idx, band_key) — uniform md5-derived
    keys, so no skew salting needed; candidate volume is O(collisions),
    not O(docs^2). Verification touches candidate pairs only.

    Round-3 layout: the whole pipeline runs over PER-DOC HASH-SET ARRAYS
    (``shingle_hash_arrays``) — tokenize/shingle/hash/minhash are per-row
    expressions, and the exact verify is ``array_intersect`` on the two
    docs' hash sets. Jaccard is over 56-bit md5 shingle hashes in BOTH
    engines (bit-identical across them; a hash collision would fold the
    same two shingles in both). Scale shape: the only shuffles left are
    the banded self-join and the two candidate joins — the round-2
    exploded layout additionally shuffled ~token-count rows through a
    doc_id groupBy and a two-sided shingle equi-join."""
    rows = num_perm // bands
    # shared by signatures AND verification — one tokenize+hash pass
    hs = shingle_hash_arrays(docs, n, id_col, text_col).persist()
    sig = hs.select("doc_id", *_minhash_cols(num_perm))
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band_idx"),
                F.concat_ws("-", *[F.col(f"mh{bi * rows + r}") for r in range(rows)]).alias(
                    "band_key"
                ),
            )
            for bi in range(bands)
        ]
    )
    banded = sig.select("doc_id", F.explode(band_structs).alias("bd")).select(
        "doc_id", F.col("bd.band_idx").alias("band_idx"), F.col("bd.band_key").alias("band_key")
    )
    a = banded.withColumnRenamed("doc_id", "a")
    b = banded.withColumnRenamed("doc_id", "b")
    cands = (
        a.join(b, ["band_idx", "band_key"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    # signature-estimate prefilter (standard LSH practice): the fraction
    # of equal minhashes is an unbiased Jaccard estimate; band collisions
    # at modest similarity are plentiful, so estimate first against the
    # broadcast signature table and run the exact hash-set verification
    # only on survivors. Margin 0.2 under the threshold keeps
    # P(drop a true pair) < 1% at 32 permutations; deterministic —
    # the DuckDB oracle applies the identical prefilter.
    est_min = int(np.ceil(max(0.0, threshold - 0.2) * num_perm))
    sig_arr = sig.select(
        "doc_id", F.array(*[F.col(f"mh{i}") for i in range(num_perm)]).alias("sig")
    )
    # no broadcast hints: the signature/hash-set tables are O(n_docs) —
    # Spark auto-broadcasts them at test scale and falls back to
    # shuffle joins on uniform doc ids at corpus scale
    eq = "size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))"
    cands = (
        cands.join(sig_arr.select(F.col("doc_id").alias("a"), F.col("sig").alias("sig_a")), "a")
        .join(sig_arr.select(F.col("doc_id").alias("b"), F.col("sig").alias("sig_b")), "b")
        .where(F.expr(eq) >= est_min)
        .select("a", "b")
    )
    joined = (
        cands.join(hs.select(F.col("doc_id").alias("a"), F.col("hs").alias("ha")), "a")
        .join(hs.select(F.col("doc_id").alias("b"), F.col("hs").alias("hb")), "b")
        .withColumn("inter", F.size(F.array_intersect("ha", "hb")))
        .withColumn(
            "jaccard",
            F.col("inter") / (F.size("ha") + F.size("hb") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 4).alias("jaccard"))
    )
    return joined


SIMHASH_BITS = 48  # stays exact in signed int64 in both engines
SIMHASH_CHUNKS = 4  # default banding for max_hamming <= 3


def simhash_chunks_for(max_hamming: int, bits: int = SIMHASH_BITS) -> int:
    """Smallest chunk count with *complete* recall at the requested
    radius: pigeonhole needs chunks >= max_hamming + 1, and the chunk
    width must tile ``bits`` exactly, so take the smallest divisor of
    ``bits`` that clears the bound."""
    need = max_hamming + 1
    for c in range(need, bits + 1):
        if bits % c == 0:
            return c
    return bits


def simhash(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = SIMHASH_BITS
) -> DataFrame:
    """(doc_id, simhash) — tf-weighted SimHash over tokens.

    Explode tokens → tf per (doc, token) → 56-bit token hash → per-bit
    signed tf sums (``bits`` aggregates in ONE doc_id groupBy, partial
    aggregation map-side) → assemble the fingerprint.
    """
    t = _toks(docs, id_col, text_col)
    tf = (
        t.select("doc_id", F.explode("toks").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    spark_h, _ = hash64_sql("token")
    tf = tf.withColumn("h", F.expr(spark_h))
    aggs = [
        F.sum(
            F.expr(f"CASE WHEN (shiftright(h, {j}) & 1) = 1 THEN tf ELSE -tf END")
        ).alias(f"s{j}")
        for j in range(bits)
    ]
    per_doc = tf.groupBy("doc_id").agg(*aggs)
    fp = None
    for j in range(bits):
        bit = F.when(F.col(f"s{j}") >= 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return per_doc.select("doc_id", fp.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = SIMHASH_BITS,
    chunks: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share >= 1 of ``chunks``
    equal bit-chunks (pigeonhole: any pair within max_hamming <= chunks-1
    differing bits collides on some chunk), verified by exact Hamming.
    ``chunks`` defaults to the smallest divisor of ``bits`` that makes
    the banding complete at the requested radius (chunks >= max_hamming+1
    — e.g. radius 6 over 48 bits → 8 x 6-bit chunks); passing a smaller
    value explicitly trades recall for fewer candidates."""
    if chunks is None:
        chunks = simhash_chunks_for(max_hamming, bits)
    width = bits // chunks
    mask = (1 << width) - 1
    sh = simhash(docs, id_col, text_col, bits)
    chunked = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_idx"),
                        F.expr(f"shiftright(simhash, {c * width}) & {mask}").alias("chunk_key"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("ck"),
    ).select("doc_id", "simhash", "ck.chunk_idx", "ck.chunk_key")
    a = chunked.select(
        F.col("doc_id").alias("a"), F.col("simhash").alias("sim_a"), "chunk_idx", "chunk_key"
    )
    b = chunked.select(
        F.col("doc_id").alias("b"), F.col("simhash").alias("sim_b"), "chunk_idx", "chunk_key"
    )
    return (
        a.join(b, ["chunk_idx", "chunk_key"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", F.bit_count(F.expr("sim_a ^ sim_b")).alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def embedding_near_dup(
    emb: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(a, b, cos) pairs with cosine >= threshold over array<float>.

    Exact all-pairs baseline (block-nested-loop cross join); rounds the
    cosine to 6 decimals *before* thresholding so the DuckDB oracle's
    float64 sum agrees at the boundary. The scale path is
    ``similarity.ivf_assign`` bucketing (join within cluster) or
    random-hyperplane LSH — all-pairs is O(n^2) by definition.
    """
    v = emb.select(
        F.col(id_col).alias("vid"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("v"),
    ).withColumn("nrm", F.expr("sqrt(aggregate(v, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x))"))
    a = v.select(F.col("vid").alias("a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = v.select(F.col("vid").alias("b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    dot = "aggregate(zip_with(va, vb, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    return (
        a.crossJoin(b)
        .where(F.col("a") < F.col("b"))
        .withColumn("cos", F.round(F.expr(dot) / (F.col("na") * F.col("nb")), 6))
        .where(F.col("cos") >= threshold)
        .select("a", "b", F.round("cos", 4).alias("cos"))
    )


# --- random-hyperplane LSH over embedding vectors ----------------------

RHP_BANDS = 8
RHP_BITS = 16


def rhp_sign(band: int, bit: int, d: int) -> float:
    """Deterministic ±1 hyperplane entry (md5-derived — dual-dialect
    constants, so Spark, DuckDB, and tests share the exact planes)."""
    from .hashing import py_hash64

    return 1.0 if py_hash64(f"rhp-{band}-{bit}-{d}") % 2 == 0 else -1.0


def rhp_band_key_exprs(
    vec_col: str, dim: int, bands: int, bits: int, one_based: bool
) -> list[str]:
    """Per-band integer bucket keys: bit r of band b is the sign of
    v · h_{b,r} (Charikar 2002 sign-random-projection); the ±1
    hyperplanes inline as constants so the whole thing is one codegen'd
    expression — no UDF, no stored model."""
    keys = []
    for b in range(bands):
        bits_sql = []
        for r in range(bits):
            terms = " + ".join(
                f"{vec_col}[{d + (1 if one_based else 0)}] * {rhp_sign(b, r, d)!r}"
                for d in range(dim)
            )
            bits_sql.append(f"(CASE WHEN ({terms}) >= 0 THEN {1 << r} ELSE 0 END)")
        keys.append("(" + " + ".join(bits_sql) + ")")
    return keys


def rhp_band_key_exprs_hof(
    vec_col: str, dim: int, bands: int, bits: int
) -> list[str]:
    """The same band keys as :func:`rhp_band_key_exprs`, expressed as
    interpreted higher-order functions over the hyperplane matrix as an
    array literal — nothing for Janino to compile. Bit-identical to the
    codegen form: ``zip_with`` + left-fold ``aggregate`` sums the dot
    product in index order, exactly the left-associated ``v[0]*s0 +
    v[1]*s1 + …`` of the inline expression, so every IEEE sign decision
    matches (measured: same pair set, sha-equal, BENCH/r5_lsh_impl.json).

    Trade-off (measured there): no ~4–6 s fixed Janino compile, but
    ~2.1× worse warm per-row cost at 512k vectors — use below the
    compile-amortization crossover only."""
    keys = []
    for b in range(bands):
        planes = ", ".join(
            "array(" + ", ".join(
                f"CAST({rhp_sign(b, r, d)!r} AS DOUBLE)" for d in range(dim)
            ) + ")"
            for r in range(bits)
        )
        keys.append(
            f"aggregate(sequence(0, {bits - 1}), 0L, (acc, r) -> acc + "
            f"(CASE WHEN aggregate(zip_with({vec_col}, "
            f"element_at(array({planes}), r + 1), (x, y) -> x * y), "
            f"CAST(0.0 AS DOUBLE), (s, x) -> s + x) >= 0 "
            f"THEN shiftleft(1L, r) ELSE 0L END))"
        )
    return keys


# Measured compile-vs-per-row crossover (BENCH/r5_lsh_impl.json): the
# codegen projection pays a ~4.5 s fixed Janino compile; the HOF form
# pays ~7.8 µs/row extra (dim 16 × 8 bands × 16 bits). Break-even
# ≈ 575k rows; 256k keeps a 2× safety margin on the fixed-cost side.
RHP_AUTO_THRESHOLD = 256_000


def embedding_lsh_pairs(
    vecs: DataFrame,
    threshold: float = 0.98,
    bands: int = RHP_BANDS,
    bits: int = RHP_BITS,
    dim: int | None = None,
    id_col: str = "doc_id",
    vec_col: str = "v",
    hamming_margin: float = 0.1,
    impl: str = "auto",
) -> DataFrame:
    """(a, b, cos) near-dup pairs via sign-random-projection LSH —
    the scale path for embedding dedup (replaces the all-pairs
    crossJoin of ``embedding_near_dup``).

    Candidates = pairs agreeing on ALL ``bits`` signs in >= 1 of
    ``bands`` bands; cosine verified exactly on candidates only. Bit
    agreement probability is 1 - θ/π (Charikar 2002): at the dedup
    regime (cos >= 0.98, θ <= 11.5°) a 16-bit band collides with
    p >= 0.35 and 8 bands give >= 97% recall, while random pairs
    (θ≈90°, p≈0.5 per bit) collide at ~2^-16 per band — candidate
    volume is a vanishing fraction of n². One explode + one
    equi-shuffle-join on uniform (band, key); no crossJoin anywhere.
    Zero-norm vectors are excluded (cosine undefined).

    Before the exact-cosine verification, a sign-Hamming PREFILTER
    (the minhash signature-estimate trick transposed to hyperplane
    bits): the band join already carries BOTH sides' full sign words,
    so each candidate's total disagreeing-bit count costs a few xor/
    popcounts inline — pairs whose estimated angle (hamming/total_bits
    × π) sits far above acos(threshold) never touch the vector arrays.

    RECALL BOUND (not a guarantee): both the banding and the
    ``hamming_margin``·π prefilter are probabilistic — a true pair with
    cos >= threshold CAN be dropped if its sign-Hamming estimate
    overshoots (E[hamming] at the threshold is ~6% of bits, so at the
    default margin the drop probability is a Chernoff-tail, but it is
    non-zero).  Because the DuckDB oracle applies the IDENTICAL
    prefilter, parity checks structurally cannot detect recall loss —
    the compensating check is ``lsh_pair_recall`` (recall measured
    against the exact all-pairs ``embedding_near_dup`` reference set;
    see tests/test_round3.py and the driver-gate query).  Raise
    ``hamming_margin`` (fraction of π added to acos(threshold)) to
    trade candidate volume for recall.

    ``impl`` picks the band-key projection form — ``codegen`` (inline
    constants, whole-stage codegen: best per-row cost, ~4.5 s fixed
    Janino compile), ``hof`` (interpreted higher-order functions:
    compile-free, ~2.1× per-row), or ``auto`` (default): a bounded
    ``limit(N+1).count()`` probe — it stops scanning at N+1 rows, so
    it stays cheap at any corpus size — picks hof under the measured
    crossover ``RHP_AUTO_THRESHOLD`` and codegen above it. Both forms
    produce bit-identical keys (BENCH/r5_lsh_impl.json)."""
    import math
    if dim is None:
        raise ValueError("dim is required (vector length)")
    if impl not in ("auto", "codegen", "hof"):
        raise ValueError(f"impl must be auto|codegen|hof, got [{impl}]")
    nonzero = "aggregate(v, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x) > 0.0"
    # base feeds banding AND both sides of the verification join —
    # persist so an upstream embedding pipeline computes once, not 3x
    base = vecs.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v")
    ).where(F.expr(nonzero)).persist()
    if impl == "auto":
        probe = base.limit(RHP_AUTO_THRESHOLD + 1).count()
        impl = "hof" if probe <= RHP_AUTO_THRESHOLD else "codegen"
    if impl == "hof":
        keys = rhp_band_key_exprs_hof("v", dim, bands, bits)
    else:
        keys = rhp_band_key_exprs("v", dim, bands, bits, one_based=False)
    # band keys become plain columns BEFORE the explode: the projection
    # is codegen-splittable per expression, while one giant
    # explode(array(struct(<8 × 16-plane dot products>))) exceeds
    # Janino's method-size limit and silently de-codegens the stage
    keyed = base.select(
        "vid", *[F.expr(k).alias(f"_bk{b}") for b, k in enumerate(keys)]
    )
    kcols = [f"_bk{b}" for b in range(bands)]
    banded = keyed.select(
        "vid",
        *kcols,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_idx"), F.col(f"_bk{b}").alias("band_key"))
                    for b in range(bands)
                ]
            )
        ).alias("bd"),
    ).select("vid", *kcols, "bd.band_idx", "bd.band_key")
    a = banded.select(
        F.col("vid").alias("a"), *[F.col(c).alias(f"a{c}") for c in kcols],
        "band_idx", "band_key",
    )
    b = banded.select(
        F.col("vid").alias("b"), *[F.col(c).alias(f"b{c}") for c in kcols],
        "band_idx", "band_key",
    )
    hamming = " + ".join(f"bit_count(a_bk{i} ^ b_bk{i})" for i in range(bands))
    max_ham = int(math.ceil((math.acos(threshold) / math.pi + hamming_margin) * bands * bits))
    cands = (
        a.join(b, ["band_idx", "band_key"])
        .where(F.col("a") < F.col("b"))
        .where(F.expr(hamming) <= max_ham)
        .select("a", "b")
        .distinct()
    )
    va = base.select(F.col("vid").alias("a"), F.col("v").alias("va"))
    vb = base.select(F.col("vid").alias("b"), F.col("v").alias("vb"))
    dot = "aggregate(zip_with(va, vb, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    na = "sqrt(aggregate(va, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x))"
    nb = "sqrt(aggregate(vb, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x))"
    return (
        cands.join(va, "a")
        .join(vb, "b")
        .withColumn("cos", F.round(F.expr(f"{dot} / ({na} * {nb})"), 6))
        .where(F.col("cos") >= threshold)
        .select("a", "b", F.round("cos", 4).alias("cos"))
    )


def dense_doc_vectors(docs: DataFrame, dim: int = 16) -> DataFrame:
    """(doc_id, v double[dim]) — dense_embed long form pivoted to a fixed
    array, the shared vector basis of the embedding-LSH family."""
    from ..operators.encoders import dense_embed

    emb_long = dense_embed(docs, dim=dim)
    return (
        emb_long.groupBy("doc_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("dim_idx", "val"))).alias("m"))
        .select(
            "doc_id",
            F.expr(
                f"transform(sequence(0, {dim - 1}), d -> coalesce(element_at(m, d), CAST(0.0 AS DOUBLE)))"
            ).alias("v"),
        )
    )


def recall_vs_exact_pairs(
    docs: DataFrame,
    threshold: float = 0.98,
    dim: int = 16,
    bands: int = RHP_BANDS,
    bits: int = RHP_BITS,
    hamming_margin: float = 0.1,
) -> DataFrame:
    """Measured pair recall of the LSH scale path vs the EXACT all-pairs
    reference set, on the same dense_embed vectors — the compensating
    check for the mirrored-oracle blind spot (the DuckDB parity oracle
    applies the identical banding/prefilter, so only this measurement
    can catch a banding/margin recall regression).

    One row: (exact_pairs, lsh_pairs, matched_pairs, recall). Tiny-N
    harness by construction — the exact side is the O(n^2) baseline."""
    vecs = dense_doc_vectors(docs, dim=dim).persist()
    exact = embedding_near_dup(vecs, threshold=threshold, id_col="doc_id", vec_col="v")
    lsh = embedding_lsh_pairs(
        vecs, threshold=threshold, bands=bands, bits=bits, dim=dim,
        id_col="doc_id", vec_col="v", hamming_margin=hamming_margin,
    )
    ex = exact.select("a", "b")
    ls = lsh.select("a", "b", F.lit(1).alias("in_lsh"))
    joined = ex.join(ls, ["a", "b"], "left")
    agg = joined.agg(
        F.count(F.lit(1)).alias("exact_pairs"),
        F.sum(F.coalesce(F.col("in_lsh"), F.lit(0))).alias("matched_pairs"),
    )
    n_lsh = lsh.agg(F.count(F.lit(1)).alias("lsh_pairs"))
    return (
        agg.crossJoin(n_lsh)
        .select(
            "exact_pairs",
            F.col("lsh_pairs").cast("long").alias("lsh_pairs"),
            F.col("matched_pairs").cast("long").alias("matched_pairs"),
            F.round(F.col("matched_pairs") / F.col("exact_pairs"), 4).alias("recall"),
        )
    )


# --- connected components / cluster dedup --------------------------------
#
# Near-dup PAIRS are not a dedup decision: "a~b, b~c" must collapse
# {a,b,c} into one group even though (a,c) never met in any LSH bucket.
# The production pipeline is pairs -> connected components -> keep one
# survivor per component. The reference plugin has no analog (Lucene
# never dedups); this is the training-pipeline extension the brief
# mandates, and at 100 TB it is THE step that turns candidate pairs
# into a deduplicated corpus.


def _orient(e: DataFrame) -> DataFrame:
    """Canonical edge orientation (u > v), self-loops dropped, distinct."""
    return (
        e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round: every node connects its LARGER neighbors to the
    minimum of its closed neighborhood. One symmetrize (no shuffle — a
    union of projections), one groupBy(u), one equi-join on u."""
    sym = e.select("u", "v").union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: every node connects its SMALLER-or-equal
    neighbors (plus itself) to the neighborhood minimum. Input/output
    invariant: u > v on every edge."""
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    nbr = (
        e.join(mins, "u")
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    own = mins.select("u", F.col("m").alias("v"))
    return nbr.union(own).where(F.col("u") != F.col("v")).distinct()


def connected_components(
    pairs: DataFrame, src: str = "a", dst: str = "b", max_iter: int = 64
) -> DataFrame:
    """(node, root) star edges for every non-root node: root = the
    minimum node id of the node's connected component.

    Alternating large-star / small-star contraction (Kiveris, Lattanzi,
    Mirrokni, Rastogi, Vassilvitskii, "Connected Components in MapReduce
    and Beyond", SoCC 2014): converges to min-rooted stars in
    O(log n) rounds — NOT O(diameter) like naive label propagation, so a
    1B-node near-dup graph needs ~30 rounds worst case, 2-4 in practice
    (near-dup components are clique-ish). Scale shape per round: one
    groupBy + one equi-join per star step, keyed on node ids (uniform);
    the emitted edges always point at component minima, so high-degree
    concentration on the root is bounded by the alternation (the paper's
    point) and AQE skew-split handles the residue. ``localCheckpoint``
    truncates lineage each round — without it the logical plan doubles
    per iteration and the driver, not the data, becomes the bottleneck.

    Deterministic: set semantics per round, min-based roots, no RNG.
    """
    e = _orient(
        pairs.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
    ).localCheckpoint(eager=True)  # checkpoint FIRST: the pair pipeline
    # upstream (LSH) is expensive — isEmpty() on the raw plan would
    # compute it once for the probe and again for the checkpoint
    if e.isEmpty():
        return e

    def sig(df):
        # order-insensitive edge-set signature: one map-side agg, no
        # shuffle — the cheap per-round convergence probe
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal(38,0) sum: int64 would ANSI-overflow; a signature
            # error in either direction is harmless (equal sets always
            # match, and a spurious match is rejected by the exact
            # subtract confirmation below)
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (r["n"], r["h"])

    prev = sig(e)
    for _ in range(max_iter):
        new = _small_star(_large_star(e)).localCheckpoint(eager=True)
        cur = sig(new)
        # signature match → confirm EXACTLY with one anti-join; doing
        # the subtract only at candidate convergence keeps the per-round
        # cost a map-side agg instead of a full edge-set shuffle
        if cur == prev and new.subtract(e).isEmpty():
            e = new
            break
        e, prev = new, cur
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    return e


def dedup_components(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, component_id) for EVERY doc: near-dup cluster id = min
    doc_id of the component; docs in no pair are their own component.
    One left join of the star edges onto the corpus ids."""
    roots = connected_components(pairs).withColumnRenamed("u", id_col)
    return (
        docs.select(F.col(id_col).cast("long").alias(id_col))
        .join(roots, id_col, "left")
        .select(id_col, F.coalesce("v", F.col(id_col)).alias("component_id"))
    )


def dedup_survivors(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Dedup decision per doc: (doc_id, component_id, group_size, keep)
    — keeper = min doc_id of its near-dup component. The window
    partitions on component_id (bounded by dup-cluster size, same skew
    profile as exact_dedup's content-hash window)."""
    comp = dedup_components(docs, pairs, id_col)
    w = Window.partitionBy("component_id")
    return comp.select(
        id_col,
        "component_id",
        F.count(F.lit(1)).over(w).alias("group_size"),
        (F.col(id_col) == F.min(id_col).over(w)).alias("keep"),
    )


def components_update(prior_roots: DataFrame, new_pairs: DataFrame,
                      src: str = "a", dst: str = "b") -> DataFrame:
    """Incrementally maintain components as new near-dup pairs arrive
    (the streaming-dedup path: each ingest micro-batch LSH-matches its
    docs against the corpus and feeds the pairs here).

    The prior (node, root) star edges ARE a connected-components
    certificate, so the update is just contraction over
    ``prior stars ∪ new pairs`` — the stars collapse every old
    component to depth 1, so the alternating-star rounds only pay for
    the NEW structure (near-constant rounds per batch), never a full
    recompute. Result is IDENTICAL to recomputing from the union of
    all pairs ever seen (pytest-pinned): min-rooted components are
    history-independent.
    """
    edges = prior_roots.select(F.col("u").alias("a"), F.col("v").alias("b")).unionByName(
        new_pairs.select(F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b"))
    )
    return connected_components(edges)


def doc_sketches(
    docs: DataFrame,
    n: int = 2,
    num_perm: int = DEFAULT_NUM_PERM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, hs, mh0..mh{P-1}) — the per-doc dedup sketch: distinct
    shingle-hash set (exact-verify side) plus the minhash signature
    (banding side), all per-row expressions, zero shuffles. This is the
    frame a streaming pipeline PERSISTS per ingest batch: pairs between
    any two doc sets can then be computed from sketches alone, without
    re-tokenizing anything already ingested."""
    hs = shingle_hash_arrays(docs, n, id_col, text_col)
    return hs.select("doc_id", "hs", *_minhash_cols(num_perm))


def _banded_keys(sig: DataFrame, num_perm: int, bands: int) -> DataFrame:
    rows = num_perm // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band_idx"),
                F.concat_ws("-", *[F.col(f"mh{bi * rows + r}") for r in range(rows)]).alias(
                    "band_key"
                ),
            )
            for bi in range(bands)
        ]
    )
    return sig.select("doc_id", F.explode(band_structs).alias("bd")).select(
        "doc_id", F.col("bd.band_idx").alias("band_idx"), F.col("bd.band_key").alias("band_key")
    )


def minhash_pairs_between(
    left_sketches: DataFrame,
    all_sketches: DataFrame,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    threshold: float = 0.7,
) -> DataFrame:
    """Near-dup pairs (a < b, jaccard >= threshold) with AT LEAST ONE
    side in ``left_sketches`` — the incremental-ingest shape: each new
    batch LSH-joins against the whole corpus's stored sketches (itself
    included) and every pair is emitted exactly once, by the batch its
    later member arrives in. Same banding, signature-estimate prefilter,
    and exact hash-set verification as ``minhash_lsh_pairs`` (identical
    pair set when left == all; pytest-pinned)."""
    lb = _banded_keys(left_sketches, num_perm, bands)
    ab = _banded_keys(all_sketches, num_perm, bands)
    cands = (
        lb.withColumnRenamed("doc_id", "x")
        .join(ab.withColumnRenamed("doc_id", "y"), ["band_idx", "band_key"])
        .where(F.col("x") != F.col("y"))
        .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .distinct()
    )
    est_min = int(np.ceil(max(0.0, threshold - 0.2) * num_perm))
    sig_arr = all_sketches.select(
        "doc_id", F.array(*[F.col(f"mh{i}") for i in range(num_perm)]).alias("sig")
    )
    eq = "size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))"
    cands = (
        cands.join(sig_arr.select(F.col("doc_id").alias("a"), F.col("sig").alias("sig_a")), "a")
        .join(sig_arr.select(F.col("doc_id").alias("b"), F.col("sig").alias("sig_b")), "b")
        .where(F.expr(eq) >= est_min)
        .select("a", "b")
    )
    hs = all_sketches.select("doc_id", "hs")
    return (
        cands.join(hs.select(F.col("doc_id").alias("a"), F.col("hs").alias("ha")), "a")
        .join(hs.select(F.col("doc_id").alias("b"), F.col("hs").alias("hb")), "b")
        .withColumn("inter", F.size(F.array_intersect("ha", "hb")))
        .withColumn("jaccard", F.col("inter") / (F.size("ha") + F.size("hb") - F.col("inter")))
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 4).alias("jaccard"))
    )
