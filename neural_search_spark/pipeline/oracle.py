"""DuckDB oracle SQL for the pipeline operators (dedup / similarity /
textstats / multimodal).

Generated from the same constants and dual-dialect expression builders
as the Spark side (hashing.py, textstats.py), so the driver's value-hash
compare checks the full semantics — including the LSH banding, whose
approximation behavior is deterministic and therefore part of the spec.
"""

from __future__ import annotations

from ..functions.tokenize import simple_tokens_sql
from .hashing import MERSENNE_P, hash64_sql, minhash_expr, minhash_params, shingles_sql
from .similarity import DEFAULT_CENTROID_IDS
from .textstats import BPE_ISH_RE, LANG_WORDS, PUNCT_RE, WINNOW_N, WS_RE
from . import dedup as _dedup

_, DUCK_TOKS = simple_tokens_sql("text")


def _ids(ids: list[int]) -> str:
    return "(" + ", ".join(str(i) for i in ids) + ")"


# --- dedup -------------------------------------------------------------

def exact_dedup_sql(table: str = "documents") -> str:
    return f"""
SELECT doc_id,
       count(*) OVER (PARTITION BY content_hash) AS group_size,
       doc_id = min(doc_id) OVER (PARTITION BY content_hash) AS keep
FROM (SELECT doc_id, md5(text) AS content_hash FROM {table})"""


def fingerprint_dedup_sql(table: str = "documents") -> str:
    return f"""
SELECT doc_id,
       count(*) OVER (PARTITION BY fp) AS group_size,
       doc_id = min(doc_id) OVER (PARTITION BY fp) AS keep
FROM (SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct({DUCK_TOKS})), ' ')) AS fp
      FROM {table})"""


def _shingle_ctes(n: int, table: str) -> str:
    _, duck_sh = shingles_sql("toks", n)
    return f"""
WITH tok AS (SELECT doc_id, {DUCK_TOKS} AS toks FROM {table}),
sh AS (SELECT doc_id, unnest({duck_sh}) AS shingle FROM tok),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id)"""


def ngram_jaccard_sql(n: int = 3, threshold: float = 0.4, table: str = "documents") -> str:
    return f"""{_shingle_ctes(n, table)},
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
)
SELECT a, b, round(inter * 1.0 / (sa.n_sh + sb.n_sh - inter), 4) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
WHERE inter * 1.0 / (sa.n_sh + sb.n_sh - inter) >= {threshold}"""


def minhash_lsh_sql(
    n: int = 2,
    num_perm: int = _dedup.DEFAULT_NUM_PERM,
    bands: int = _dedup.DEFAULT_BANDS,
    threshold: float = 0.7,
    table: str = "documents",
) -> str:
    import math

    rows = num_perm // bands
    _, duck_h = hash64_sql("shingle")
    mins = ", ".join(
        f"min({minhash_expr('h', a, b)}) AS mh{i}"
        for i, (a, b) in enumerate(minhash_params(num_perm))
    )
    est_min = int(math.ceil(max(0.0, threshold - 0.2) * num_perm))
    est_sum = " + ".join(
        f"(CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END)" for i in range(num_perm)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {bi} AS band_idx, concat_ws('-', {cols}) AS band_key FROM sig".format(
            bi=bi, cols=", ".join(f"mh{bi * rows + r}" for r in range(rows))
        )
        for bi in range(bands)
    )
    # jaccard is over the per-doc DISTINCT 56-bit shingle-hash SETS in
    # both engines (pipeline/dedup.py round-3 array layout) — identical
    # md5-derived hashes, so any collision folds identically here too
    return f"""{_shingle_ctes(n, table)},
hashed AS (SELECT DISTINCT doc_id, h FROM (SELECT doc_id, {duck_h} AS h FROM sh)),
hsizes AS (SELECT doc_id, count(*) AS n_sh FROM hashed GROUP BY doc_id),
sig AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
band AS ({band_selects}),
cand0 AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM band x JOIN band y
    ON x.band_idx = y.band_idx AND x.band_key = y.band_key AND x.doc_id < y.doc_id
),
cand AS (
  SELECT c.a, c.b
  FROM cand0 c JOIN sig sa ON sa.doc_id = c.a JOIN sig sb ON sb.doc_id = c.b
  WHERE ({est_sum}) >= {est_min}
),
inter AS (
  SELECT c.a, c.b, count(*) AS inter
  FROM cand c
  JOIN hashed ha ON ha.doc_id = c.a
  JOIN hashed hb ON hb.doc_id = c.b AND hb.h = ha.h
  GROUP BY c.a, c.b
)
SELECT a, b, round(inter * 1.0 / (sa.n_sh + sb.n_sh - inter), 4) AS jaccard
FROM inter JOIN hsizes sa ON sa.doc_id = a JOIN hsizes sb ON sb.doc_id = b
WHERE inter * 1.0 / (sa.n_sh + sb.n_sh - inter) >= {threshold}"""


def _simhash_ctes(table: str, bits: int) -> str:
    _, duck_h = hash64_sql("token")
    sums = ", ".join(
        f"sum(CASE WHEN ((h >> {j}) & 1) = 1 THEN tf ELSE -tf END) AS s{j}" for j in range(bits)
    )
    fp = " + ".join(f"(CASE WHEN s{j} >= 0 THEN {1 << j} ELSE 0 END)" for j in range(bits))
    return f"""
WITH tok AS (SELECT doc_id, {DUCK_TOKS} AS toks FROM {table}),
tf AS (
  SELECT doc_id, token, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS token FROM tok) GROUP BY doc_id, token
),
hashed AS (SELECT doc_id, tf, {duck_h} AS h FROM tf),
sums AS (SELECT doc_id, {sums} FROM hashed GROUP BY doc_id),
fp AS (SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM sums)"""


def simhash_sql(table: str = "documents", bits: int = _dedup.SIMHASH_BITS) -> str:
    return f"""{_simhash_ctes(table, bits)}
SELECT doc_id, simhash FROM fp"""


def simhash_pairs_sql(
    max_hamming: int = 3,
    table: str = "documents",
    bits: int = _dedup.SIMHASH_BITS,
    chunks: int | None = None,
) -> str:
    if chunks is None:
        chunks = _dedup.simhash_chunks_for(max_hamming, bits)
    width = bits // chunks
    mask = (1 << width) - 1
    chunk_selects = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {c} AS chunk_idx, (simhash >> {c * width}) & {mask} AS chunk_key FROM fp"
        for c in range(chunks)
    )
    return f"""{_simhash_ctes(table, bits)},
chunked AS ({chunk_selects})
SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
       bit_count(xor(x.simhash, y.simhash)) AS hamming
FROM chunked x JOIN chunked y
  ON x.chunk_idx = y.chunk_idx AND x.chunk_key = y.chunk_key AND x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= {max_hamming}"""


def embedding_near_dup_sql(threshold: float = 0.45, table: str = "embeddings") -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM {table}),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
SELECT a.vec_id AS a, b.vec_id AS b,
       round(round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6), 4) AS cos
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= {threshold}"""


def components_sql(table: str = "documents", threshold: float = 0.7) -> str:
    """Connected components over the MinHash-LSH near-dup pairs: the
    oracle computes each node's reachable set by recursive transitive
    closure (UNION-distinct terminates) and takes its minimum — the same
    min-rooted components the Spark side reaches via alternating-star
    contraction. Every doc appears; singletons are their own component."""
    pairs = minhash_lsh_sql(table=table, threshold=threshold)
    return f"""WITH RECURSIVE pairs AS ({pairs}),
edges AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b AS u, a AS v FROM pairs),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
),
comp AS (SELECT u AS doc_id, min(v) AS mn FROM reach GROUP BY u)
SELECT d.doc_id,
       CAST(least(d.doc_id, coalesce(c.mn, d.doc_id)) AS BIGINT) AS component_id
FROM {table} d LEFT JOIN comp c ON c.doc_id = d.doc_id"""


def survivors_sql(table: str = "documents", threshold: float = 0.7) -> str:
    return f"""SELECT doc_id, component_id,
       count(*) OVER (PARTITION BY component_id) AS group_size,
       doc_id = min(doc_id) OVER (PARTITION BY component_id) AS keep
FROM ({components_sql(table, threshold)})"""


# --- similarity ---------------------------------------------------------

def cosine_topk_sql(
    query_vec_id: int,
    k: int = 10,
    table: str = "embeddings",
    predicate: str | None = None,
) -> str:
    """``predicate`` restricts CANDIDATES only (the query vector is
    looked up unfiltered) — the filtered-kNN contract shared with the
    Spark side. The predicate string is dialect-shared SQL over the
    table's raw columns."""
    cand_where = f"WHERE ({predicate})" if predicate else ""
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM {table}),
cand AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM {table} {cand_where}),
q AS (SELECT v AS qv FROM e WHERE vec_id = {query_vec_id}),
scored AS (
  SELECT cand.vec_id,
         round(list_dot_product(v, qv)
               / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos
  FROM cand, q WHERE vec_id <> {query_vec_id}
)
SELECT vec_id, cos,
       CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
FROM scored ORDER BY cos DESC, vec_id ASC LIMIT {k}"""


def knn_vector_sql(
    query_vec: list[float],
    k: int = 10,
    table: str = "embeddings",
    predicate: str | None = None,
) -> str:
    """Exact cosine top-k against a LITERAL query vector — the oracle
    for the raw ``knn`` DSL query (``cosine_topk_vector``). The vector
    literal is rendered with ``repr(float)`` (round-trip exact), so
    both engines score against bit-identical doubles. No
    self-exclusion: a literal query has no corpus row."""
    lit = "[" + ", ".join(repr(float(x)) for x in query_vec) + "]::DOUBLE[]"
    cand_where = f"WHERE ({predicate})" if predicate else ""
    return f"""
WITH cand AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM {table} {cand_where}),
q AS (SELECT {lit} AS qv),
scored AS (
  SELECT cand.vec_id,
         round(list_dot_product(v, qv)
               / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos
  FROM cand, q
)
SELECT vec_id, cos,
       CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
FROM scored ORDER BY cos DESC, vec_id ASC LIMIT {k}"""


def dsl_knn_sql(
    query_vec: list[float],
    k: int = 10,
    table: str = "embeddings",
    predicate: str | None = None,
) -> str:
    """The ``knn`` DSL body through ``search()`` — same math as
    ``knn_vector_sql``, reshaped to the search-hit contract
    (doc_id, score rounded at 4, rank). Ordering stays on the
    round-6 cosine, exactly the engine's topk convention."""
    inner = knn_vector_sql(query_vec, k=k, table=table, predicate=predicate)
    return (f"SELECT vec_id AS doc_id, round(cos, 4) AS score, rank "
            f"FROM ({inner})")


def script_score_knn_sql(
    query_vec: list[float],
    const: float = 1.0,
    k: int = 10,
    table: str = "embeddings",
    docs_table: str = "documents",
) -> str:
    """``script_score`` exact-kNN oracle: match_all over the documents
    table, score replaced by cosineSimilarity(params.v, doc[vec]) +
    const — the reference's documented exact-search recipe. Docs
    without an embedding row drop via the inner join (the translator's
    declared boundary). Orders on the round-6 cosine + const (the
    engine's pre-round-4 sort key)."""
    lit = "[" + ", ".join(repr(float(x)) for x in query_vec) + "]::DOUBLE[]"
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM {table}),
q AS (SELECT {lit} AS qv),
scored AS (
  SELECT d.doc_id,
         round(list_dot_product(v, qv)
               / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6)
         + {float(const)!r} AS s
  FROM {docs_table} d JOIN e ON e.vec_id = d.doc_id, q
)
SELECT doc_id, round(s, 4) AS score,
       CAST(row_number() OVER (ORDER BY s DESC, doc_id ASC) AS INT) AS rank
FROM scored ORDER BY s DESC, doc_id ASC LIMIT {k}"""


def cosine_msearch_sql(
    query_vec_ids: list[int], k: int = 10, table: str = "embeddings"
) -> str:
    """Exact per-query cosine top-k for a query BATCH — the oracle for
    ``hnsw_msearch`` (every query's graph answer must equal exact brute
    force, same contract as the single-query gate)."""
    ids = ", ".join(str(int(q)) for q in sorted(set(query_vec_ids)))
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM {table}),
q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id IN ({ids})),
scored AS (
  SELECT q.q_id, e.vec_id,
         round(list_dot_product(v, qv)
               / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos
  FROM e, q WHERE e.vec_id <> q.q_id
),
ranked AS (
  SELECT q_id, vec_id, cos,
         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
  FROM scored
)
SELECT q_id, vec_id, cos, rank FROM ranked WHERE rank <= {k}"""


def ivf_topk_sql(
    query_vec_id: int,
    k: int = 10,
    nprobe: int = 2,
    centroid_ids: list[int] | None = None,
    table: str = "embeddings",
) -> str:
    ids = centroid_ids or DEFAULT_CENTROID_IDS
    cos = (
        "round(list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) "
        "* sqrt(list_dot_product({b}, {b}))), 6)"
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM {table}),
c AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id IN {_ids(ids)}),
sim AS (SELECT e.vec_id, e.v, c.centroid_id, {cos.format(a='e.v', b='c.cv')} AS csim FROM e, c),
assigned AS (
  SELECT vec_id, v, centroid_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, centroid_id ASC) AS rn
    FROM sim) WHERE rn = 1
),
q AS (SELECT v AS qv FROM e WHERE vec_id = {query_vec_id}),
probe AS (
  SELECT centroid_id FROM c, q
  ORDER BY {cos.format(a='cv', b='qv')} DESC, centroid_id ASC LIMIT {nprobe}
),
scored AS (
  SELECT a.vec_id, {cos.format(a='a.v', b='qv')} AS cos
  FROM assigned a JOIN probe USING (centroid_id), q
  WHERE a.vec_id <> {query_vec_id}
)
SELECT vec_id, cos,
       CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
FROM scored ORDER BY cos DESC, vec_id ASC LIMIT {k}"""


def _pq_base_ctes(
    query_vec_id: int, m: int, dim: int, codebook_ids: list[int], table: str
) -> str:
    """Shared PQ oracle CTEs mirroring pipeline.quantization exactly:
    codebooks = subvectors of the fixed seed ids (code = rank of seed id
    asc), encode = per-(vec, sub) squared-L2 argmin (round 6, tiebreak
    code asc), ADC lut = round(dot(q_sub, cw), 6)."""
    d = dim // m
    sub_rows = " UNION ALL ".join(
        f"SELECT vec_id, code, {i} AS sub, list_slice(v, {1 + i * d}, {(i + 1) * d}) AS cw FROM seeds"
        for i in range(m)
    )
    sv_rows = " UNION ALL ".join(
        f"SELECT vec_id, {i} AS sub, list_slice(v, {1 + i * d}, {(i + 1) * d}) AS sv FROM e"
        for i in range(m)
    )
    q_rows = " UNION ALL ".join(
        f"SELECT {i} AS sub, list_slice(qv, {1 + i * d}, {(i + 1) * d}) AS qs FROM q0"
        for i in range(m)
    )
    l2 = "round(list_sum(list_transform(list_zip(sv, cw), x -> (x[1] - x[2]) * (x[1] - x[2]))), 6)"
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM {table}),
seeds AS (
  SELECT vec_id, v, CAST(row_number() OVER (ORDER BY vec_id ASC) - 1 AS INT) AS code
  FROM e WHERE vec_id IN {_ids(codebook_ids)}
),
cb AS ({sub_rows}),
sv AS ({sv_rows}),
codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT sv.vec_id, sv.sub, cb.code,
           row_number() OVER (PARTITION BY sv.vec_id, sv.sub
                              ORDER BY {l2} ASC, cb.code ASC) AS rn
    FROM sv JOIN cb USING (sub)) WHERE rn = 1
),
q0 AS (SELECT v AS qv FROM e WHERE vec_id = {query_vec_id}),
qsub AS ({q_rows}),
lut AS (
  SELECT cb.sub, cb.code, round(list_dot_product(qs, cw), 6) AS part
  FROM cb JOIN qsub USING (sub)
)"""


def pq_topk_sql(
    query_vec_id: int,
    k: int = 10,
    m: int = 8,
    dim: int = 64,
    codebook_ids: list[int] | None = None,
    table: str = "embeddings",
    rerank: int | None = None,
) -> str:
    """Oracle for pq_adc_topk: full replay of encode + ADC with
    list_slice/list_dot_product (pipeline/quantization.py); with
    ``rerank=R``, the exact-cosine refine of the ADC top-R."""
    from .quantization import DEFAULT_CODEBOOK_IDS

    ids = codebook_ids or DEFAULT_CODEBOOK_IDS
    base = f"""{_pq_base_ctes(query_vec_id, m, dim, ids, table)},
scored AS (
  SELECT c.vec_id, round(sum(part), 6) AS adc_dot
  FROM codes c JOIN lut USING (sub, code)
  WHERE c.vec_id <> {query_vec_id}
  GROUP BY c.vec_id
)"""
    if rerank is None:
        return f"""{base}
SELECT vec_id, adc_dot,
       CAST(row_number() OVER (ORDER BY adc_dot DESC, vec_id ASC) AS INT) AS rank
FROM scored ORDER BY adc_dot DESC, vec_id ASC LIMIT {k}"""
    return f"""{base},
cand AS (SELECT vec_id FROM scored ORDER BY adc_dot DESC, vec_id ASC LIMIT {int(rerank)}),
refined AS (
  SELECT e.vec_id,
         round(list_dot_product(v, qv)
               / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos
  FROM e JOIN cand USING (vec_id), q0
)
SELECT vec_id, cos,
       CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
FROM refined ORDER BY cos DESC, vec_id ASC LIMIT {k}"""


def ivfpq_topk_sql(
    query_vec_id: int,
    k: int = 10,
    nprobe: int = 2,
    m: int = 8,
    dim: int = 64,
    codebook_ids: list[int] | None = None,
    centroid_ids: list[int] | None = None,
    table: str = "embeddings",
    rerank: int | None = None,
) -> str:
    """Oracle for ivfpq_topk: IVF probe restricts the corpus, PQ
    codebooks come from the FULL table, encode + ADC run on the probed
    buckets only, optional exact-cosine refine of the ADC top-R —
    the exact composition pipeline/quantization.ivfpq_topk executes."""
    from .quantization import DEFAULT_CODEBOOK_IDS
    from .similarity import DEFAULT_CENTROID_IDS

    cb_ids = codebook_ids or DEFAULT_CODEBOOK_IDS
    cids = centroid_ids or DEFAULT_CENTROID_IDS
    d = dim // m
    cos = (
        "round(list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) "
        "* sqrt(list_dot_product({b}, {b}))), 6)"
    )
    sub_rows = " UNION ALL ".join(
        f"SELECT vec_id, code, {i} AS sub, list_slice(v, {1 + i * d}, {(i + 1) * d}) AS cw FROM seeds"
        for i in range(m)
    )
    sv_rows = " UNION ALL ".join(
        f"SELECT vec_id, {i} AS sub, list_slice(v, {1 + i * d}, {(i + 1) * d}) AS sv FROM e"
        for i in range(m)
    )
    q_rows = " UNION ALL ".join(
        f"SELECT {i} AS sub, list_slice(qv, {1 + i * d}, {(i + 1) * d}) AS qs FROM q0"
        for i in range(m)
    )
    l2 = "round(list_sum(list_transform(list_zip(sv, cw), x -> (x[1] - x[2]) * (x[1] - x[2]))), 6)"
    base = f"""
WITH full_e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM {table}),
c AS (SELECT vec_id AS centroid_id, v AS cv FROM full_e WHERE vec_id IN {_ids(cids)}),
sim AS (SELECT full_e.vec_id, full_e.v, c.centroid_id, {cos.format(a='full_e.v', b='c.cv')} AS csim FROM full_e, c),
assigned AS (
  SELECT vec_id, v, centroid_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, centroid_id ASC) AS rn
    FROM sim) WHERE rn = 1
),
qfull AS (SELECT v AS qv FROM full_e WHERE vec_id = {query_vec_id}),
probe AS (
  SELECT centroid_id FROM c, qfull
  ORDER BY {cos.format(a='cv', b='qv')} DESC, centroid_id ASC LIMIT {nprobe}
),
e AS (SELECT a.vec_id, a.v FROM assigned a JOIN probe USING (centroid_id)),
seeds AS (
  SELECT vec_id, v, CAST(row_number() OVER (ORDER BY vec_id ASC) - 1 AS INT) AS code
  FROM full_e WHERE vec_id IN {_ids(cb_ids)}
),
cb AS ({sub_rows}),
sv AS ({sv_rows}),
codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT sv.vec_id, sv.sub, cb.code,
           row_number() OVER (PARTITION BY sv.vec_id, sv.sub
                              ORDER BY {l2} ASC, cb.code ASC) AS rn
    FROM sv JOIN cb USING (sub)) WHERE rn = 1
),
q0 AS (SELECT v AS qv FROM e WHERE vec_id = {query_vec_id}),
qsub AS ({q_rows}),
lut AS (
  SELECT cb.sub, cb.code, round(list_dot_product(qs, cw), 6) AS part
  FROM cb JOIN qsub USING (sub)
),
scored AS (
  SELECT c2.vec_id, round(sum(part), 6) AS adc_dot
  FROM codes c2 JOIN lut USING (sub, code)
  WHERE c2.vec_id <> {query_vec_id}
  GROUP BY c2.vec_id
)"""
    if rerank is None:
        return f"""{base}
SELECT vec_id, adc_dot,
       CAST(row_number() OVER (ORDER BY adc_dot DESC, vec_id ASC) AS INT) AS rank
FROM scored ORDER BY adc_dot DESC, vec_id ASC LIMIT {k}"""
    return f"""{base},
cand AS (SELECT vec_id FROM scored ORDER BY adc_dot DESC, vec_id ASC LIMIT {int(rerank)}),
refined AS (
  SELECT e.vec_id, {cos.format(a='v', b='qv')} AS cos
  FROM e JOIN cand USING (vec_id), q0
)
SELECT vec_id, cos,
       CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
FROM refined ORDER BY cos DESC, vec_id ASC LIMIT {k}"""


def pq_recall_sql(
    query_vec_id: int,
    k: int = 10,
    m: int = 8,
    dim: int = 64,
    codebook_ids: list[int] | None = None,
    table: str = "embeddings",
    rerank: int | None = None,
) -> str:
    """Oracle for pq_recall_frame: exact cosine top-k (quantizer-
    independent) vs the PQ-ADC top-k overlap — the row that detects a
    silent encode/ADC recall regression."""
    exact = cosine_topk_sql(query_vec_id, k=k, table=table)
    approx = pq_topk_sql(query_vec_id, k=k, m=m, dim=dim,
                         codebook_ids=codebook_ids, table=table, rerank=rerank)
    return f"""
WITH exact AS (SELECT vec_id FROM ({exact})),
approx AS (SELECT vec_id FROM ({approx}))
SELECT count(*) AS exact_k,
       count(a.vec_id) AS matched,
       round(count(a.vec_id) / count(*), 4) AS recall
FROM exact e LEFT JOIN approx a USING (vec_id)"""


# --- textstats ----------------------------------------------------------

def _in_list_duck(col: str, words: list[str]) -> str:
    inner = ", ".join("'" + w + "'" for w in words)
    return f"len(list_filter({col}, x -> x IN ({inner})))"


def token_counts_sql(table: str = "documents") -> str:
    return f"""
SELECT doc_id,
       len({DUCK_TOKS}) AS n_tokens,
       len(list_filter(regexp_split_to_array(text, '{WS_RE}'), x -> x <> '')) AS n_ws_tokens,
       len(regexp_extract_all(text, '{BPE_ISH_RE}')) AS n_bpe_tokens
FROM {table}"""


def quality_scores_sql(table: str = "documents") -> str:
    toks = "toks"
    n_tok = f"len({toks})"
    tok_chars = f"coalesce(list_sum(list_transform({toks}, x -> length(x))), 0)"
    n_punct = f"len(regexp_extract_all(text, '{PUNCT_RE}'))"
    n_digit = "len(regexp_extract_all(text, '[0-9]'))"
    stop_hits = _in_list_duck(toks, LANG_WORDS["en"])
    return f"""
WITH t AS (SELECT doc_id, text, {DUCK_TOKS} AS toks, length(text) AS n_chars FROM {table})
SELECT doc_id,
       n_chars,
       {n_tok} AS n_tokens,
       round({tok_chars} * 1.0 / greatest({n_tok}, 1), 4) AS avg_token_len,
       round({stop_hits} * 1.0 / greatest({n_tok}, 1), 4) AS stopword_ratio,
       round({n_punct} * 1.0 / greatest(n_chars, 1), 4) AS punct_ratio,
       round({n_digit} * 1.0 / greatest({n_tok}, 1), 4) AS digit_ratio,
       round(least(1.0, {n_tok} / 50.0)
             * least(1.0, 4.0 * {stop_hits} * 1.0 / greatest({n_tok}, 1) + 0.2)
             * (1.0 - least(1.0, 2.0 * {n_punct} * 1.0 / greatest(n_chars, 1))), 4) AS quality
FROM t"""


def lang_id_sql(table: str = "documents") -> str:
    hits = {lg: _in_list_duck("toks", ws) for lg, ws in LANG_WORDS.items()}
    return f"""
WITH t AS (SELECT doc_id, {DUCK_TOKS} AS toks FROM {table})
SELECT doc_id,
       {hits['en']} AS hits_en,
       {hits['de']} AS hits_de,
       {hits['fr']} AS hits_fr,
       CASE WHEN greatest({hits['en']}, {hits['de']}, {hits['fr']}) = 0 THEN 'und'
            WHEN {hits['en']} >= {hits['de']} AND {hits['en']} >= {hits['fr']} THEN 'en'
            WHEN {hits['de']} >= {hits['fr']} THEN 'de' ELSE 'fr' END AS lang_pred
FROM t"""


def fingerprints_sql(table: str = "documents") -> str:
    _, duck_sh = shingles_sql("toks", WINNOW_N)
    _, duck_h = hash64_sql("x")
    return f"""
WITH t AS (SELECT doc_id, text, {DUCK_TOKS} AS toks FROM {table})
SELECT doc_id,
       md5(text) AS fp_exact,
       md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp_tokenset,
       CASE WHEN len({duck_sh}) = 0 THEN CAST(-1 AS BIGINT)
            ELSE list_min(list_transform({duck_sh}, x -> {duck_h})) END AS fp_winnow
FROM t"""


# --- multimodal ---------------------------------------------------------

def multimodal_features_sql(table: str = "documents") -> str:
    return f"""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS payload_md5
FROM {table}"""


def embedding_lsh_sql(
    threshold: float = 0.98,
    bands: int = _dedup.RHP_BANDS,
    bits: int = _dedup.RHP_BITS,
    dim: int = 16,
    table: str = "documents",
    hamming_margin: float = 0.1,
) -> str:
    """Oracle for embedding_lsh_pairs over dense_embed-derived document
    vectors: identical hyperplanes (md5-derived ±1 constants), identical
    banding, identical cosine verify.  Mirrors the engine's prefilter
    exactly (including ``hamming_margin``), so this parity check cannot
    see recall loss — that is covered by the separate lsh_pair_recall
    measurement against the exact all-pairs reference."""
    from ..oracle import dense_embed_sql

    vec_cols = ", ".join(
        f"coalesce(max(CASE WHEN dim_idx = {d} THEN val END), 0.0)" for d in range(dim)
    )
    import math

    keys = _dedup.rhp_band_key_exprs("v", dim, bands, bits, one_based=True)
    key_cols = ", ".join(f"{k} AS _bk{b}" for b, k in enumerate(keys))
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {', '.join(f'_bk{i}' for i in range(bands))}, "
        f"{b} AS band_idx, _bk{b} AS band_key FROM keyed"
        for b in range(bands)
    )
    hamming = " + ".join(f"bit_count(xor(x._bk{i}, y._bk{i}))" for i in range(bands))
    max_ham = int(math.ceil((math.acos(threshold) / math.pi + hamming_margin) * bands * bits))
    return f"""
WITH emb_long AS (SELECT * FROM ({dense_embed_sql(dim=dim, table=table)})),
vecs AS (SELECT doc_id, [{vec_cols}] AS v FROM emb_long GROUP BY doc_id),
nz AS (SELECT doc_id, v FROM vecs WHERE list_dot_product(v, v) > 0.0),
keyed AS (SELECT doc_id, v, {key_cols} FROM nz),
banded AS ({band_selects}),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM banded x JOIN banded y
    ON x.band_idx = y.band_idx AND x.band_key = y.band_key AND x.doc_id < y.doc_id
  WHERE ({hamming}) <= {max_ham}
)
SELECT c.a, c.b,
       round(round(list_dot_product(va.v, vb.v)
             / (sqrt(list_dot_product(va.v, va.v)) * sqrt(list_dot_product(vb.v, vb.v))), 6), 4) AS cos
FROM cand c JOIN nz va ON va.doc_id = c.a JOIN nz vb ON vb.doc_id = c.b
WHERE round(list_dot_product(va.v, vb.v)
      / (sqrt(list_dot_product(va.v, va.v)) * sqrt(list_dot_product(vb.v, vb.v))), 6) >= {threshold}"""


def radial_search_sql(
    query_vec_id: int, min_score: float, table: str = "embeddings"
) -> str:
    """Oracle for radial ANN (min_score variant)
    [query/NeuralQueryBuilder.java:300-354]."""
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM {table}),
q AS (SELECT v AS qv FROM e WHERE vec_id = {query_vec_id})
SELECT vec_id,
       round(list_dot_product(v, qv)
             / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos
FROM e, q
WHERE vec_id <> {query_vec_id}
  AND round(list_dot_product(v, qv)
      / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) >= {min_score}
ORDER BY cos DESC, vec_id ASC"""


def repetition_scores_sql(table: str = "documents") -> str:
    """Oracle twin of textstats.repetition_scores (Gopher/C4-style
    repetition filters, token-level)."""
    def top_count(arr: str) -> str:
        return (
            f"(CASE WHEN len({arr}) = 0 THEN 0 ELSE "
            f"list_max(list_transform(list_distinct({arr}), d -> "
            f"len(list_filter({arr}, x -> x = d)))) END)"
        )

    bis = "(CASE WHEN len(toks) >= 2 THEN [toks[i] || ' ' || toks[i + 1] for i in range(1, len(toks))] ELSE [] END)"
    tris = ("(CASE WHEN len(toks) >= 3 THEN [toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] "
            "for i in range(1, len(toks) - 1)] ELSE [] END)")
    return f"""
WITH t AS (SELECT doc_id, {DUCK_TOKS} AS toks FROM {table}),
g AS (SELECT doc_id, toks, {bis} AS bis, {tris} AS tris FROM t)
SELECT doc_id,
       round({top_count('toks')} * 1.0 / greatest(len(toks), 1), 4) AS top_unigram_frac,
       round({top_count('bis')} * 1.0 / greatest(len(bis), 1), 4) AS top_bigram_frac,
       round((len(tris) - len(list_distinct(tris))) * 1.0 / greatest(len(tris), 1), 4) AS dup_trigram_frac
FROM g"""


def unigram_logprob_sql(table: str = "documents") -> str:
    """Oracle twin of textstats.unigram_logprob (corpus-trained unigram
    LM, add-one smoothing)."""
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({DUCK_TOKS}) AS token FROM {table}
),
freq AS (SELECT token, count(*) AS cf FROM tok GROUP BY token),
totals AS (SELECT CAST(sum(cf) AS BIGINT) AS corpus_tokens, count(*) AS vocab FROM freq),
scored AS (
  SELECT t.doc_id, ln((f.cf + 1) * 1.0 / (tt.corpus_tokens + tt.vocab)) AS lp
  FROM tok t JOIN freq f USING (token), totals tt
)
SELECT doc_id, count(*) AS n_tokens, round(avg(lp), 4) AS mean_logprob
FROM scored GROUP BY doc_id"""


def corpus_filter_decisions_sql(
    min_quality: float = 0.3,
    max_top_bigram_frac: float = 0.2,
    langs: tuple[str, ...] = ("en", "de", "fr"),
    table: str = "documents",
) -> str:
    """Oracle twin of filters.corpus_filter_decisions: compose the four
    signal oracles (each nested as a subquery) and apply the identical
    first-failing-rule CASE."""
    lang_list = ", ".join(f"'{lg}'" for lg in langs)
    return f"""
WITH dd AS (SELECT doc_id, keep AS not_dup FROM ({exact_dedup_sql(table)})),
lg AS (SELECT doc_id, lang_pred FROM ({lang_id_sql(table)})),
rep AS (SELECT doc_id, top_bigram_frac FROM ({repetition_scores_sql(table)})),
q AS (SELECT doc_id, quality FROM ({quality_scores_sql(table)})),
joined AS (
  SELECT dd.doc_id,
         CASE WHEN NOT not_dup THEN 'exact_dup'
              WHEN lang_pred NOT IN ({lang_list}) THEN 'lang'
              WHEN top_bigram_frac > {max_top_bigram_frac} THEN 'repetition'
              WHEN quality < {min_quality} THEN 'quality'
              ELSE 'keep' END AS reason
  FROM dd JOIN lg USING (doc_id) JOIN rep USING (doc_id) JOIN q USING (doc_id)
)
SELECT doc_id, reason = 'keep' AS keep, reason FROM joined"""


def ivf_recall_sql(
    query_vec_id: int,
    k: int = 10,
    nprobe: int = 2,
    centroid_ids: list[int] | None = None,
    table: str = "embeddings",
) -> str:
    """Oracle for ivf_recall_frame: exact top-k vs IVF top-k overlap.
    Unlike the ivf_topk parity oracle (which replays the same probe),
    the EXACT side here is probe-independent — this row moves if the
    probe or assignment silently loses recall."""
    exact = cosine_topk_sql(query_vec_id, k=k, table=table)
    approx = ivf_topk_sql(query_vec_id, k=k, nprobe=nprobe,
                          centroid_ids=centroid_ids, table=table)
    return f"""
WITH exact AS (SELECT vec_id FROM ({exact})),
approx AS (SELECT vec_id FROM ({approx}))
SELECT count(*) AS exact_k,
       count(a.vec_id) AS matched,
       round(count(a.vec_id) / count(*), 4) AS recall
FROM exact e LEFT JOIN approx a USING (vec_id)"""


def lsh_recall_sql(
    threshold: float = 0.98,
    bands: int = _dedup.RHP_BANDS,
    bits: int = _dedup.RHP_BITS,
    dim: int = 16,
    table: str = "documents",
    hamming_margin: float = 0.1,
) -> str:
    """Oracle for recall_vs_exact_pairs: the EXACT all-pairs side is
    banding/prefilter-independent, so this row quantifies the recall the
    mirrored embedding_lsh_sql parity check is structurally blind to."""
    from ..oracle import dense_embed_sql

    lsh = embedding_lsh_sql(threshold, bands, bits, dim, table, hamming_margin)
    vec_cols = ", ".join(
        f"coalesce(max(CASE WHEN dim_idx = {d} THEN val END), 0.0)" for d in range(dim)
    )
    cos = (
        "round(list_dot_product(x.v, y.v) / (sqrt(list_dot_product(x.v, x.v)) "
        "* sqrt(list_dot_product(y.v, y.v))), 6)"
    )
    return f"""
WITH emb_long AS (SELECT * FROM ({dense_embed_sql(dim=dim, table=table)})),
vecs AS (SELECT doc_id, [{vec_cols}] AS v FROM emb_long GROUP BY doc_id),
exact AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM vecs x JOIN vecs y ON x.doc_id < y.doc_id
  WHERE {cos} >= {threshold}
),
lsh AS (SELECT a, b FROM ({lsh})),
nl AS (SELECT count(*) AS lsh_pairs FROM lsh),
stats AS (
  SELECT count(*) AS exact_pairs, count(l.a) AS matched_pairs
  FROM exact e LEFT JOIN lsh l ON e.a = l.a AND e.b = l.b
)
SELECT exact_pairs, lsh_pairs, matched_pairs,
       round(matched_pairs / exact_pairs, 4) AS recall
FROM stats, nl"""
