"""Indexed match_phrase — position-intersection over positional postings.

Lucene's PhraseQuery (which the reference's ``match_phrase`` queries in
its *QueryIT tests compile to) walks the terms' positional postings and
keeps docs where the terms occur at consecutive positions; scoring is
plain BM25 over the phrase's term statistics — the positional constraint
gates MATCHING, not scoring. Same split here, re-expressed for the
segmented index (index/builder.py v4 format):

* per segment, the unique phrase terms' postings decode once (the bulk
  strategy of query/wand.py) and a conjunctive doc set is formed — a doc
  missing any phrase term cannot match, so this is the cheap prefilter.
* POSITIONS decode only for blocks that contain a conjunctive candidate
  (``block_pos_off`` random access) — phrase-verification I/O scales
  with the candidate set, not with the terms' full posting lists.
* the consecutive-position check is a vectorized ordinal-offset
  intersection: encode (doc, pos - ordinal) into one int64 key per
  token occurrence and fold ``np.intersect1d`` across the phrase's
  ordinals — surviving keys are phrase start positions. Duplicate terms
  in the phrase (e.g. "the the") need no special casing: each ordinal
  uses its own offset against the same position chain.
* scores are the same OR-sum of per-term BM25 contributions the
  exhaustive ``bm25_phrase`` (query/exhaustive.py) computes, so the two
  paths are score- and rank-identical (pinned in tests/test_round3.py).

Scale shape: the only shuffle key is segment_id (uniform); per-query
I/O is the phrase terms' postings rows (term/bucket-pruned scan) and
the candidate blocks' position bytes; per-segment output is the
matching docs only. No full-corpus scan — the fix for round 2's "a
phrase query is a full-corpus scan at 100x" weakness.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.codecs import varint_decode
from ..functions.norms import byte4_to_int
from ..index.builder import SEG_SHIFT
from .bm25 import B, K1
from .wand import BULK_COLS, IndexReader

PHRASE_COLS = [*BULK_COLS, "block_tf_off", "block_pos_off", "positions",
               "block_pos_n", "pos_pack_bits", "pos_exc_pos", "pos_exc_high"]

# key = doc * 2^POS_SHIFT + position: positions must fit the low bits.
# 2^24 = 16M tokens per doc — far beyond any real document; asserted.
POS_SHIFT = 24

_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("segment_id", T.IntegerType(), False),
        T.StructField("nss_doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)


def decode_doc_stream(r, range_block: int):
    """One positional-postings row -> (doc ids, tfs, quantized dls as
    int64, per-block posting counts). The delta-carry reconstruction is
    THE doc-id decode for every positional kernel (phrase and span) —
    one copy, one set of tests."""
    from ..index.builder import decode_term_deltas

    deltas = decode_term_deltas(
        r.docs, r.block_ns, r.block_doc_off, int(r.pack_bits), r.exc_pos,
        r.exc_high)
    ns = np.asarray(r.block_ns, dtype=np.int64)
    bids = np.asarray(r.block_ids, dtype=np.int64)
    starts = np.r_[0, np.cumsum(ns)[:-1]]
    cs = np.cumsum(deltas)
    carry = np.repeat(cs[starts] - deltas[starts], ns)
    ids = np.repeat(bids * range_block, ns) + cs - carry
    tfv = varint_decode(r.tfs).astype(np.int64)
    dlq = byte4_to_int(np.frombuffer(r.norms, dtype=np.uint8))
    return ids, tfv, dlq, ns


def candidate_position_keys(r, ids, tfv, ns, cand: np.ndarray) -> np.ndarray:
    """Sorted (doc << POS_SHIFT | pos) int64 keys for this term's
    occurrences in candidate docs — positions decode for candidate
    blocks only (block_pos_off random access), so verification I/O
    scales with the candidate set. Shared by the phrase and span
    kernels."""
    from ..index.builder import chains_absolute, decode_block_positions

    in_cand = np.isin(ids, cand)
    if not in_cand.any():
        return np.empty(0, dtype=np.int64)
    noff = np.r_[0, np.cumsum(ns)]
    post_block = np.repeat(np.arange(len(ns), dtype=np.int64), ns)
    needed = np.unique(post_block[in_cand])
    pos_off = np.asarray(r.block_pos_off, dtype=np.int64)
    parts = []
    for j in needed:
        p0, p1 = int(noff[j]), int(noff[j + 1])
        d = decode_block_positions(
            r.positions, int(j), pos_off, len(r.positions),
            int(r.pos_pack_bits), r.block_pos_n, r.pos_exc_pos,
            r.pos_exc_high)
        pos_abs = chains_absolute(d, tfv[p0:p1])
        # explicit raise (not assert: stripped under python -O) —
        # a >=2^24-token doc would silently corrupt (doc<<24|pos)
        if pos_abs.size and int(pos_abs.max()) >= (1 << POS_SHIFT):
            raise ValueError(
                f"document position {int(pos_abs.max())} exceeds the "
                f"2^{POS_SHIFT} positional-key limit; re-index with "
                "chunking for >16M-token documents")
        doc_rep = np.repeat(ids[p0:p1], tfv[p0:p1])
        keep = np.repeat(in_cand[p0:p1], tfv[p0:p1])
        parts.append(((doc_rep << POS_SHIFT) + pos_abs)[keep])
    return np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)


def _phrase_kernel(
    phrase_terms: list[str],
    idf_by_term: dict[str, float],
    avgdl: float,
    range_block: int,
    dtype: str,
    k1: float = K1,
    b: float = B,
    slop: int = 0,
):
    """Per-segment kernel: conjunctive prefilter -> candidate-block
    position decode -> ordinal-offset intersection (slop=0) or greedy
    minimal-window chain (slop>0) -> BM25 score."""
    ft = np.float32 if dtype == "float32" else np.float64
    uniq_terms = sorted(set(phrase_terms))
    n_uniq = len(uniq_terms)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"segment_id": pd.Series(dtype=np.int32),
             "nss_doc_id": pd.Series(dtype=np.int64),
             "score": pd.Series(dtype=np.float64)}
        )
        if len(pdf) < n_uniq:  # a term absent from this segment -> no match
            return empty
        pdf = pdf.sort_values("term", kind="mergesort").reset_index(drop=True)
        seg = int(pdf["segment_id"].iloc[0])
        k1f, bf, av = ft(k1), ft(b), ft(avgdl)

        # --- bulk decode doc/tf streams + conjunctive candidate set ----
        per_term: dict[str, tuple] = {}
        size = 0
        for r in pdf.itertuples():
            ids, tfv, dlq_int, ns = decode_doc_stream(r, range_block)
            dlq = dlq_int.astype(ft)
            idf = ft(idf_by_term[r.term])
            tff = tfv.astype(np.float64).astype(ft)
            contrib = idf * (tff / (tff + k1f * (ft(1.0) - bf + bf * dlq / av)))
            per_term[r.term] = (ids, tfv, contrib, ns, r)
            if len(ids):
                size = max(size, int(ids[-1]) + 1)
        if size == 0:
            return empty
        acc = np.zeros(size, dtype=ft)
        cnt = np.zeros(size, dtype=np.int32)
        for t in uniq_terms:  # sorted-term order -> deterministic sums
            ids, contrib = per_term[t][0], per_term[t][2]
            acc[ids] += contrib
            cnt[ids] += 1
        cand = np.flatnonzero(cnt == n_uniq).astype(np.int64)
        if len(cand) == 0:
            return empty

        # --- positions for candidate postings, candidate blocks only ---
        pos_keys: dict[str, np.ndarray] = {}
        for t in uniq_terms:
            ids, tfv, _, ns, r = per_term[t]
            pos_keys[t] = candidate_position_keys(r, ids, tfv, ns, cand)

        if slop == 0:
            # --- ordinal-offset intersection ---------------------------
            survivors: np.ndarray | None = None
            for i, t in enumerate(phrase_terms):
                k_i = pos_keys[t] - i  # phrase-start key each occurrence implies
                if i == 0:
                    # drop occurrences whose position < ordinal (cannot start)
                    survivors = k_i
                else:
                    survivors = np.intersect1d(survivors, k_i, assume_unique=True)
                if len(survivors) == 0:
                    return empty
            docs = np.unique(survivors >> POS_SHIFT)
        else:
            # --- greedy minimal-window ordered chain (slop > 0) --------
            # For each occurrence of ordinal 0 (a chain start), walk the
            # remaining ordinals taking the EARLIEST occurrence strictly
            # after the current key — earliest-next minimizes the chain's
            # final position for that start, hence its span. A doc
            # matches iff some start yields an in-doc chain with
            #   span_gap = (p_last - p_first) - (k-1) <= slop
            # (for strictly increasing positions the gap sum telescopes
            # to exactly that). slop=0 would reduce to the contiguous
            # intersection above. All steps are vectorized searchsorted
            # over the (doc << POS_SHIFT | pos) key arrays, which are
            # sorted by construction (blocks ascend, docs ascend within
            # block, positions ascend within doc).
            start = pos_keys[phrase_terms[0]]
            cur = start.copy()
            ok = np.ones(len(cur), dtype=bool)
            for t in phrase_terms[1:]:
                arr = pos_keys[t]
                idx = np.searchsorted(arr, cur, side="right")
                ok &= idx < len(arr)
                idx = np.minimum(idx, len(arr) - 1)
                cur = arr[idx]
            same_doc = (cur >> POS_SHIFT) == (start >> POS_SHIFT)
            gap = (cur - start) - np.int64(len(phrase_terms) - 1)
            hit = ok & same_doc & (gap <= slop)
            if not hit.any():
                return empty
            docs = np.unique(start[hit] >> POS_SHIFT)
        gid = (np.int64(seg) << SEG_SHIFT) + docs
        return pd.DataFrame(
            {
                "segment_id": np.full(len(docs), seg, dtype=np.int32),
                "nss_doc_id": gid,
                "score": acc[docs].astype(np.float64),
            }
        )

    return kernel


def bm25_phrase_indexed(
    reader: IndexReader,
    phrase_terms: list[str],
    dtype: str = "float64",
    k: int | None = None,
    slop: int = 0,
) -> DataFrame:
    """All docs whose token stream contains ``phrase_terms`` contiguously
    (``slop=0``) or as an ordered proximity match (``slop>0``: some
    strictly-increasing position assignment with total gap
    ``p_last - p_first - (len-1) <= slop`` — Lucene PhraseQuery's slop
    budget restricted to in-order matches), BM25-scored over the
    phrase's unique terms (global, unfiltered stats — Lucene
    semantics). Returns (nss_doc_id, <key_cols>, score);
    ``k`` adds a deterministic top-k cut (score desc, key asc)."""
    if slop < 0:
        raise ValueError(f"slop must be >= 0, got {slop}")
    if not bool(reader.meta.get("store_positions", False)):
        raise ValueError(
            "index was built with store_positions=False — phrase queries "
            "need positional postings (rebuild with store_positions=True)"
        )
    uniq = sorted(set(phrase_terms))
    N, avgdl = reader.global_stats()
    dfs = reader.term_dfs(uniq)
    spark = reader.spark
    key_cols = reader.meta["key_cols"]
    if N == 0 or any(t not in dfs for t in uniq):
        empty = spark.createDataFrame([], _RESULT_SCHEMA).drop("segment_id")
        dm = reader.docmap().select("nss_doc_id", *key_cols)
        return dm.join(F.broadcast(empty), "nss_doc_id")
    ftype = np.float32 if dtype == "float32" else np.float64
    idf_by_term = {
        t: float(np.log(ftype(1.0) + (ftype(N) - ftype(dfs[t]) + ftype(0.5)) / (ftype(dfs[t]) + ftype(0.5))).astype(ftype))
        for t in uniq
    }
    kernel = _phrase_kernel(
        list(phrase_terms), idf_by_term, avgdl, int(reader.meta["range_block"]),
        dtype, slop=slop,
    )
    scan = reader.postings_positional()
    n_buckets = int(reader.meta.get("term_buckets", 0))
    if n_buckets > 1:
        from ..pipeline.hashing import py_hash64

        buckets = sorted({py_hash64(t) % n_buckets for t in uniq})
        scan = scan.where(F.col("term_bucket").isin(buckets))
    per_seg = (
        scan.where(F.col("term").isin(uniq))
        .select(*PHRASE_COLS)
        .groupBy("segment_id")
        .applyInPandas(kernel, schema=_RESULT_SCHEMA)
    )
    dm = reader.docmap().select("nss_doc_id", *key_cols)
    out = dm.join(F.broadcast(per_seg.drop("segment_id")), "nss_doc_id")
    if k is not None:
        out = out.orderBy(F.col("score").desc(), *[F.col(c).asc() for c in key_cols]).limit(k)
    return out
