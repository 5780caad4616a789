"""Distributed segment merge — SURVEY.md §2.14 "Segment merge".

Lucene background-merges small segments into larger ones to keep
per-query segment fan-out bounded; our equivalent folds groups of
``factor`` adjacent segments into one:

    new_segment_id = segment_id // factor
    new_local_id   = local_id + Σ doc counts of preceding old segments

Postings rows of the constituent segments are re-based, re-blocked and
re-encoded in one Arrow kernel per new segment (same shuffle shape as
the build: the only key is the uniform new_segment_id). Doc-id rebasing
preserves the (repo, path, commit) sort order *within* each old segment
and concatenates old segments in id order, so BM25 stats (N, avgdl, df,
norms) are untouched — merged-index queries are rank- and score-
identical to the unmerged index (tests/test_merge.py pins this).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..functions.codecs import varint_decode, varint_encode, varint_nbytes
from .builder import POSTINGS_SCHEMA, SEG_SHIFT, paths


def _merge_kernel(range_block: int, shift_of: dict[int, int], factor: int):
    """Kernel over one NEW segment's postings rows (all old segments in
    the group): decode, re-base doc ids, re-block, re-encode."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        out_cols = {f.name: [] for f in POSTINGS_SCHEMA.fields}
        new_seg = int(pdf["segment_id"].iloc[0]) // factor
        # decode every block row into flat (term, doc, tf, norm) streams
        terms_l, docs_l, tfs_l, norms_l = [], [], [], []
        for r in pdf.itertuples():
            deltas = varint_decode(r.docs).astype(np.int64)
            # delta[0] is relative to the block base (builder kernel), so
            # cumsum over the block's deltas recovers base-relative ids
            local = np.int64(r.block_id) * range_block + np.cumsum(deltas)
            tfs = varint_decode(r.tfs).astype(np.int64)
            norms = np.frombuffer(r.norms, dtype=np.uint8)
            rebased = local + shift_of[int(r.segment_id)]
            terms_l.append(np.full(len(rebased), r.term, dtype=object))
            docs_l.append(rebased)
            tfs_l.append(tfs)
            norms_l.append(norms)
        if not docs_l:
            return pd.DataFrame(out_cols)
        term = np.concatenate(terms_l)
        doc = np.concatenate(docs_l)
        tf = np.concatenate(tfs_l)
        norm = np.concatenate(norms_l)
        from ..functions.norms import byte4_to_int

        dl_q = byte4_to_int(norm).astype(np.int64)
        block = (doc // range_block).astype(np.int64)
        order = np.lexsort((doc, block, term.astype(str)))
        term, doc, tf, norm, dl_q, block = (
            term[order], doc[order], tf[order], norm[order], dl_q[order], block[order]
        )
        new = np.r_[True, (term[1:] != term[:-1]) | (block[1:] != block[:-1])]
        starts = np.flatnonzero(new)
        n_per = np.diff(np.r_[starts, len(term)])
        deltas = np.empty(len(doc), dtype=np.int64)
        deltas[1:] = doc[1:] - doc[:-1]
        deltas[starts] = doc[starts] - block[starts] * range_block
        doc_bytes = np.frombuffer(varint_encode(deltas), dtype=np.uint8).tobytes()
        tf_bytes = np.frombuffer(varint_encode(tf), dtype=np.uint8).tobytes()
        doc_off = np.r_[0, np.cumsum(varint_nbytes(deltas))]
        tf_off = np.r_[0, np.cumsum(varint_nbytes(tf))]
        bounds = np.r_[starts, len(term)]
        norm_b = norm.tobytes()
        tb = pdf["term_bucket"].to_numpy()
        tb_of_term = dict(zip(pdf["term"], tb))
        return pd.DataFrame(
            {
                "segment_id": np.full(len(starts), new_seg, dtype=np.int32),
                "term_bucket": np.array(
                    [tb_of_term[t] for t in term[starts]], dtype=np.int32
                ),
                "term": term[starts],
                "block_id": block[starts].astype(np.int32),
                "n": n_per.astype(np.int32),
                "max_tf": np.maximum.reduceat(tf, starts).astype(np.int32),
                "min_dl_q": np.minimum.reduceat(dl_q, starts).astype(np.int32),
                "sum_tf": np.add.reduceat(tf, starts).astype(np.int64),
                "docs": [
                    doc_bytes[doc_off[bounds[i]]:doc_off[bounds[i + 1]]] for i in range(len(starts))
                ],
                "tfs": [
                    tf_bytes[tf_off[bounds[i]]:tf_off[bounds[i + 1]]] for i in range(len(starts))
                ],
                "norms": [norm_b[bounds[i]:bounds[i + 1]] for i in range(len(starts))],
            }
        )

    return merge


def merge_segments(
    spark: SparkSession, index_dir: str, out_dir: str, factor: int = 2
) -> dict:
    """Fold groups of ``factor`` adjacent segments into one; returns
    merge metrics. The merged index is a fully valid index dir."""
    p_in, p_out = paths(index_dir), paths(out_dir)
    with open(p_in["meta"]) as fh:
        meta = json.load(fh)
    range_block = int(meta["range_block"])
    t0 = time.time()

    dm = spark.read.parquet(p_in["docmap"])
    counts = {
        int(r.segment_id): int(r.c)
        for r in dm.groupBy("segment_id").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    # shift = total docs of preceding old segments within the new group
    shift_of: dict[int, int] = {}
    for seg in sorted(counts):
        group = seg // factor
        prev = sum(counts.get(s, 0) for s in range(group * factor, seg))
        shift_of[seg] = prev

    kernel = _merge_kernel(range_block, shift_of, factor)
    merged = (
        spark.read.parquet(p_in["postings"])
        .withColumn("merge_group", (F.col("segment_id") / factor).cast("int"))
        .groupBy("merge_group")
        .applyInPandas(lambda pdf: kernel(pdf.drop(columns=["merge_group"])), POSTINGS_SCHEMA)
    )
    part_cols = ["segment_id", "term_bucket"] if int(meta.get("term_buckets", 0)) > 1 else ["segment_id"]
    merged.write.mode("overwrite").partitionBy(*part_cols).parquet(p_out["postings"])

    shift_expr = F.create_map(
        *[x for s, sh in shift_of.items() for x in (F.lit(s), F.lit(sh))]
    )
    new_seg = (F.col("segment_id") / factor).cast("int")
    new_local = F.col("local_id") + shift_expr[F.col("segment_id")]
    dm_new = dm.select(
        new_seg.alias("segment_id"),
        new_local.alias("local_id"),
        (new_seg.cast("long") * F.lit(1 << SEG_SHIFT) + new_local).alias("nss_doc_id"),
        *[c for c in dm.columns if c not in ("segment_id", "local_id", "nss_doc_id")],
    )
    dm_new.write.mode("overwrite").partitionBy("segment_id").parquet(p_out["docmap"])

    man = spark.read.parquet(p_in["manifest"])
    man_new = (
        man.withColumn("segment_id", (F.col("segment_id") / factor).cast("int"))
        .groupBy("segment_id")
        .agg(
            F.sum("total_tokens").alias("total_tokens"),
            F.sum("postings_emitted").alias("postings_emitted"),
            F.sum("blocks").alias("blocks"),
            F.sum("bytes_compressed").alias("bytes_compressed"),
            F.sum("docs_tokenized").alias("docs_tokenized"),
        )
        .withColumn("build_id", F.lit(f"merge-{int(t0)}"))
        .withColumn("built_at_unix", F.lit(int(t0)))
        .withColumn("tokenizer", F.lit(meta["tokenizer"]))
        .withColumn("range_block", F.lit(range_block))
    )
    man_new.write.mode("overwrite").parquet(p_out["manifest"])

    new_meta = dict(meta)
    new_meta["num_segments"] = (int(meta["num_segments"]) + factor - 1) // factor
    os.makedirs(out_dir, exist_ok=True)
    with open(p_out["meta"], "w") as fh:
        json.dump(new_meta, fh)
    return {
        "segments_in": len(counts),
        "segments_out": new_meta["num_segments"],
        "wall_sec": time.time() - t0,
    }
