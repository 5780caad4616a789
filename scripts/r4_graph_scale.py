#!/usr/bin/env python
"""Layered-vs-flat graph ANN at a segment size where the hierarchy
matters (VERDICT r03 #6's 'measured value' criterion).

100k deterministic synthetic vectors (clustered, like the testdata
embeddings), 4 segments → 25k vectors/segment — two orders of magnitude
past the sf-fixture segment size. Build both graph shapes once, persist,
then measure per-query latency (median of repeats over a query batch via
hnsw_msearch — isolates kernel search time from Spark job overhead) and
recall@10 vs exact brute force at several ef.

Writes BENCH/r4_graph_scale.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

N_VECS = 100_000
DIM = 64
N_CLUSTERS = 256
QIDS = [0, 7, 21, 100, 333, 1000, 4242, 9001, 27182, 55555]


def gen_vectors(spark, out_dir: str):
    """Deterministic clustered vectors: counter-hashed cluster centers +
    counter-hashed offsets (no RNG state; identical at any parallelism)."""
    if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return
    import pandas as pd
    from pyspark.sql import functions as F

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            # splitmix-style per-(id, dim) hash → uniform [0,1)
            # (uint64 throughout — int64 would overflow-promote and the
            # 2^64-1 mask cannot coerce into any signed dtype)
            def h(x):
                x = x.astype(np.uint64)
                x = x * np.uint64(0x9E3779B97F4A7C15)
                x ^= x >> np.uint64(29)
                x = x * np.uint64(0xBF58476D1CE4E5B9)
                x ^= x >> np.uint64(32)
                return x

            d = np.arange(DIM, dtype=np.int64)
            cid = ids % N_CLUSTERS
            center = ((h(cid[:, None] * DIM + d) % 1000) / 1000.0) * 4.0
            offset = ((h(ids[:, None] * DIM + d + 10**12) % 1000) / 1000.0) - 0.5
            vec = center + offset
            yield pd.DataFrame({"vec_id": ids, "embedding": list(vec.astype(np.float64))})

    df = spark.range(N_VECS).select(F.col("id"))
    out = df.repartition(32).mapInPandas(gen, "vec_id long, embedding array<double>")
    out.write.mode("overwrite").parquet(out_dir)


def main() -> int:
    from neural_search_spark.pipeline.graph_ann import (
        hnsw_build_frame,
        hnsw_msearch,
    )
    from neural_search_spark.pipeline.similarity import cosine_topk
    from neural_search_spark.session import get_spark

    spark = get_spark("r4-graph-scale", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    vec_dir = "/tmp/nss_scaling/vectors_100k"
    gen_vectors(spark, vec_dir)
    emb = spark.read.parquet(vec_dir)

    res: dict = {"n_vecs": N_VECS, "dim": DIM, "segments": 4, "builds": {}, "search": {}}
    for name, layered in (("flat", False), ("layered", True)):
        gdir = f"/tmp/nss_scaling/graph100k_{name}"
        if not os.path.exists(os.path.join(gdir, "_SUCCESS")):
            t0 = time.perf_counter()
            hnsw_build_frame(emb, layered=layered).write.mode("overwrite").partitionBy(
                "segment"
            ).parquet(gdir)
            res["builds"][name] = round(time.perf_counter() - t0, 1)
        graphs = spark.read.parquet(gdir)

        # exact ground truth once
        if "exact" not in res:
            exact = {}
            for q in QIDS:
                exact[q] = [r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()]
            res["exact"] = "computed"
        for ef in (16, 24, 48, 96):
            runs = []
            got = None
            for _ in range(3):
                t0 = time.perf_counter()
                got = hnsw_msearch(emb, QIDS, k=10, graphs=graphs, ef=ef).collect()
                runs.append(time.perf_counter() - t0)
            by_q: dict = {}
            for r in got:
                by_q.setdefault(r["q_id"], []).append(r["vec_id"])
            hit = sum(len(set(by_q.get(q, [])) & set(exact[q])) for q in QIDS)
            recall = hit / (10 * len(QIDS))
            res["search"][f"{name}_ef{ef}"] = {
                "batch_sec_median": round(sorted(runs)[1], 3),
                "per_query_ms": round(sorted(runs)[1] / len(QIDS) * 1000, 1),
                "recall_at_10": round(recall, 3),
            }
            _flush(res)
    print(json.dumps(res))
    return 0


def _flush(res: dict) -> None:
    with open(os.path.join(REPO, "BENCH", "r4_graph_scale.json"), "w") as fh:
        json.dump(res, fh, indent=1)


if __name__ == "__main__":
    raise SystemExit(main())
