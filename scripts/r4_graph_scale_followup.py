#!/usr/bin/env python
"""Follow-up to r4_graph_scale.py: (a) warm the JVM before timing so
flat-vs-layered latency is not confounded by first-run warmup (the
main script times flat_ef16 first, in a cold JVM); (b) probe layered
recall at higher ef to locate the >=0.95 operating point. Reuses the
persisted 100k graphs. Appends into BENCH/r4_graph_scale.json under
``followup``."""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from r4_graph_scale import QIDS  # noqa: E402

sys.path.insert(0, os.path.join(REPO, "scripts"))


def main() -> int:
    from neural_search_spark.pipeline.graph_ann import hnsw_msearch
    from neural_search_spark.pipeline.similarity import cosine_topk
    from neural_search_spark.session import get_spark

    spark = get_spark("r4-graph-followup", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet("/tmp/nss_scaling/vectors_100k")
    graphs = {
        name: spark.read.parquet(f"/tmp/nss_scaling/graph100k_{name}")
        for name in ("flat", "layered")
    }

    exact = {}
    for q in QIDS:
        exact[q] = set(r["vec_id"] for r in cosine_topk(emb, q, k=10).collect())

    # warmup: one full throwaway batch per graph shape
    for name, g in graphs.items():
        hnsw_msearch(emb, QIDS, k=10, graphs=g, ef=16).collect()

    path = os.path.join(REPO, "BENCH", "r4_graph_scale.json")
    res = json.load(open(path))
    fu = res.setdefault("followup", {})
    fu["note"] = (
        "warm-JVM timings (one throwaway batch per shape first); median of 3; "
        "same 10-query batch via hnsw_msearch as the main table"
    )
    probes = [("flat", 48), ("layered", 48), ("layered", 96),
              ("layered", 192), ("layered", 384)]
    for name, ef in probes:
        runs, got = [], None
        for _ in range(3):
            t0 = time.perf_counter()
            got = hnsw_msearch(emb, QIDS, k=10, graphs=graphs[name], ef=ef).collect()
            runs.append(time.perf_counter() - t0)
        by_q: dict = {}
        for r in got:
            by_q.setdefault(r["q_id"], []).append(r["vec_id"])
        hit = sum(len(set(by_q.get(q, [])) & exact[q]) for q in QIDS)
        fu[f"{name}_ef{ef}"] = {
            "batch_sec_median": round(sorted(runs)[1], 3),
            "per_query_ms": round(sorted(runs)[1] / len(QIDS) * 1000, 1),
            "recall_at_10": round(hit / (10 * len(QIDS)), 3),
        }
        with open(path, "w") as fh:
            json.dump(res, fh, indent=1)
    print(json.dumps(fu))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
