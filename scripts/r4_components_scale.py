#!/usr/bin/env python
"""Scale evidence for connected_components: a deterministic synthetic
pair graph far past the sf fixtures (500k nodes / ~1M edges, mixing
clique-ish near-dup clusters with long chains — the adversarial
diameter case), run at local[8] and local[32] on the same input.

Reports per-level wall seconds, star-contraction rounds, and component
count (must be identical across parallelism — determinism check).
Appends to BENCH/r4_components_scale.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_CLUSTERS = 90_000     # clusters of 2-6 nodes (near-dup shape)
CHAIN_NODES = 50_000    # one 50k-node path: diameter stress
BIG_CLUSTERS = 6_000_000  # throughput config: ~21M edges, no chain
OUT = os.path.join(REPO, "BENCH", "r4_components_scale.json")


def build_edges(spark, n_clusters=N_CLUSTERS, chain_nodes=CHAIN_NODES):
    """Deterministic edge list: clique-ish clusters + an optional
    long path appended after them."""
    from pyspark.sql import functions as F

    base = spark.range(n_clusters).select(
        (F.col("id") * 8).alias("lo"), (F.col("id") % 5 + 1).alias("extra")
    )
    # cluster i occupies ids [8i, 8i+extra] (stride 8 > max extra 5, so
    # clusters are DISJOINT — a stride-4 layout let extra=4/5 reach into
    # cluster i+1 and silently fuse ~40% of them); edges lo->lo+j (star)
    # plus a ring edge to make it clique-ish rather than already-a-star
    cluster = base.select(
        "lo", F.explode(F.sequence(F.lit(1), F.col("extra"))).alias("j")
    ).select(F.col("lo").alias("a"), (F.col("lo") + F.col("j")).alias("b"))
    ring = base.where(F.col("extra") >= 2).select(
        (F.col("lo") + 1).alias("a"), (F.col("lo") + F.col("extra")).alias("b")
    )
    if not chain_nodes:
        return cluster.union(ring)
    chain_base = n_clusters * 8 + 16
    chain = spark.range(chain_nodes - 1).select(
        (F.col("id") + chain_base).alias("a"), (F.col("id") + chain_base + 1).alias("b")
    )
    return cluster.union(ring).union(chain)


def run_level(cpus: int, n_clusters=N_CLUSTERS, chain_nodes=CHAIN_NODES) -> dict:
    from neural_search_spark.pipeline import dedup
    from neural_search_spark.session import get_spark

    spark = get_spark(
        f"r4-components-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges = build_edges(spark, n_clusters, chain_nodes).persist()
    n_edges = edges.count()

    # count rounds by wrapping the star steps
    rounds = {"n": 0}
    orig = dedup._small_star

    def counting(e):
        rounds["n"] += 1
        return orig(e)

    dedup._small_star = counting
    try:
        t0 = time.perf_counter()
        roots = dedup.connected_components(edges, src="a", dst="b")
        n_nonroot = roots.count()
        n_components = roots.select("v").distinct().count()
        sec = time.perf_counter() - t0
    finally:
        dedup._small_star = orig
    spark.stop()
    return {
        "cpus": cpus,
        "n_edges": n_edges,
        "wall_sec": round(sec, 2),
        "rounds": rounds["n"],
        "n_nonroot_nodes": n_nonroot,
        "n_components_with_edges": n_components,
    }


def main() -> int:
    res = {}
    # (a) diameter stress: 50k-node path forces the multi-round regime;
    # per-round cost at this tiny size is pure job latency, so wall time
    # is parallelism-INsensitive by design — reported for the rounds
    # count + cross-parallelism determinism, not throughput
    chain = {"levels": [run_level(8), run_level(32)]}
    a, b = chain["levels"]
    assert (a["n_nonroot_nodes"], a["n_components_with_edges"]) == (
        b["n_nonroot_nodes"],
        b["n_components_with_edges"],
    ), "components differ across parallelism"
    chain["deterministic_across_parallelism"] = True
    res["chain_stress"] = chain
    # (b) throughput config: ~21M edges of clique-ish clusters (the real
    # near-dup shape, few rounds), big enough that the per-round shuffle
    # work, not job latency, is the cost
    big = {"levels": [run_level(8, BIG_CLUSTERS, 0), run_level(32, BIG_CLUSTERS, 0)]}
    a, b = big["levels"]
    assert (a["n_nonroot_nodes"], a["n_components_with_edges"]) == (
        b["n_nonroot_nodes"],
        b["n_components_with_edges"],
    )
    big["deterministic_across_parallelism"] = True
    big["scaling_8_to_32"] = round(a["wall_sec"] / b["wall_sec"] / 4, 3)
    res["neardup_throughput"] = big
    json.dump(res, open(OUT, "w"), indent=1)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
