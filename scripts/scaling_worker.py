#!/usr/bin/env python
"""One scaling-bench run at a fixed parallelism. Launched via

    spark-submit --master local[N] --py-files <pkg.zip> scripts/scaling_worker.py \
        --corpus /tmp/nss_scaling/corpus --index-dir /tmp/nss_scaling/index_N ...

(north rule: "runs via spark-submit --py-files at N and 4N executors").
Builds the inverted index from scratch, runs the fixed query set, prints
one JSON line with wall times. Master comes from spark-submit, NOT from
code — the same script serves any cluster size.
"""

from __future__ import annotations

import argparse
import json
import shutil
import time

from pyspark.sql import SparkSession

# Fixed query mix: two stop-word-like head keywords (worst-case skew),
# two OR, one AND over mid-frequency identifiers.
QUERY_SET = [
    (["def", "return"], "or"),
    (["parse_node_16", "merge_field_102", "scan_cursor_9"], "or"),
    (["import", "class", "lambda"], "or"),
    (["get_node_0", "set_term_1"], "and"),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--cpus", type=int, required=True, help="for reporting only")
    # segments sized so one segment's docs fit comfortably in an Arrow
    # kernel (~10k docs/segment at 2.4M): bounds python-worker memory and
    # load-balances the build — the local analog of sizing partitions to
    # executor memory at cluster scale.
    ap.add_argument("--num-segments", type=int, default=256)
    ap.add_argument("--range-block", type=int, default=128)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--query-rounds", type=int, default=6)
    ap.add_argument("--query-concurrency", type=int, default=8,
                    help="fixed at both levels so throughput reflects executor capacity")
    ap.add_argument("--skip-build", action="store_true",
                    help="reuse an existing index (query-only measurement)")
    args = ap.parse_args()

    builder = (
        SparkSession.builder.appName(f"nss-scaling-{args.cpus}")
        .config("spark.sql.shuffle.partitions", str(args.shuffle_partitions or args.cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.scheduler.mode", "FAIR")
        # see session.py: stop glibc munmap/TLB-shootdown storms in the
        # Arrow workers (dominates sys-time at high core counts)
        .config("spark.executorEnv.MALLOC_TRIM_THRESHOLD_", "268435456")
        .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_", "268435456")
        .config("spark.executorEnv.MALLOC_ARENA_MAX", "4")
        # committer v2: task-side file moves — the v1 driver-side serial
        # commit is a fixed floor that caps strong scaling
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from neural_search_spark.index.builder import build_index, verify_sha256
    from neural_search_spark.query.wand import IndexReader, bm25_topk_indexed

    corpus = spark.read.parquet(args.corpus)
    n_docs = corpus.count()  # warms FS cache so build timing is compute

    if args.skip_build:
        build_s, mismatches = float("nan"), -1
        metrics = {"postings": -1, "bytes_compressed": -1, "total_tokens": -1, "phase_sec": {}}
    else:
        shutil.rmtree(args.index_dir, ignore_errors=True)
        t0 = time.perf_counter()
        metrics = build_index(
            spark, corpus, args.index_dir,
            key_cols=["repo", "path", "commit"], text_col="content", tokenizer="code",
            num_segments=args.num_segments, range_block=args.range_block,
            build_id=f"scaling-{args.cpus}",
        )
        build_s = time.perf_counter() - t0
        mismatches = verify_sha256(spark, corpus, args.index_dir)

    reader = IndexReader(spark, args.index_dir, cache_hot=True)
    reader.global_stats()  # cache stats outside the timed loop
    for terms, mode in QUERY_SET:  # warm parquet footers/broadcasts
        bm25_topk_indexed(reader, terms, k=10, mode=mode).collect()

    # Throughput = concurrent search workload (FAIR scheduler), the
    # production shape; concurrency is FIXED across levels so the ratio
    # measures executor capacity, not client parallelism.
    from concurrent.futures import ThreadPoolExecutor

    jobs = [(terms, mode) for _ in range(args.query_rounds) for terms, mode in QUERY_SET]
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=args.query_concurrency) as pool:
        list(pool.map(lambda tm: bm25_topk_indexed(reader, tm[0], k=10, mode=tm[1]).collect(), jobs))
    query_s = time.perf_counter() - t0
    n_q = len(jobs)

    print(
        json.dumps(
            {
                "cpus": args.cpus,
                "n_docs": n_docs,
                "build_sec": None if args.skip_build else round(build_s, 2),
                "files_per_sec": None if args.skip_build else round(n_docs / build_s, 1),
                "sha256_mismatches": mismatches,
                "n_queries": n_q,
                "query_sec": round(query_s, 2),
                "queries_per_sec": round(n_q / query_s, 2),
                "phase_sec": metrics["phase_sec"],
                "postings": int(metrics["postings"]),
                "bytes_compressed": int(metrics["bytes_compressed"]),
                "total_tokens": int(metrics["total_tokens"]),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
