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

_PREFIXES = ["get", "set", "parse", "build", "read", "write", "merge", "flush",
             "open", "close", "init", "push", "pop", "next", "scan", "emit"]
_ROOTS = ["node", "term", "block", "batch", "field", "token", "score", "shard",
          "frame", "cursor", "buffer", "handle", "offset", "bitmap", "vector", "posting"]
_HEAD = ["def", "return", "import", "class", "if", "else", "for", "while"]


def _vocab_term(i: int) -> str:
    """The corpus generator's i-th vocabulary identifier (corpus.py
    _vocab) — low i = Zipf-frequent."""
    return f"{_PREFIXES[i % 16]}_{_ROOTS[(i // 16) % 16]}_{i}"


def make_query_workload(n: int) -> list[tuple[list[str], str]]:
    """``n`` DISTINCT queries over real corpus vocabulary: head-keyword
    + identifier OR mixes, identifier-only ORs across Zipf ranks, and
    ANDs over frequent identifiers."""
    qs: list[tuple[list[str], str]] = []
    for j in range(n):
        r = j % 4
        if r == 0:
            qs.append(([_HEAD[j % len(_HEAD)], _vocab_term(100 + j)], "or"))
        elif r == 1:
            qs.append(([_vocab_term(10 + j), _vocab_term(200 + 3 * j),
                        _vocab_term(1000 + 17 * j)], "or"))
        elif r == 2:
            qs.append((["def", "return", _vocab_term(50 + j)], "or"))
        else:
            qs.append(([_vocab_term(j), _vocab_term(300 + j)], "and"))
    return qs


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
    ap.add_argument("--query-rounds", type=int, default=12)
    ap.add_argument("--batch-size", type=int, default=48,
                    help="queries per msearch batch (dynamic batching under load)")
    ap.add_argument("--query-concurrency", type=int, default=8,
                    help="fixed at both levels so throughput reflects executor capacity")
    ap.add_argument("--segment-groups", type=int, default=None,
                    help="Arrow batches per kernel job (default: cpus) — "
                         "one large batch per worker instead of one per segment")
    ap.add_argument("--query-repeats", type=int, default=3,
                    help="repeat the timed query workload; report all runs + median")
    ap.add_argument("--no-positions", action="store_true",
                    help="build without positional postings (v3-equivalent "
                         "payload — Lucene IndexOptions without positions); "
                         "phrase/proximity queries then need the exhaustive "
                         "path. Isolates the position streams' bandwidth "
                         "cost in build-scaling measurements.")
    ap.add_argument("--skip-build", action="store_true",
                    help="reuse an existing index (query-only measurement)")
    ap.add_argument("--skip-queries", action="store_true",
                    help="build-only run (queries measured in a fresh JVM — a "
                         "builder JVM's heap/GC state is not the serving state)")
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
        metrics = {"postings": -1, "bytes_compressed": -1, "bytes_positions": -1,
                   "total_tokens": -1, "phase_sec": {}}
    else:
        shutil.rmtree(args.index_dir, ignore_errors=True)
        t0 = time.perf_counter()
        metrics = build_index(
            spark, corpus, args.index_dir,
            key_cols=["repo", "path", "commit"], text_col="content", tokenizer="code",
            num_segments=args.num_segments, range_block=args.range_block,
            build_id=f"scaling-{args.cpus}",
            store_positions=not args.no_positions,
        )
        build_s = time.perf_counter() - t0
        mismatches = verify_sha256(spark, corpus, args.index_dir)

    from neural_search_spark.query.wand import bm25_topk_indexed_multi

    if args.skip_queries:
        print(json.dumps({
            "cpus": args.cpus, "n_docs": n_docs,
            "build_sec": round(build_s, 2),
            "files_per_sec": round(n_docs / build_s, 1),
            "sha256_mismatches": mismatches,
            "phase_sec": metrics["phase_sec"],
            "postings": int(metrics["postings"]),
            "bytes_compressed": int(metrics["bytes_compressed"]),
            "bytes_positions": int(metrics.get("bytes_positions", -1)),
            "total_tokens": int(metrics["total_tokens"]),
        }))
        spark.stop()
        return 0

    # AQE helps the wide build shuffles; for the short query jobs its
    # per-execution driver re-planning adds latency (measured: batched
    # workload 4.96s vs 6.12s at 8 cores) — serving runs AQE off.
    # Shuffle partitions for the query phase cap at 32: past that the
    # per-task overhead (python worker round-trips) outweighs added
    # parallelism for these short stages (measured at 32 cores:
    # sp=32 → 12.85 qps vs sp=64 → 12.03).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions",
                   str(min(args.shuffle_partitions or args.cpus * 2, 32)))
    reader = IndexReader(spark, args.index_dir, cache_hot=True)
    reader.global_stats()  # cache stats outside the timed loop
    for terms, mode in QUERY_SET:  # warm parquet footers/broadcasts
        bm25_topk_indexed(reader, terms, k=10, mode=mode).collect()

    bm25_topk_indexed_multi(reader, QUERY_SET, k=10).collect()  # warm

    # Throughput = concurrent search workload (FAIR scheduler), the
    # production shape; concurrency is FIXED across levels so the ratio
    # measures executor capacity, not client parallelism. Each request
    # builds its DataFrame fresh (distinct queries can't share
    # broadcast-exchange caches; reusing one plan object would let Spark
    # reuse the materialized kernel broadcast and skip the real work).
    from concurrent.futures import ThreadPoolExecutor

    # primary measurement: a heavy-load workload of DISTINCT queries
    # executed as msearch batches (dynamic batching — the ~0.25 s/batch
    # serial driver cost amortizes across batch_size queries; per-term
    # decode work is shared inside each batch). 2 Spark jobs per batch.
    # segment_groups = cpus: ONE large Arrow batch per python worker per
    # job instead of num_segments small ones (bit-identical results).
    # Repeated >= 3x; the MEDIAN is the reported number (multi-tenant
    # box — single runs carry ±25% noise, BENCH/BASELINE.md).
    seg_groups = args.segment_groups or args.cpus
    workload = make_query_workload(args.query_rounds * len(QUERY_SET))
    batches = [workload[i:i + args.batch_size]
               for i in range(0, len(workload), args.batch_size)]
    n_q = len(workload)
    query_runs: list[float] = []
    for _ in range(max(1, args.query_repeats)):
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=args.query_concurrency) as pool:
            list(pool.map(
                lambda b: bm25_topk_indexed_multi(
                    reader, b, k=10, segment_groups=seg_groups
                ).collect(),
                batches,
            ))
        query_runs.append(time.perf_counter() - t0)
    query_s = sorted(query_runs)[len(query_runs) // 2] if len(query_runs) % 2 else sorted(
        query_runs
    )[len(query_runs) // 2 - 1 : len(query_runs) // 2 + 1]
    if isinstance(query_s, list):
        query_s = sum(query_s) / 2.0

    # secondary: one-query-per-request (the round-1 measurement, kept
    # for comparison — dominated by per-job driver orchestration)
    jobs = [(terms, mode) for _ in range(args.query_rounds) for terms, mode in QUERY_SET]
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=args.query_concurrency) as pool:
        list(pool.map(lambda tm: bm25_topk_indexed(reader, tm[0], k=10, mode=tm[1]).collect(), jobs))
    query_single_s = time.perf_counter() - t0

    # --- serving latency percentiles under concurrent clients --------
    # A serving engine's headline is PER-REQUEST latency under load,
    # not only batch throughput: 1/8/32 clients issue one-query
    # requests against the same persisted index through the FAIR
    # scheduler; every request is timed individually and p50/p95 are
    # reported per concurrency level (VERDICT r04 #8).
    import threading

    latency: dict[str, dict] = {}
    lat_workload = make_query_workload(48)
    lat_lock = threading.Lock()
    for clients in (1, 8, 32):
        times: list[float] = []

        def one(tm):
            t1 = time.perf_counter()
            bm25_topk_indexed(reader, tm[0], k=10, mode=tm[1]).collect()
            dt = time.perf_counter() - t1
            with lat_lock:
                times.append(dt)

        with ThreadPoolExecutor(max_workers=clients) as pool:
            list(pool.map(one, lat_workload))
        ts = sorted(times)
        latency[str(clients)] = {
            "p50_sec": round(ts[len(ts) // 2], 3),
            "p95_sec": round(ts[min(len(ts) - 1, int(0.95 * (len(ts) - 1)))], 3),
            "n_requests": len(ts),
        }

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
                "query_runs_sec": [round(x, 2) for x in query_runs],
                "segment_groups": seg_groups,
                "queries_per_sec": round(n_q / query_s, 2),
                "query_single_sec": round(query_single_s, 2),
                "queries_per_sec_single": round(len(jobs) / query_single_s, 2),
                "latency_p50_p95": latency,
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
