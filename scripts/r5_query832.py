#!/usr/bin/env python
"""Round-5 8->32 QUERY pair on the 2.4M-doc v5 index (fresh serving
JVMs, box idle — the first r5 attempt ran concurrently with an active
session and produced a flat-qps artifact). Rebuilds index_8 at 2.4M
first if r5_pair28 overwrote it with the 1.2M build (same path), then
runs --skip-build at 8 and 32 and updates the raw BENCH/scaling.json
results in place so scripts/r5_curate_scaling.py can fold them.
Run ALONE (scaling-bench protocol)."""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from scaling_bench import _run_worker, make_pkg_zip  # noqa: E402

WORK = "/tmp/nss_scaling"
C24 = os.path.join(WORK, "corpus_2400000")
RAW = os.path.join(REPO, "BENCH", "scaling.json")
OUT = os.path.join(REPO, "BENCH", "r5_query832.json")


def _index_docs(cpus: int) -> int:
    glob = os.path.join(WORK, f"index_{cpus}", "manifest", "*.parquet")
    try:
        import duckdb
        return int(duckdb.sql(
            f"select sum(docs_tokenized) from '{glob}'").fetchone()[0])
    except Exception:
        return -1


def main() -> int:
    pkg = make_pkg_zip(os.path.join(WORK, "nss_pkg.zip"))
    out = json.load(open(OUT)) if os.path.exists(OUT) else {"query": {}, "rebuilds": []}

    for cpus in (8, 32):
        if _index_docs(cpus) != 2400000:
            b = _run_worker(cpus, C24, WORK, pkg, ["--skip-queries"])
            out["rebuilds"].append({"cpus": cpus, "build_sec": b["build_sec"],
                                    "files_per_sec": b["files_per_sec"]})
            with open(OUT, "w") as fh:
                json.dump(out, fh, indent=1)

    for cpus in (8, 32):
        if str(cpus) in out["query"]:
            continue
        q = _run_worker(cpus, C24, WORK, pkg, ["--skip-build"])
        out["query"][str(cpus)] = {
            "qps": q["queries_per_sec"],
            "query_sec": q["query_sec"],
            "query_runs_sec": q.get("query_runs_sec"),
            "qps_single": q.get("queries_per_sec_single"),
            "latency_p50_p95": q.get("latency_p50_p95"),
        }
        with open(OUT, "w") as fh:
            json.dump(out, fh, indent=1)

    out["query_efficiency_8to32"] = round(
        out["query"]["32"]["qps"] / (4 * out["query"]["8"]["qps"]), 3)
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)

    # fold into the raw scaling.json shape r5_curate_scaling.py reads
    raw = json.load(open(RAW))
    if "results" in raw:
        for cpus in ("8", "32"):
            raw["results"][cpus]["queries_per_sec"] = out["query"][cpus]["qps"]
            raw["results"][cpus]["query_sec"] = out["query"][cpus]["query_sec"]
            raw["results"][cpus]["latency_p50_p95"] = out["query"][cpus]["latency_p50_p95"]
        raw["query_scaling_efficiency"] = out["query_efficiency_8to32"]
        with open(RAW, "w") as fh:
            json.dump(raw, fh, indent=2)
    print(json.dumps({"query_eff_8to32": out["query_efficiency_8to32"],
                      "qps": {c: out["query"][c]["qps"] for c in ("8", "32")}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
