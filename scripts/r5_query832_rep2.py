#!/usr/bin/env python
"""Second fresh-JVM 8→32 QUERY rep on the 2.4M-doc index (the round-5
pair was a single clean rep; this brings the query efficiency to a
median of 2 like the build side). Rebuilds index_8 at 2.4M first if a
1.2M pair run overwrote it (same path), appends `query_rep2` into
BENCH/r5_query832.json, and re-curates. Run ALONE."""

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
    out = json.load(open(OUT))
    out.setdefault("query_rep2", {})
    out.setdefault("rebuilds", [])

    for cpus in (8, 32):
        if _index_docs(cpus) != 2400000:
            b = _run_worker(cpus, C24, WORK, pkg, ["--skip-queries"])
            out["rebuilds"].append({"cpus": cpus, "build_sec": b["build_sec"],
                                    "files_per_sec": b["files_per_sec"]})
            with open(OUT, "w") as fh:
                json.dump(out, fh, indent=1)

    for cpus in (8, 32):
        if str(cpus) in out["query_rep2"]:
            continue
        q = _run_worker(cpus, C24, WORK, pkg, ["--skip-build"])
        out["query_rep2"][str(cpus)] = {
            "qps": q["queries_per_sec"],
            "query_sec": q["query_sec"],
            "query_runs_sec": q.get("query_runs_sec"),
            "latency_p50_p95": q.get("latency_p50_p95"),
        }
        with open(OUT, "w") as fh:
            json.dump(out, fh, indent=1)

    med = {c: (out["query"][c]["qps"] + out["query_rep2"][c]["qps"]) / 2.0
           for c in ("8", "32")}
    out["qps_median_of_2"] = med
    out["query_efficiency_8to32_median_of_2"] = round(
        med["32"] / (4 * med["8"]), 3)
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"rep1": {c: out["query"][c]["qps"] for c in ("8", "32")},
                      "rep2": {c: out["query_rep2"][c]["qps"] for c in ("8", "32")},
                      "eff_median_of_2": out["query_efficiency_8to32_median_of_2"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
