#!/usr/bin/env python
"""Second fresh-JVM 2→8 QUERY rep on the 1.2M-doc index, so the
HEADLINE query-scaling number (the north rule's ≥0.8 target) is a
median of 2 pairs like everything else. Rebuilds index_{2,8} at 1.2M
if another run overwrote them (same path), appends `query_rep2` into
BENCH/r5_pair28.json. Run ALONE."""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from scaling_bench import _run_worker, make_pkg_zip  # noqa: E402

WORK = "/tmp/nss_scaling"
C12 = os.path.join(WORK, "corpus_1200000")
OUT = os.path.join(REPO, "BENCH", "r5_pair28.json")


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
    out.setdefault("query_rep2_rebuilds", [])

    for cpus in (2, 8):
        if _index_docs(cpus) != 1200000:
            b = _run_worker(cpus, C12, WORK, pkg, ["--skip-queries"])
            out["query_rep2_rebuilds"].append(
                {"cpus": cpus, "build_sec": b["build_sec"],
                 "files_per_sec": b["files_per_sec"]})
            with open(OUT, "w") as fh:
                json.dump(out, fh, indent=1)

    for cpus in (2, 8):
        if str(cpus) in out["query_rep2"]:
            continue
        q = _run_worker(cpus, C12, WORK, pkg, ["--skip-build"])
        out["query_rep2"][str(cpus)] = {
            "qps": q["queries_per_sec"],
            "latency_p50_p95": q.get("latency_p50_p95"),
        }
        with open(OUT, "w") as fh:
            json.dump(out, fh, indent=1)

    med = {c: (out["query"][c]["qps"] + out["query_rep2"][c]["qps"]) / 2.0
           for c in ("2", "8")}
    out["qps_median_of_2"] = med
    out["query_efficiency_2to8_median_of_2"] = round(
        med["8"] / (4 * med["2"]), 3)
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({
        "rep1": {c: out["query"][c]["qps"] for c in ("2", "8")},
        "rep2": {c: out["query_rep2"][c]["qps"] for c in ("2", "8")},
        "eff_median_of_2": out["query_efficiency_2to8_median_of_2"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
