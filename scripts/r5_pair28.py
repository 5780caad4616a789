#!/usr/bin/env python
"""Round-5 2→8 scaling pair on the v5 positional format (1.2M docs):
3 interleaved fresh-JVM build reps per level (medians reject the box's
±25% single-run swing) + one query pair. Writes BENCH/r5_pair28.json.
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
C12 = os.path.join(WORK, "corpus_1200000")
OUT = os.path.join(REPO, "BENCH", "r5_pair28.json")


def _flush(res: dict) -> None:
    with open(OUT, "w") as fh:
        json.dump(res, fh, indent=1)


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0


def main() -> int:
    res = json.load(open(OUT)) if os.path.exists(OUT) else {
        "format": "v5 positional (per-term PFor-or-varint position deltas)",
        "n_docs": 1200000, "build_reps": [], "query": {},
    }
    pkg = make_pkg_zip(os.path.join(WORK, "nss_pkg.zip"))
    for rep in (1, 2, 3):
        for cpus in (2, 8):
            if any(r["rep"] == rep and r["cpus"] == cpus for r in res["build_reps"]):
                continue
            b = _run_worker(cpus, C12, WORK, pkg, ["--skip-queries"])
            res["build_reps"].append({
                "rep": rep, "cpus": cpus, "build_sec": b["build_sec"],
                "files_per_sec": b["files_per_sec"],
                "bytes_positions": b.get("bytes_positions"),
                "bytes_compressed": b.get("bytes_compressed"),
                "sha256_mismatches": b["sha256_mismatches"],
            })
            _flush(res)
    for cpus in (2, 8):
        if str(cpus) not in res["query"]:
            q = _run_worker(cpus, C12, WORK, pkg, ["--skip-build"])
            res["query"][str(cpus)] = {
                "qps": q["queries_per_sec"],
                "latency_p50_p95": q.get("latency_p50_p95"),
            }
            _flush(res)
    b2 = _median([r["files_per_sec"] for r in res["build_reps"] if r["cpus"] == 2])
    b8 = _median([r["files_per_sec"] for r in res["build_reps"] if r["cpus"] == 8])
    res["build_efficiency_2to8"] = round(b8 / (4 * b2), 3)
    res["query_efficiency_2to8"] = round(
        res["query"]["8"]["qps"] / (4 * res["query"]["2"]["qps"]), 3)
    _flush(res)
    print(json.dumps({"build_eff": res["build_efficiency_2to8"],
                      "query_eff": res["query_efficiency_2to8"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
