#!/usr/bin/env python
"""Summarize BENCH/r4_attrib.json into the efficiency numbers that
BENCH/BASELINE.md reports: the headline 2->8 pair, the v4-vs-v3 8->32
build attribution (median over interleaved reps), the 8->32 query pair,
and the same-day control probes."""

from __future__ import annotations

import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    d = json.load(open(os.path.join(REPO, "BENCH", "r4_attrib.json")))
    out: dict = {}

    p = d.get("pair_2_to_8", {})
    if "2" in p and "8" in p:
        out["pair_2_to_8"] = {
            "build_files_per_sec": {c: p[c]["files_per_sec"] for c in ("2", "8")},
            "build_eff": round(p["8"]["files_per_sec"] / (4 * p["2"]["files_per_sec"]), 3),
            "queries_per_sec": {c: p[c]["queries_per_sec"] for c in ("2", "8")},
            "query_eff": round(p["8"]["queries_per_sec"] / (4 * p["2"]["queries_per_sec"]), 3),
            "sha256_mismatches": [p[c]["sha256_mismatches"] for c in ("2", "8")],
        }

    a = d.get("attrib_8_to_32", {})
    builds = a.get("builds", [])
    med: dict = {}
    for v in ("v3", "v4"):
        for c in (8, 32):
            xs = [b["files_per_sec"] for b in builds if b["variant"] == v and b["cpus"] == c]
            if xs:
                med[f"{v}@{c}"] = round(statistics.median(xs), 1)
    if len(med) == 4:
        out["attrib_8_to_32"] = {
            "median_files_per_sec": med,
            "eff_v3": round(med["v3@32"] / (4 * med["v3@8"]), 3),
            "eff_v4": round(med["v4@32"] / (4 * med["v4@8"]), 3),
            "v4_over_v3_at_8": round(med["v4@8"] / med["v3@8"], 3),
            "v4_over_v3_at_32": round(med["v4@32"] / med["v3@32"], 3),
            "raw": builds,
        }
    if "query_8" in a and "query_32" in a:
        q8, q32 = a["query_8"]["queries_per_sec"], a["query_32"]["queries_per_sec"]
        out["query_8_to_32"] = {
            "queries_per_sec": {"8": q8, "32": q32},
            "eff": round(q32 / (4 * q8), 3),
        }

    c = d.get("controls", {})
    for k in ("before", "after"):
        if k in c:
            out.setdefault("controls", {})[k] = c[k].get("control_scaling_efficiency")

    json.dump(out, sys.stdout, indent=1)
    print()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
