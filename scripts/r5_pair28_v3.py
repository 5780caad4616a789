#!/usr/bin/env python
"""Fresh 2→8 build pair in the v3 positions-off configuration (the
north-star build config: store_positions is per-field optional, Lucene
IndexOptions analog) — interleaved fresh-JVM reps on the same 1.2M-doc
corpus as BENCH/r5_pair28.json, so the round-5 report carries the same
v3-vs-positional attribution at 2→8 that round 4 measured at 8→32.
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
OUT = os.path.join(REPO, "BENCH", "r5_pair28_v3.json")


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0


def main() -> int:
    res = json.load(open(OUT)) if os.path.exists(OUT) else {
        "format": "v3 positions-off (north-star build config)",
        "n_docs": 1200000, "build_reps": [],
    }
    pkg = make_pkg_zip(os.path.join(WORK, "nss_pkg.zip"))
    for rep in (1, 2):
        for cpus in (2, 8):
            if any(r["rep"] == rep and r["cpus"] == cpus
                   for r in res["build_reps"]):
                continue
            b = _run_worker(cpus, C12, WORK, pkg,
                            ["--skip-queries", "--no-positions"])
            res["build_reps"].append({
                "rep": rep, "cpus": cpus, "build_sec": b["build_sec"],
                "files_per_sec": b["files_per_sec"],
                "bytes_compressed": b.get("bytes_compressed"),
                "sha256_mismatches": b["sha256_mismatches"],
            })
            with open(OUT, "w") as fh:
                json.dump(res, fh, indent=1)
    b2 = _median([r["files_per_sec"] for r in res["build_reps"] if r["cpus"] == 2])
    b8 = _median([r["files_per_sec"] for r in res["build_reps"] if r["cpus"] == 8])
    res["build_efficiency_2to8_v3"] = round(b8 / (4 * b2), 3)
    with open(OUT, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps({"v3_build_eff_2to8": res["build_efficiency_2to8_v3"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
