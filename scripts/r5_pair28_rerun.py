#!/usr/bin/env python
"""Round-5 follow-up 2-to-8 BUILD pair (v5 positional, 1.2M docs) taken
when the same-day control ceiling recovered to 0.889 (vs 0.849 on the
campaign day and 0.761 at the earlier follow-up probe). Build-only: the
query side of the two-size criterion is already above target (0.957).
Interleaved fresh-JVM reps, resumable, writes BENCH/r5_pair28_rerun.json.
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
OUT = os.path.join(REPO, "BENCH", "r5_pair28_rerun.json")


def _flush(res: dict) -> None:
    with open(OUT, "w") as fh:
        json.dump(res, fh, indent=1)


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    # at most N build steps per invocation: the orchestrator is driven by
    # short sequential calls so a killed parent never orphans a running
    # spark-submit child (the contamination mechanism this file guards
    # against); resumable via OUT between invocations
    max_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    res = json.load(open(OUT)) if os.path.exists(OUT) else {
        "format": "v5 positional (per-term PFor-or-varint position deltas)",
        "n_docs": 1200000,
        "same_day_control_ceiling_2to8": 0.889,
        "build_reps": [],
    }
    pkg = make_pkg_zip(os.path.join(WORK, "nss_pkg.zip"))
    steps = 0
    for rep in range(1, reps + 1):
        for cpus in (2, 8):
            if any(r["rep"] == rep and r["cpus"] == cpus for r in res["build_reps"]):
                continue
            if steps >= max_steps:
                print(json.dumps({"partial": True,
                                  "done_steps": len(res["build_reps"])}))
                return 0
            b = _run_worker(cpus, C12, WORK, pkg, ["--skip-queries"])
            res["build_reps"].append({
                "rep": rep, "cpus": cpus, "build_sec": b["build_sec"],
                "files_per_sec": b["files_per_sec"],
                "sha256_mismatches": b["sha256_mismatches"],
            })
            _flush(res)
            steps += 1
    b2 = _median([r["files_per_sec"] for r in res["build_reps"] if r["cpus"] == 2])
    b8 = _median([r["files_per_sec"] for r in res["build_reps"] if r["cpus"] == 8])
    res["build_efficiency_2to8"] = round(b8 / (4 * b2), 3)
    per_pair = {}
    for r in res["build_reps"]:
        per_pair.setdefault(r["rep"], {})[r["cpus"]] = r["files_per_sec"]
    res["per_rep_ratios"] = {
        str(k): round(v[8] / (4 * v[2]), 3)
        for k, v in sorted(per_pair.items()) if 2 in v and 8 in v
    }
    _flush(res)
    print(json.dumps({"build_eff_2to8": res["build_efficiency_2to8"],
                      "per_rep": res["per_rep_ratios"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
