#!/usr/bin/env python
"""Two extra v5 build reps at 8 and 32 cores on the 2.4M corpus so the
8→32 build pair is a MEDIAN OF 3 (rep 1 = the scaling_bench run, read
from BENCH/scaling.json). Interleaved 8,32,8,32. Appends into
BENCH/r5_attrib.json. Run ALONE."""

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
OUT = os.path.join(REPO, "BENCH", "r5_attrib.json")


def _flush(res):
    with open(OUT, "w") as fh:
        json.dump(res, fh, indent=1)


def main() -> int:
    if os.path.exists(OUT):
        res = json.load(open(OUT))
    else:
        sc = json.load(open(os.path.join(REPO, "BENCH", "scaling.json")))
        res = {"format": "v5 positional", "n_docs": 2400000,
               "build_reps_8to32": [
                   {"rep": 1, "cpus": c,
                    "build_sec": sc["results"][str(c)]["build_sec"],
                    "files_per_sec": sc["results"][str(c)]["files_per_sec"]}
                   for c in (8, 32)
               ]}
    reps = res["build_reps_8to32"]
    pkg = make_pkg_zip(os.path.join(WORK, "nss_pkg.zip"))
    for rep in (2, 3):
        for cpus in (8, 32):
            if any(r["rep"] == rep and r["cpus"] == cpus for r in reps):
                continue
            b = _run_worker(cpus, C24, WORK, pkg, ["--skip-queries"])
            reps.append({"rep": rep, "cpus": cpus, "build_sec": b["build_sec"],
                         "files_per_sec": b["files_per_sec"],
                         "sha256_mismatches": b["sha256_mismatches"],
                         "bytes_positions": b.get("bytes_positions")})
            _flush(res)

    def med(cpus):
        xs = sorted(r["files_per_sec"] for r in reps if r["cpus"] == cpus)
        n = len(xs)
        return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2.0

    res["files_per_sec_median"] = {"8": med(8), "32": med(32)}
    res["build_efficiency_8to32_median"] = round(med(32) / (4 * med(8)), 3)
    _flush(res)
    print(json.dumps({"eff_median": res["build_efficiency_8to32_median"],
                      "per_rep": [round(r2["files_per_sec"] / (4 * r8["files_per_sec"]), 3)
                                  for r8, r2 in zip(
                                      [r for r in reps if r["cpus"] == 8],
                                      [r for r in reps if r["cpus"] == 32])]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
