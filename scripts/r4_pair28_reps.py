#!/usr/bin/env python
"""Two extra v4 build reps at 2 and 8 cores on the 1.2M-doc corpus so
the headline 2->8 build pair is a MEDIAN OF 3 (the box swings +/-25%
on single runs; the query side already repeats inside the worker).
Interleaved 2,8,2,8 — appends into BENCH/r4_attrib.json under
``pair_2_to_8_build_reps``. Run ALONE; ~18 min."""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from r4_scaling import WORK, C12, _flush  # noqa: E402
from scaling_bench import _run_worker, make_pkg_zip  # noqa: E402


def main() -> int:
    path = os.path.join(REPO, "BENCH", "r4_attrib.json")
    res = json.load(open(path))
    reps = res.setdefault("pair_2_to_8_build_reps", [])
    pkg = make_pkg_zip(os.path.join(WORK, "nss_pkg.zip"))
    for rep in (2, 3):
        for cpus in (2, 8):
            if any(r["rep"] == rep and r["cpus"] == cpus for r in reps):
                continue
            b = _run_worker(cpus, C12, WORK, pkg, ["--skip-queries"])
            reps.append(
                {"rep": rep, "cpus": cpus, "build_sec": b["build_sec"],
                 "files_per_sec": b["files_per_sec"],
                 "sha256_mismatches": b["sha256_mismatches"]}
            )
            _flush(res)
    print(json.dumps({"done": True}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
