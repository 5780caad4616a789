#!/usr/bin/env python
"""Resume the interrupted round-4 scaling run (scripts/r4_scaling.py).

The original run completed the 2->8 pair, the before-control probe, and
7 of 8 attribution builds; it was cut before (rep2, 32 cores, v4), the
8->32 query pair, and the after-control probe. This script finishes
exactly those cells, appending into the existing BENCH/r4_attrib.json.

Run ALONE on the box (kill stray Spark JVMs first); ~15 min.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from r4_scaling import WORK, C24, probe, _flush  # noqa: E402
from scaling_bench import _run_worker, make_pkg_zip  # noqa: E402


def main() -> int:
    path = os.path.join(REPO, "BENCH", "r4_attrib.json")
    res = json.load(open(path))
    builds = res["attrib_8_to_32"]["builds"]
    have = {(b["rep"], b["cpus"], b["variant"]) for b in builds}
    pkg = make_pkg_zip(os.path.join(WORK, "nss_pkg.zip"))

    # missing attribution build cells (fresh pkg zip picks up no kernel
    # changes — builder/codec code is untouched since the original run)
    for rep in (1, 2):
        for cpus in (8, 32):
            for variant, extra in (("v3", ["--no-positions"]), ("v4", [])):
                if (rep, cpus, variant) in have:
                    continue
                b = _run_worker(cpus, C24, WORK, pkg, ["--skip-queries", *extra])
                builds.append(
                    {"rep": rep, "cpus": cpus, "variant": variant,
                     "build_sec": b["build_sec"], "files_per_sec": b["files_per_sec"],
                     "sha256_mismatches": b["sha256_mismatches"],
                     "bytes_compressed": b["bytes_compressed"]}
                )
                _flush(res)

    # query pair 8->32 over the v4 indexes. index_8's last build was
    # rep2/8/v4; index_32's was the v4 build the loop above just ran.
    for cpus in (8, 32):
        if f"query_{cpus}" in res["attrib_8_to_32"]:
            continue
        q = _run_worker(cpus, C24, WORK, pkg, ["--skip-build"])
        res["attrib_8_to_32"][f"query_{cpus}"] = {
            "queries_per_sec": q["queries_per_sec"], "query_runs": q.get("query_runs"),
            "n_queries": q["n_queries"],
        }
        _flush(res)

    if "after" not in res["controls"]:
        res["controls"]["after"] = probe()
        _flush(res)
    print(json.dumps({"done": True}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
