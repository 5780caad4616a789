#!/usr/bin/env python
"""Round-4 scaling evidence run.

Produces BENCH/r4_attrib.json with three blocks:

1. ``pair_2_to_8`` — fresh v4 build+query pair on the 1.2M-doc corpus
   (the north rule's headline N→4N evidence, re-measured this round).
2. ``attrib_8_to_32`` — the VERDICT r03 "what's wrong #3" attribution:
   v4 (positions on) vs v3 (positions off) builds at 8 and 32 cores on
   the 2.4M-doc corpus, SAME DAY, interleaved repeats — so the
   0.463→0.352 8→32 drop can be attributed to either the positional
   streams or the box.
3. ``controls`` — the compute-dense/memory-light Arrow probe at 8 vs 32
   before and after, bounding the box's same-day ceiling.

Run ALONE on the box (kill stray Spark JVMs first); ~45 min.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from scaling_bench import _run_worker, make_pkg_zip  # noqa: E402

WORK = "/tmp/nss_scaling"
C12 = os.path.join(WORK, "corpus_1200000")
C24 = os.path.join(WORK, "corpus_2400000")


def probe(rows: int = 16000) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "cpu_control_probe.py"), str(rows)],
        capture_output=True, text=True, timeout=1800,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(out.stdout[-500:] + out.stderr[-1000:])


def main() -> int:
    pkg = make_pkg_zip(os.path.join(WORK, "nss_pkg.zip"))
    res: dict = {"controls": {}, "pair_2_to_8": {}, "attrib_8_to_32": {"builds": []}}

    res["controls"]["before"] = probe()

    # --- 1. headline 2→8 pair, v4, 1.2M docs ---------------------------
    for cpus in (2, 8):
        b = _run_worker(cpus, C12, WORK, pkg, ["--skip-queries"])
        q = _run_worker(cpus, C12, WORK, pkg, ["--skip-build"])
        res["pair_2_to_8"][str(cpus)] = {
            "build_sec": b["build_sec"], "files_per_sec": b["files_per_sec"],
            "sha256_mismatches": b["sha256_mismatches"],
            "postings": b["postings"], "bytes_compressed": b["bytes_compressed"],
            "queries_per_sec": q["queries_per_sec"], "query_runs": q.get("query_runs"),
        }
        _flush(res)

    # --- 2. v4-vs-v3 attribution at 8 and 32, 2.4M docs, 2 reps --------
    # v3 first so the LAST build at each level is v4 — step 3's query
    # pair then serves from the v4 (default-config) index
    for rep in (1, 2):
        for cpus in (8, 32):
            for variant, extra in (("v3", ["--no-positions"]), ("v4", [])):
                b = _run_worker(cpus, C24, WORK, pkg, ["--skip-queries", *extra])
                res["attrib_8_to_32"]["builds"].append(
                    {"rep": rep, "cpus": cpus, "variant": variant,
                     "build_sec": b["build_sec"], "files_per_sec": b["files_per_sec"],
                     "sha256_mismatches": b["sha256_mismatches"],
                     "bytes_compressed": b["bytes_compressed"]}
                )
                _flush(res)

    # --- 3. query pair 8→32 on the 2.4M v4 index -----------------------
    # (the last v4 build at each level left its index in place)
    for cpus in (8, 32):
        q = _run_worker(cpus, C24, WORK, pkg, ["--skip-build"])
        res["attrib_8_to_32"][f"query_{cpus}"] = {
            "queries_per_sec": q["queries_per_sec"], "query_runs": q.get("query_runs"),
            "n_queries": q["n_queries"],
        }
        _flush(res)

    res["controls"]["after"] = probe()
    _flush(res)
    print(json.dumps({"done": True}))
    return 0


def _flush(res: dict) -> None:
    with open(os.path.join(REPO, "BENCH", "r4_attrib.json"), "w") as fh:
        json.dump(res, fh, indent=1)


if __name__ == "__main__":
    raise SystemExit(main())
