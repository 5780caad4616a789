#!/usr/bin/env python
"""Extra clean interleaved build reps for both scaling pairs.

Rep 1 of BENCH/r5_attrib.json (8: 12718 files/s, 32: 10157 — per-rep
efficiency 0.20 vs 0.364/0.355 for reps 2-3) is the scaling_bench run
that executed CONCURRENTLY with an active pytest/Spark session; the
same run's query phase produced the flat-qps artifact (9.06 vs 9.13
qps at 8 vs 32 cores) that forced the r5_query832.py rerun. This
script (a) marks that rep contaminated in place, (b) adds reps 4-5 at
8/32 on the 2.4M corpus, and (c) adds reps 4-5 at 2/8 on the 1.2M
corpus, so both pair medians stand on >=4 clean fresh-JVM reps.
Run ALONE (scaling-bench protocol).
"""

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
C12 = os.path.join(WORK, "corpus_1200000")
A832 = os.path.join(REPO, "BENCH", "r5_attrib.json")
P28 = os.path.join(REPO, "BENCH", "r5_pair28.json")

CONTAMINATION_NOTE = (
    "rep 1 ran concurrently with an active pytest/Spark session (the "
    "same run whose query phase was flat at 9.06/9.13 qps); excluded "
    "from the clean median, kept here for the record"
)


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0


def _flush(path, res):
    with open(path, "w") as fh:
        json.dump(res, fh, indent=1)


def main() -> int:
    pkg = make_pkg_zip(os.path.join(WORK, "nss_pkg.zip"))

    # --- 8->32 pair, 2.4M docs -----------------------------------------
    res = json.load(open(A832))
    reps = res["build_reps_8to32"]
    for r in reps:
        if r["rep"] == 1:
            r["contaminated"] = True
    res["contamination_note"] = CONTAMINATION_NOTE
    for rep in (4, 5):
        for cpus in (8, 32):
            if any(r["rep"] == rep and r["cpus"] == cpus for r in reps):
                continue
            b = _run_worker(cpus, C24, WORK, pkg, ["--skip-queries"])
            reps.append({"rep": rep, "cpus": cpus, "build_sec": b["build_sec"],
                         "files_per_sec": b["files_per_sec"],
                         "sha256_mismatches": b["sha256_mismatches"],
                         "bytes_positions": b.get("bytes_positions")})
            _flush(A832, res)

    def med832(cpus, clean):
        return _median([r["files_per_sec"] for r in reps if r["cpus"] == cpus
                        and not (clean and r.get("contaminated"))])

    res["files_per_sec_median"] = {"8": med832(8, False), "32": med832(32, False)}
    res["build_efficiency_8to32_median"] = round(
        med832(32, False) / (4 * med832(8, False)), 3)
    res["files_per_sec_median_clean"] = {"8": med832(8, True), "32": med832(32, True)}
    res["build_efficiency_8to32_clean"] = round(
        med832(32, True) / (4 * med832(8, True)), 3)
    _flush(A832, res)
    print(json.dumps({"eff_832_clean": res["build_efficiency_8to32_clean"],
                      "eff_832_all": res["build_efficiency_8to32_median"]}))

    # --- 2->8 pair, 1.2M docs -------------------------------------------
    p = json.load(open(P28))
    for rep in (4, 5):
        for cpus in (2, 8):
            if any(r["rep"] == rep and r["cpus"] == cpus
                   for r in p["build_reps"]):
                continue
            b = _run_worker(cpus, C12, WORK, pkg, ["--skip-queries"])
            p["build_reps"].append({
                "rep": rep, "cpus": cpus, "build_sec": b["build_sec"],
                "files_per_sec": b["files_per_sec"],
                "bytes_positions": b.get("bytes_positions"),
                "bytes_compressed": b.get("bytes_compressed"),
                "sha256_mismatches": b["sha256_mismatches"],
            })
            _flush(P28, p)
    b2 = _median([r["files_per_sec"] for r in p["build_reps"] if r["cpus"] == 2])
    b8 = _median([r["files_per_sec"] for r in p["build_reps"] if r["cpus"] == 8])
    p["build_efficiency_2to8"] = round(b8 / (4 * b2), 3)
    _flush(P28, p)
    print(json.dumps({"build_eff_2to8": p["build_efficiency_2to8"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
