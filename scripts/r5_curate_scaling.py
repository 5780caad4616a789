#!/usr/bin/env python
"""Fold the round-5 raw runs (scaling_bench output + r5_attrib reps +
r5_pair28) into the curated BENCH/scaling.json shape bench.py and the
judge read (pairs.2_to_8 / pairs.8_to_32 with medians + notes), keeping
round-4 numbers alongside for the trend."""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
B = os.path.join(REPO, "BENCH")


def _med(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0


def main() -> int:
    attrib = json.load(open(os.path.join(B, "r5_attrib.json")))
    q832 = json.load(open(os.path.join(B, "r5_query832.json")))
    pair28 = json.load(open(os.path.join(B, "r5_pair28.json")))
    r4 = json.load(open(os.path.join(B, "scaling_r4.json")))
    v3_path = os.path.join(B, "r5_pair28_v3.json")
    pair28_v3 = json.load(open(v3_path)) if os.path.exists(v3_path) else None
    rerun_path = os.path.join(B, "r5_pair28_rerun.json")
    rerun = json.load(open(rerun_path)) if os.path.exists(rerun_path) else None

    # the contaminated rep (ran concurrently with an active session —
    # same run whose query phase was flat) is kept in the raw file but
    # excluded from the curated medians; see attrib["contamination_note"]
    reps832 = [r for r in attrib["build_reps_8to32"]
               if not r.get("contaminated")]
    b8 = _med([r["files_per_sec"] for r in reps832 if r["cpus"] == 8])
    b32 = _med([r["files_per_sec"] for r in reps832 if r["cpus"] == 32])
    # median of the clean fresh-JVM query reps (rep2 added late-round)
    med2 = q832.get("qps_median_of_2")
    q8 = med2["8"] if med2 else q832["query"]["8"]["qps"]
    q32 = med2["32"] if med2 else q832["query"]["32"]["qps"]

    b2 = _med([r["files_per_sec"] for r in pair28["build_reps"] if r["cpus"] == 2])
    b8s = _med([r["files_per_sec"] for r in pair28["build_reps"] if r["cpus"] == 8])

    out = {
        "round": 5,
        "format": ("v5 positional postings (per-term PFor-or-varint position "
                   "deltas, whichever is smaller; store_positions=True default; "
                   "v3 positions-off remains the north-star config)"),
        "protocol": r4["protocol"].replace(
                        "builds repeated 3x via interleaved orchestrator reps "
                        "(median); raw runs in BENCH/r4_attrib.json",
                        "builds repeated via interleaved fresh-JVM orchestrator "
                        "reps (5 per level at 2->8, 4 clean at 8->32; medians); "
                        "raw runs in BENCH/r5_attrib.json + r5_pair28*.json")
                    + "; round 5 adds per-request latency p50/p95 at 1/8/32 "
                      "concurrent clients per level and SAME-DAY control "
                      "probes for both pairs (BENCH/r5_controls.json)",
        "pairs": {
            "2_to_8": {
                "n_docs": 1200000,
                "build": {
                    "2": {"files_per_sec_median": round(b2, 1),
                          "runs_files_per_sec": [r["files_per_sec"] for r in
                                                 pair28["build_reps"] if r["cpus"] == 2]},
                    "8": {"files_per_sec_median": round(b8s, 1),
                          "runs_files_per_sec": [r["files_per_sec"] for r in
                                                 pair28["build_reps"] if r["cpus"] == 8]},
                    "efficiency": round(b8s / (4 * b2), 3),
                    "note": "v5 positional build, interleaved fresh-JVM reps "
                            "per level (BENCH/r5_pair28.json)",
                },
                **({"build_v3_positions_off": {
                    "2": {"files_per_sec_median": round(_med(
                        [r["files_per_sec"] for r in pair28_v3["build_reps"]
                         if r["cpus"] == 2]), 1)},
                    "8": {"files_per_sec_median": round(_med(
                        [r["files_per_sec"] for r in pair28_v3["build_reps"]
                         if r["cpus"] == 8]), 1)},
                    "efficiency": pair28_v3["build_efficiency_2to8_v3"],
                    "note": "north-star build configuration (positions are "
                            "per-field optional, Lucene IndexOptions analog); "
                            "interleaved fresh-JVM reps, same corpus/day as "
                            "the positional pair (BENCH/r5_pair28_v3.json)",
                }} if pair28_v3 and "build_efficiency_2to8_v3" in pair28_v3
                   else {}),
                **({"build_followup_rerun": {
                    "efficiency": rerun.get("build_efficiency_2to8"),
                    "per_rep_ratios": rerun.get("per_rep_ratios"),
                    "runs_files_per_sec": {
                        str(c): [r["files_per_sec"] for r in rerun["build_reps"]
                                 if r["cpus"] == c] for c in (2, 8)},
                    "note": "END-OF-ROUND follow-up pair (v5 positional, same "
                            "corpus/protocol), taken after the box ceiling "
                            "recovered (probes 0.889/0.872 vs the campaign "
                            "day's 0.849); rep 1 ran in a degraded window "
                            "(both absolute levels 20-35% below every "
                            "campaign rep — see rep1_note) and one rep was "
                            "contaminated by a double-launched orchestrator "
                            "and excluded (BENCH/r5_pair28_rerun.json); the "
                            "campaign's 5-rep median (0.737) remains the "
                            "headline, this block is corroborating evidence",
                }} if rerun and rerun.get("build_efficiency_2to8") is not None
                   else {}),
                "query": (lambda qmed: {
                    "2": {"qps": qmed["2"] if qmed else pair28["query"]["2"]["qps"],
                          "latency_p50_p95": pair28["query"]["2"].get("latency_p50_p95")},
                    "8": {"qps": qmed["8"] if qmed else pair28["query"]["8"]["qps"],
                          "latency_p50_p95": pair28["query"]["8"].get("latency_p50_p95")},
                    "efficiency": (pair28["query_efficiency_2to8_median_of_2"]
                                   if qmed
                                   else round(pair28["query"]["8"]["qps"]
                                              / (4 * pair28["query"]["2"]["qps"]), 3)),
                    "note": "48 DISTINCT queries, msearch batches, median of 3 "
                            "workload repeats inside the worker, fresh serving "
                            "JVM" + (", median of 2 interleaved pairs"
                                     if qmed else ""),
                })(pair28.get("qps_median_of_2")),
                "round4_reference": r4["pairs"]["2_to_8"],
            },
            "8_to_32": {
                "n_docs": 2400000,
                "build": {
                    "8": {"files_per_sec_median": round(b8, 1),
                          "runs_files_per_sec": [r["files_per_sec"] for r in reps832
                                                 if r["cpus"] == 8]},
                    "32": {"files_per_sec_median": round(b32, 1),
                           "runs_files_per_sec": [r["files_per_sec"] for r in reps832
                                                  if r["cpus"] == 32]},
                    "efficiency": round(b32 / (4 * b8), 3),
                    "note": "v5 positional (varint default), interleaved "
                            "fresh-JVM reps, contaminated rep excluded "
                            "(BENCH/r5_attrib.json); v4 was 0.305; the 9.3% "
                            "PFor position-byte cut (BENCH/r5_pos_bytes.json, "
                            "opt-in) cannot move a metric bound by the box's "
                            "shared memory-bandwidth ceiling (control probe "
                            "0.41-0.43); positions-off v3 remains the "
                            "north-star config at 0.380",
                },
                "query": {
                    "8": {"qps": q8,
                          "latency_p50_p95": q832["query"]["8"].get("latency_p50_p95")},
                    "32": {"qps": q32,
                           "latency_p50_p95": q832["query"]["32"].get("latency_p50_p95")},
                    "efficiency": round(q32 / (4 * q8), 3),
                    "note": ("median of 2 interleaved fresh-JVM query pairs"
                             if med2 else "single fresh-JVM pair this round")
                            + " (r04 same-protocol measured 0.610; the "
                            "same-day probe ceiling is 0.399-0.43)",
                },
                "round4_reference": r4["pairs"]["8_to_32"],
            },
        },
        "deterministic": {
            # per-rep invariants from the clean interleaved builds: the
            # position-stream byte count is identical across every rep at
            # BOTH levels (r5_attrib.json), and sha256 mismatches are 0 in
            # every rep that records them
            "positions_bytes_equal_across_levels_and_reps": len({
                r["bytes_positions"] for r in attrib["build_reps_8to32"]
                if r.get("bytes_positions")}) == 1,
            "bytes_positions": next(
                r["bytes_positions"] for r in attrib["build_reps_8to32"]
                if r.get("bytes_positions")),
            "bytes_compressed_2_4m": 956565858,
            "sha256_mismatches": max(
                r.get("sha256_mismatches", 0)
                for r in attrib["build_reps_8to32"]),
        },
        # hardware ceiling context: round-5 SAME-DAY probes for both
        # pairs (BENCH/r5_controls.json) + the round-4 references
        "control_probe": {
            **json.load(open(os.path.join(B, "r5_controls.json"))),
            "round4": r4.get("controls", {}),
        },
    }
    with open(os.path.join(B, "scaling.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"2_to_8": {
        "build": out["pairs"]["2_to_8"]["build"]["efficiency"],
        "query": out["pairs"]["2_to_8"]["query"]["efficiency"]},
        "8_to_32": {
        "build": out["pairs"]["8_to_32"]["build"]["efficiency"],
        "query": out["pairs"]["8_to_32"]["query"]["efficiency"]}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
