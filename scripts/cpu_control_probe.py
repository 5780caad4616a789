#!/usr/bin/env python
"""Control experiment for BENCH/BASELINE.md: a compute-dense,
memory-light Spark job (whole-stage-codegen FP loop, no shuffle, no
Python) run at two parallelism levels on the same box.

If THIS scales ~linearly while the index build plateaus, the build's
plateau is the machine's shared DRAM bandwidth (one socket serving all
local[N] threads), not the engine's Spark structure — on a real N vs 4N
*executor* cluster each executor brings its own memory bandwidth, which
is the regime the north rule targets.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time


def run_level(cpus: int, rows: int) -> float:
    code = f"""
import time
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[{cpus}]").appName("cpu-probe")
         .config("spark.driver.memory", "8g")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
df = spark.range(0, {rows}, 1, {cpus * 4})

def flops(batches):
    # L2-resident numpy FLOP loop: compute-dense, memory-light — the
    # same Arrow-worker execution path as the index kernel, minus the
    # DRAM traffic. 64k doubles = 512 KB working set.
    for b in batches:
        x = np.arange(65536, dtype=np.float64)
        for _ in range(40 * len(b)):
            x = np.sqrt(x * 1.0001 + 1.0)
        yield pd.DataFrame({{"x": [float(x[0])]}})

t0 = time.perf_counter()
out = df.mapInPandas(flops, "x double").agg(F.sum("x")).collect()
print("PROBE_SEC", round(time.perf_counter() - t0, 3))
spark.stop()
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=900)
    for line in out.stdout.splitlines():
        if line.startswith("PROBE_SEC"):
            return float(line.split()[1])
    raise RuntimeError(out.stderr[-2000:])


def main() -> int:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    t_lo = run_level(lo, rows)
    t_hi = run_level(hi, rows)
    eff = t_lo / ((hi / lo) * t_hi)
    print(json.dumps({"rows": rows, "levels": [lo, hi], "sec": {lo: t_lo, hi: t_hi},
                      "control_scaling_efficiency": round(eff, 3)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
