"""Two-parallelism scaling evidence for the curation funnel (north-rule
style: same input, N vs 4N cores, scaling efficiency = docs/s_4N /
(4 · docs/s_N)). Reuses the cached 1M corpus from tools/curation_1m.py
(or generates a smaller one via CURATION_N).

Each level runs in a FRESH interpreter/JVM pinned to its cores via
taskset (the same protocol as tools/scaling_bench.py). Output fingerprint
(stage counts) must be identical across levels — correctness first.

Usage: python tools/curation_scale.py [n_low] [n_high]   (default 8 32)
Writes /tmp/curation_scale.json; paste into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

N = int(os.environ.get("CURATION_N", "1000000"))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
os.environ["CURATION_N"] = str({n})
import importlib
c1m = importlib.import_module("curation_1m")
from pdf_parser_benchmark_spark.operators.curation import curation_funnel
from pdf_parser_benchmark_spark.session import get_spark
from pyspark.sql import functions as F

spark = get_spark(cpus={cpus},
                  extra_conf={{"spark.ui.showConsoleProgress": "false"}})
from pdf_parser_benchmark_spark.operators.dedup import release_intermediates

path = c1m.ensure_corpus(spark)
docs = spark.read.parquet(path)
docs.count()
walls = []
stages = None
for _ in range(2):  # run 1 = cold (JIT-dominated), run 2 = warm
    t0 = time.monotonic()
    out = curation_funnel(docs)
    stages = sorted(
        (r["stage"], r["cnt"])
        for r in out.groupBy("stage").agg(
            F.count("*").alias("cnt")).collect()
    )
    walls.append(time.monotonic() - t0)
    release_intermediates()
    spark.catalog.clearCache()
print("RESULT " + json.dumps(
    {{"wall": walls[0], "wall_warm": walls[1], "stages": stages}}))
"""


def run_level(cpus: int, n: int) -> dict:
    cores = ",".join(str(c) for c in range(cpus))
    script = _CHILD.format(cpus=cpus, n=n)
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo/tools:/root/repo"
    proc = subprocess.run(
        ["taskset", "-c", cores, sys.executable, "-c", script],
        capture_output=True, text=True, env=env, cwd="/root/repo/tools",
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"level {cpus} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def main() -> int:
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_high = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    lo = run_level(n_low, N)
    hi = run_level(n_high, N)
    assert lo["stages"] == hi["stages"], (
        "stage fingerprints differ across parallelism levels!"
    )
    ratio = n_high / n_low
    out = {
        "n_docs": N,
        "cores": [n_low, n_high],
        "wall_sec_cold": [round(lo["wall"], 1), round(hi["wall"], 1)],
        "wall_sec_warm": [round(lo["wall_warm"], 1),
                          round(hi["wall_warm"], 1)],
        "docs_per_sec_warm": [round(N / lo["wall_warm"], 1),
                              round(N / hi["wall_warm"], 1)],
        "scaling_efficiency_cold": round(
            (N / hi["wall"]) / ((N / lo["wall"]) * ratio), 3),
        "scaling_efficiency_warm": round(
            (N / hi["wall_warm"]) / ((N / lo["wall_warm"]) * ratio), 3),
        "stage_fingerprint_identical": True,
        "stages": dict(lo["stages"]),
    }
    print(json.dumps(out))
    open("/tmp/curation_scale.json", "w").write(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
