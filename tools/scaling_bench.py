"""N-vs-4N scaling evidence (north_rule: throughput scaling efficiency ≥0.8
from N to 4N parallelism). No multi-node cluster exists in this sandbox, so
"N executors vs 4N executors" is stood in by CPU-pinned local runs: each
level runs in a FRESH process pinned (taskset) to exactly its cores — an
N-core machine vs a 4N-core machine — with its own JVM, reading the same
input parquet. Two independent pairs are measured (4→16 and 8→32); see
BENCH/BASELINE.md for why the saturating pair is hardware-capped.

Protocol (SURVEY.md §6/§7 hard-part 5):
- corpus materialized once (256 parquet files; zero-shuffle input splits
  give fine task granularity at every level);
- per level: one warm-up pass then TRIALS timed passes; median and best
  reported (this VM shows ±30% timing noise from neighbors);
- correctness gate first: identical output fingerprints across all levels;
- NOTHING else may run on the box during measurement.

Writes /tmp/scale_all.json and regenerates BENCH/BASELINE.md via
tools/write_baseline_md.py.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = int(os.environ.get("SCALE_ROWS", "240000"))
TRIALS = int(os.environ.get("SCALE_TRIALS", "5"))
LEVELS = ((4, "0-3"), (16, "0-15"), (8, "0-7"), (32, "0-31"))
HERE = os.path.dirname(os.path.abspath(__file__))


def ensure_corpus() -> str:
    from pdf_parser_benchmark_spark.synth.pages import CORPUS_VERSION

    corpus = f"/tmp/spark_graft_scale_pages_v{CORPUS_VERSION}_{N_ROWS}_f256"
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        from pdf_parser_benchmark_spark.session import get_spark
        from pdf_parser_benchmark_spark.synth.pages import generate_pages_df

        spark = get_spark(
            cpus=32, extra_conf={"spark.ui.showConsoleProgress": "false"}
        )
        generate_pages_df(spark, N_ROWS, partitions=256).write.mode(
            "overwrite"
        ).parquet(corpus)
        spark.stop()
    return corpus


def run_level(cpus: int, pin: str, corpus: str) -> dict:
    cmd = [
        "taskset", "-c", pin, sys.executable,
        os.path.join(HERE, "_scale_one.py"), str(cpus), corpus, str(TRIALS),
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, check=True
    ).stdout.strip().splitlines()[-1]
    return json.loads(out)


def main() -> None:
    corpus = ensure_corpus()
    with open("/tmp/scale_all.json", "w") as f:
        for cpus, pin in LEVELS:
            res = run_level(cpus, pin, corpus)
            f.write(json.dumps(res) + "\n")
            f.flush()
            print(json.dumps(res))
    subprocess.run(
        [sys.executable, os.path.join(HERE, "write_baseline_md.py"),
         "/tmp/scale_all.json"],
        check=True,
    )


if __name__ == "__main__":
    main()
