"""Round-7 optimization measurement harness (bench.py stays frozen).

Per-query isolation: same session + methodology as bench.py (count() after
release_intermediates/clearCache for the cold lane, immediate re-run for the
warm lane), plus optional .explain("formatted") capture to plans/r07/.

Usage:
  python bench_extra.py [--queries a,b,c] [--trials 3] [--explain PREFIX]
                        [--sf-dir DIR] [--noop]

Prints one JSON line with per-query cold (min of trials) and warm seconds.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                       "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default=None,
                    help="comma list; default = bench.py HEADLINE")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--explain", default=None,
                    help="write plans/r07/<q>_<PREFIX>.txt explain output")
    ap.add_argument("--noop", action="store_true",
                    help="use noop sink instead of count()")
    args = ap.parse_args()

    from pdf_parser_benchmark_spark.session import get_spark
    from pdf_parser_benchmark_spark.queries import QUERIES
    from pdf_parser_benchmark_spark.operators.dedup import release_intermediates

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench_extra", cpus=cpus,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})

    if args.queries:
        names = args.queries.split(",")
    else:
        names = [
            "boilerplate_strip", "minhash_neardup", "minhash_neardup_xx",
            "dedup_exact", "knn_join", "ann_ivf_topk",
            "hierarchy_propagation", "sessionize", "windowed_event_counts",
            "tpch_q1_pricing", "tpch_q3_topk",
        ]

    def run(df):
        if args.noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if args.explain:
            os.makedirs("plans/r07", exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, args.sf_dir).explain("formatted")
            with open(f"plans/r07/{name}_{args.explain}.txt", "w") as f:
                f.write(buf.getvalue())
        run(fn(spark, args.sf_dir))  # warm-up (codegen, JVM)
        cold = []
        for _ in range(args.trials):
            release_intermediates()
            spark.catalog.clearCache()
            t0 = time.monotonic()
            run(fn(spark, args.sf_dir))
            cold.append(round(time.monotonic() - t0, 3))
        t0 = time.monotonic()
        run(fn(spark, args.sf_dir))  # persisted intermediates still live
        warm = round(time.monotonic() - t0, 3)
        release_intermediates()
        spark.catalog.clearCache()
        out[name] = {"cold_min": min(cold), "cold": cold, "warm": warm}
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({"sf_dir": args.sf_dir, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
