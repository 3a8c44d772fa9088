"""spark-submit entry point for the extraction pipeline.

Cluster usage (north_rule packaging requirement):

    python tools/package.py   # builds dist/pdf_parser_benchmark_spark.zip
    spark-submit \\
      --py-files dist/pdf_parser_benchmark_spark.zip \\
      --conf spark.sql.adaptive.enabled=true \\
      -m ...  pdf_parser_benchmark_spark/plans/job.py \\
      --input  s3://bucket/pages_iceberg_or_parquet \\
      --output catalog.db.extracted        # or a parquet path \\
      --manifest s3://bucket/manifests/run1 \\
      --n-splits 4096

Local smoke:

    python -m pdf_parser_benchmark_spark.plans.job \\
      --synthetic-rows 1000 --output /tmp/out --manifest /tmp/mani
"""

from __future__ import annotations

import argparse
import json

from ..session import get_spark
from .pipeline import run_pipeline


def main() -> None:
    ap = argparse.ArgumentParser(description="resumable extraction pipeline")
    ap.add_argument("--input", help="pages table path (parquet/iceberg dir)")
    ap.add_argument("--synthetic-rows", type=int, default=0,
                    help="generate a deterministic synthetic corpus instead")
    ap.add_argument("--output", required=True)
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--n-splits", type=int, default=64)
    ap.add_argument("--n-tasks", type=int, default=None,
                    help="force a repartition (default: zero-shuffle)")
    ap.add_argument("--commit-batches", type=int, default=4)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app_name="extract-job")
    if args.synthetic_rows:
        from ..synth.pages import generate_pages_df

        pages = generate_pages_df(spark, args.synthetic_rows)
    else:
        pages = spark.read.parquet(args.input)

    result = run_pipeline(
        spark,
        pages,
        output_dir=args.output,
        manifest_dir=args.manifest,
        n_splits=args.n_splits,
        n_tasks=args.n_tasks,
        resume=not args.no_resume,
        commit_batches=args.commit_batches,
    )
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
