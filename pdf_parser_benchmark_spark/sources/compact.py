"""Small-file compaction for the extracted output table.

Resumed/batched runs leave many small files per split partition (one per
task per commit). At 10^12 scale the file count itself becomes the
bottleneck (listing, openCost, driver memory). Compaction rewrites chosen
splits as one file each via the same dynamic-partition-overwrite contract
the pipeline uses — byte-content equality is preserved, only layout
changes. (Iceberg's rewrite_data_files is the managed equivalent; this is
the parquet-fallback twin.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def output_file_stats(spark: SparkSession, output_dir: str) -> DataFrame:
    """Files per split (via input_file_name) — the compaction trigger."""
    df = spark.read.parquet(output_dir)
    return (
        df.withColumn("file", F.input_file_name())
        .groupBy("split_id")
        .agg(F.countDistinct("file").alias("n_files"), F.count("*").alias("rows"))
    )


def compact_output(
    spark: SparkSession,
    output_dir: str,
    min_files: int = 2,
) -> dict:
    """Rewrite every split holding ≥ min_files files down to one file each.

    Uses repartition(split_id) so each output partition maps to exactly one
    task → one file, then dynamic overwrite replaces only those splits."""
    stats = output_file_stats(spark, output_dir)
    targets = [
        r["split_id"] for r in stats.filter(F.col("n_files") >= min_files).collect()
    ]
    if not targets:
        return {"compacted_splits": 0}
    df = spark.read.parquet(output_dir).filter(F.col("split_id").isin(targets))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        df.repartition(len(targets), "split_id")
        .sortWithinPartitions("url")
        .write.mode("overwrite")
        .partitionBy("split_id")
        .parquet(output_dir)
    )
    return {"compacted_splits": len(targets)}
