"""Partition-level checkpoint manifest: resume = left-anti join of input
splits against completed-split records.

Generalizes the reference's two skip mechanisms into one primitive:
whole-run guard (`nodes.json exists` → exit, /root/reference/src/ingest.py:276-281)
and incremental SKU skip (anti-filter against already-indexed SKUs,
/root/reference/src/embed.py:106-115).

A *split* is a deterministic bucket of urls: ``pmod(xxhash64(url), n_splits)``
— stable across runs, partition counts, and cluster sizes, so a resumed run
at different parallelism skips exactly the work a previous run committed.
Write protocol (idempotence, SURVEY.md §7 hard-part 4): output is written
partitioned-by-split with dynamic partition overwrite FIRST, the manifest
row is appended AFTER — a crash between the two re-does a split (overwrite,
harmless) but never skips an unwritten one.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST_SCHEMA = "split_id INT, status STRING, rows_out BIGINT, run_id STRING"


def with_split_id(df: DataFrame, n_splits: int, url_col: str = "url") -> DataFrame:
    return df.withColumn(
        "split_id", F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_splits)).cast("int")
    )


def read_completed_splits(spark: SparkSession, manifest_dir: str) -> DataFrame:
    """Distinct completed split ids (empty DF if no manifest yet)."""
    if not os.path.isdir(manifest_dir) or not any(
        f.endswith(".parquet") for f in _walk_files(manifest_dir)
    ):
        return spark.createDataFrame([], "split_id INT")
    return (
        spark.read.parquet(manifest_dir)
        .filter(F.col("status") == "complete")
        .select("split_id")
        .distinct()
    )


def _walk_files(root: str):
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            yield f


def filter_resumable(
    df_with_split: DataFrame, spark: SparkSession, manifest_dir: str
) -> DataFrame:
    """Drop rows of already-completed splits (left-anti, broadcast: the
    manifest is tiny relative to input)."""
    done = read_completed_splits(spark, manifest_dir)
    return df_with_split.join(F.broadcast(done), "split_id", "left_anti")


def compact_manifest(spark: SparkSession, manifest_dir: str) -> int:
    """Squash the append-only manifest to one row per split (latest wins).

    The manifest grows one row per split per run; at 10^12 scale with many
    resumed runs this is the small-files problem in miniature. Compaction
    rewrites it as a single snapshot (write-new-then-swap for atomicity).
    Returns the surviving row count."""
    import shutil

    from pyspark.sql import Window, functions as F2

    df = spark.read.parquet(manifest_dir)
    w = Window.partitionBy("split_id").orderBy(F.desc("run_id"))
    latest = (
        df.withColumn("rn", F2.row_number().over(w))
        .filter(F2.col("rn") == 1)
        .drop("rn")
    )
    tmp = manifest_dir.rstrip("/") + ".compacting"
    latest.coalesce(1).write.mode("overwrite").parquet(tmp)
    n = spark.read.parquet(tmp).count()
    shutil.rmtree(manifest_dir)
    shutil.move(tmp, manifest_dir)
    return n


def mark_splits_complete(
    extracted: DataFrame, manifest_dir: str, run_id: str
) -> None:
    """Append one `complete` row per split actually written this run."""
    (
        extracted.groupBy("split_id")
        .agg(F.count("*").alias("rows_out"))
        .select(
            "split_id",
            F.lit("complete").alias("status"),
            "rows_out",
            F.lit(run_id).alias("run_id"),
        )
        .write.mode("append")
        .parquet(manifest_dir)
    )
