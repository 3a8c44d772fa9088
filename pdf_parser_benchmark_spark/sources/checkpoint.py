"""Partition-level checkpoint manifest: resume = left-anti join of input
splits against completed-split records.

Generalizes the reference's two skip mechanisms into one primitive:
whole-run guard (`nodes.json exists` → exit, /root/reference/src/ingest.py:276-281)
and incremental SKU skip (anti-filter against already-indexed SKUs,
/root/reference/src/embed.py:106-115).

A *split* is a deterministic bucket of urls: ``pmod(xxhash64(url), n_splits)``
— stable across runs, partition counts, and cluster sizes, so a resumed run
at different parallelism skips exactly the work a previous run committed.
Each manifest row records the ``n_splits`` it was computed under: split 3
of 64 is NOT split 3 of 128, so resume ignores rows from a different
bucketing rather than silently skipping the wrong url set. Bucketing
sentinel convention: NEGATIVE n_splits marks split ids that are NOT plain
url-hash buckets — the streaming ingest records batch-namespaced splits as
``n_splits = -N`` so a batch resume on ``n_splits = N`` never confuses
"stream processed batch k's files" with "hash bucket complete" (r5,
ADVICE r4 interop fix).

Write protocol (idempotence, SURVEY.md §7 hard-part 4): output is written
partitioned-by-split with dynamic partition overwrite FIRST, the manifest
row is appended AFTER — a crash between the two re-does a split (overwrite,
harmless) but never skips an unwritten one. Rows carry a monotonic
``commit_seq`` (driver wall-clock ns at mark time) so "latest wins" is
well-defined across resumed runs.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

MANIFEST_SCHEMA = (
    "split_id INT, status STRING, rows_out BIGINT, run_id STRING, "
    "n_splits INT, commit_seq BIGINT"
)


def with_split_id(df: DataFrame, n_splits: int, url_col: str = "url") -> DataFrame:
    return df.withColumn(
        "split_id", F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_splits)).cast("int")
    )


def _recover_manifest(manifest_dir: str) -> None:
    """Heal a crash mid-compaction-swap: if the live dir is gone but the
    renamed-aside copy survives, put it back. Never leaves zero manifest."""
    old = manifest_dir.rstrip("/") + ".old"
    if not os.path.isdir(manifest_dir) and os.path.isdir(old):
        os.rename(old, manifest_dir)


def read_completed_splits(
    spark: SparkSession, manifest_dir: str, n_splits: int | None = None
) -> DataFrame:
    """Distinct completed split ids (empty DF if no manifest yet).

    With ``n_splits`` given, rows recorded under a DIFFERENT bucketing are
    ignored — resuming 64-split work with n_splits=128 redoes everything
    instead of skipping wrong splits. Legacy manifests without the column
    are trusted as-is."""
    _recover_manifest(manifest_dir)
    if not os.path.isdir(manifest_dir) or not any(
        f.endswith(".parquet") for f in _walk_files(manifest_dir)
    ):
        return spark.createDataFrame([], "split_id INT")
    df = spark.read.parquet(manifest_dir).filter(F.col("status") == "complete")
    if n_splits is not None and "n_splits" in df.columns:
        df = df.filter(F.col("n_splits") == n_splits)
    return df.select("split_id").distinct()


def _walk_files(root: str):
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            yield f


def filter_resumable(
    df_with_split: DataFrame,
    spark: SparkSession,
    manifest_dir: str,
    n_splits: int | None = None,
) -> DataFrame:
    """Drop rows of already-completed splits (left-anti, broadcast: the
    manifest is tiny relative to input)."""
    done = read_completed_splits(spark, manifest_dir, n_splits)
    return df_with_split.join(F.broadcast(done), "split_id", "left_anti")


def compact_manifest(spark: SparkSession, manifest_dir: str) -> int:
    """Squash the append-only manifest to one row per (n_splits, split_id),
    latest commit_seq wins.

    The manifest grows one row per split per run; at 10^12 scale with many
    resumed runs this is the small-files problem in miniature. Compaction
    rewrites it as a single snapshot. The swap renames the old dir aside
    BEFORE moving the new one in, and the read path heals a half-finished
    swap (_recover_manifest) — a crash at any point leaves a readable
    manifest, worst case the uncompacted one."""
    import shutil

    from pyspark.sql import Window

    _recover_manifest(manifest_dir)
    df = spark.read.parquet(manifest_dir)
    order = (
        [F.desc("commit_seq"), F.desc("run_id")]
        if "commit_seq" in df.columns
        else [F.desc("run_id")]  # legacy manifest: arbitrary-but-stable
    )
    keys = ["split_id"] + (["n_splits"] if "n_splits" in df.columns else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    latest = (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    tmp = manifest_dir.rstrip("/") + ".compacting"
    old = manifest_dir.rstrip("/") + ".old"
    latest.coalesce(1).write.mode("overwrite").parquet(tmp)
    n = spark.read.parquet(tmp).count()
    if os.path.isdir(old):
        shutil.rmtree(old)
    os.rename(manifest_dir, old)  # old snapshot survives until the new is live
    os.rename(tmp, manifest_dir)
    shutil.rmtree(old)
    return n


def mark_splits_complete(
    extracted: DataFrame,
    manifest_dir: str,
    run_id: str,
    n_splits: int | None = None,
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
            F.lit(n_splits).cast("int").alias("n_splits"),
            F.lit(time.time_ns()).alias("commit_seq"),
        )
        .write.mode("append")
        .parquet(manifest_dir)
    )
