"""Output sink: Iceberg when a catalog is configured, parquet otherwise.

The production design writes `df.writeTo(table).overwritePartitions()` on an
Iceberg catalog (atomic per-partition replacement, snapshot isolation — the
right target for resumable 10^12-row runs). This container has no Iceberg
runtime jar (SURVEY.md §7), so the fallback is parquet with dynamic
partition overwrite, which preserves the property the checkpoint protocol
needs: re-writing a split replaces exactly that split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Schema  # noqa: SLF001 — presence probe
        return True
    except Exception:
        return False


def is_table_identifier(path_or_table: str) -> bool:
    """catalog.db.table → Iceberg table; anything path-like → parquet."""
    return path_or_table.count(".") >= 2 and not path_or_table.startswith("/")


def _table_exists(spark: SparkSession, table: str) -> bool:
    try:
        return spark.catalog.tableExists(table)
    except Exception:
        return False


def read_extracted(spark: SparkSession, path_or_table: str) -> DataFrame:
    """Sink-aware read-back: Iceberg table identifier or parquet path."""
    if is_table_identifier(path_or_table):
        return spark.read.table(path_or_table)
    return spark.read.parquet(path_or_table)


def write_extracted(
    df: DataFrame,
    path_or_table: str,
    partition_col: str = "split_id",
) -> None:
    """Commit one batch of extracted splits.

    Invariant the checkpoint protocol depends on (module docstring):
    re-writing a split replaces EXACTLY that split — never the table.
    Iceberg: create once if absent, then overwritePartitions() (dynamic
    per-partition replacement, snapshot-isolated). createOrReplace() here
    would wipe previously committed batches while the manifest still marks
    them complete — silent data loss on resume.
    """
    spark = df.sparkSession
    # Colocate each split's rows into one task before the partitioned
    # write: without this, EVERY upstream task writes a part file into
    # EVERY split directory it touches — the r5 10M-doc pipeline smoke
    # measured 524,288 files for 256 splits (2048 tasks × 256 splits), the
    # classic small-files failure that kills a 10^12-row table. The hash
    # repartition moves the (smaller, post-extraction) output once and
    # yields ~one file per split; `spark.sql.shuffle.partitions` tasks
    # each write the whole splits they own.
    df = df.repartition(F.col(partition_col))
    if is_table_identifier(path_or_table):
        writer = df.writeTo(path_or_table).partitionedBy(F.col(partition_col))
        if _table_exists(spark, path_or_table):
            writer.overwritePartitions()
        else:
            writer.create()
        return
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        df.write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(path_or_table)
    )
