"""Output sink: Iceberg when a catalog is configured, parquet otherwise.

The production design writes `df.writeTo(table).overwritePartitions()` on an
Iceberg catalog (atomic per-partition replacement, snapshot isolation — the
right target for resumable 10^12-row runs). This container has no Iceberg
runtime jar (SURVEY.md §7), so the fallback is parquet with dynamic
partition overwrite, which preserves the property the checkpoint protocol
needs: re-writing a split replaces exactly that split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Schema  # noqa: SLF001 — presence probe
        return True
    except Exception:
        return False


def write_extracted(
    df: DataFrame,
    path_or_table: str,
    partition_col: str = "split_id",
) -> None:
    spark = df.sparkSession
    if path_or_table.count(".") >= 2 and not path_or_table.startswith("/"):
        # catalog.db.table → Iceberg path
        (
            df.writeTo(path_or_table)
            .partitionedBy(partition_col)
            .createOrReplace()
        )
        return
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        df.write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(path_or_table)
    )
