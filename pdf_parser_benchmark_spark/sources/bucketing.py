"""Bucketed-table support: pre-shuffle once at write time, join for free
forever after.

At 10^12 rows the extracted table is re-joined constantly (against
checkpoint manifests, dedup verdicts, embedding shards). Bucketing both
sides on the join key (`CLUSTERED BY (url) INTO n BUCKETS`) makes those
joins exchange-free: Spark reads co-located buckets and sort-merge-joins
them without a shuffle. This is the batch analog of the reference's
payload-indexed Qdrant filters (/root/reference/docs/TECHSPEC.md:148-155) —
pay the organization cost at write time, not per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 16
) -> None:
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
