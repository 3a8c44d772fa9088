"""HyperLogLog sketch tests: estimator accuracy at known cardinalities,
register-path edge cases, determinism."""

from pyspark.sql import functions as F

from pdf_parser_benchmark_spark.operators.sketch import hll_distinct


def test_hll_accuracy_at_5k(spark):
    df = spark.range(5000).select(
        F.lit("k").alias("key"), F.col("id").cast("string").alias("val")
    )
    row = hll_distinct(df, "key", "val", p=6).collect()[0]
    assert row["exact_distinct"] == 5000
    # raw HLL stderr at m=64 is ~13%; allow 3 sigma
    assert abs(row["hll_est"] - 5000) / 5000 < 0.4
    assert row["n_buckets"] == 64


def test_hll_duplicates_do_not_inflate(spark):
    uniq = spark.range(1000).select(
        F.lit("k").alias("key"), F.col("id").cast("string").alias("val"))
    dup = uniq.union(uniq).union(uniq)
    a = hll_distinct(uniq, "key", "val").collect()[0]
    b = hll_distinct(dup, "key", "val").collect()[0]
    assert a["reg_sum"] == b["reg_sum"] and a["hll_est"] == b["hll_est"]


def test_hll_single_value(spark):
    df = spark.createDataFrame([("k", "only")], "key string, val string")
    row = hll_distinct(df, "key", "val").collect()[0]
    assert row["exact_distinct"] == 1 and row["n_buckets"] == 1
    # one register set → estimate must be tiny
    assert row["hll_est"] <= 50
