"""Explicit skew handling (north_rule): the synthetic corpus has a hot host
(~20% of rows); these tests pin that (a) the default xxhash64(url) partition
key spreads it uniformly, and (b) the salted-host key bounds any single
(host, salt) bucket while a raw host key would concentrate 20% in one task."""

from pyspark.sql import functions as F

from pdf_parser_benchmark_spark.plans.pipeline import salted_host_key
from pdf_parser_benchmark_spark.synth.pages import generate_pages_df

N = 2000
SALT = 16


def test_corpus_is_actually_skewed(spark):
    pages = generate_pages_df(spark, N, partitions=4).select("url")
    host = F.parse_url("url", F.lit("HOST"))
    counts = {r["h"]: r["n"] for r in
              pages.groupBy(host.alias("h")).agg(F.count("*").alias("n")).collect()}
    hot = counts["host0.example"]
    assert hot > 0.15 * N  # the skew exists (fixture contract, FIXTURES.md F1)


def test_salted_host_key_bounds_hot_host(spark):
    pages = generate_pages_df(spark, N, partitions=4).select("url")
    host = F.parse_url("url", F.lit("HOST"))
    unsalted_max = (
        pages.groupBy(host.alias("k")).agg(F.count("*").alias("n"))
        .agg(F.max("n")).collect()[0][0]
    )
    salted_max = (
        pages.groupBy(salted_host_key(salt_buckets=SALT).alias("k"))
        .agg(F.count("*").alias("n"))
        .agg(F.max("n")).collect()[0][0]
    )
    # hot host split across SALT buckets: its largest salted bucket must be
    # a small fraction of the unsalted concentration
    assert salted_max < unsalted_max / (SALT / 3)
    assert salted_max < 0.05 * N


def test_default_hash_key_spreads_uniformly(spark):
    pages = generate_pages_df(spark, N, partitions=4)
    dist = (
        pages.repartition(16, F.xxhash64("url"))
        .groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    sizes = [r["n"] for r in dist]
    assert len(sizes) == 16
    assert max(sizes) < 2.0 * (N / 16)  # no partition even 2x the mean


def test_auto_salt_splits_only_hot_hosts(spark):
    """auto_salted_host_key measures shares and salts ONLY hosts above the
    threshold: host0 (~20% of rows) spreads over many key buckets, while a
    cold tail host keeps its single pure key (co-location preserved)."""
    from pyspark.sql import functions as F

    from pdf_parser_benchmark_spark.plans.pipeline import auto_salted_host_key
    from pdf_parser_benchmark_spark.synth.pages import generate_pages_df

    pages = generate_pages_df(spark, 600).select("url")
    key = auto_salted_host_key(pages, share_threshold=0.10, salt_buckets=8)
    keyed = pages.select(
        F.parse_url("url", F.lit("HOST")).alias("h"), key.alias("k")
    ).persist()
    try:
        per_host_keys = {
            r["h"]: r["n"]
            for r in keyed.groupBy("h")
            .agg(F.countDistinct("k").alias("n"))
            .collect()
        }
        assert per_host_keys["host0.example"] > 1  # hot: salted
        cold = [h for h in per_host_keys if h not in ("host0.example",)]
        assert cold and all(per_host_keys[h] == 1 for h in cold)  # pure keys
        # the biggest salted bucket is far below the raw host0 share
        top = keyed.groupBy("k").count().agg(F.max("count")).collect()[0][0]
        host0 = keyed.filter(F.col("h") == "host0.example").count()
        assert top < host0
    finally:
        keyed.unpersist()
