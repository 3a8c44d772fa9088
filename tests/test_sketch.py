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


def test_cms_never_undercounts_and_bounds_error(spark):
    from pdf_parser_benchmark_spark.operators.sketch import (
        cms_counters,
        cms_estimate,
    )

    # zipf-ish: value i appears (2000 // (i+1)) times, 200 distinct
    rows = [(f"v{i}",) for i in range(200) for _ in range(2000 // (i + 1))]
    df = spark.createDataFrame(rows, "val string")
    counters = cms_counters(df, "val", d=4, w=256)
    exact = df.groupBy("val").agg(F.count("*").alias("exact_cnt"))
    est = cms_estimate(exact, counters, "val", d=4, w=256).collect()
    n_total = len(rows)
    for r in est:
        assert r["cms_est"] >= r["exact_cnt"]  # CMS never undercounts
        # standard CMS bound: err <= e*N/w with prob 1-e^-d; allow 2x
        assert r["cms_est"] - r["exact_cnt"] <= 2 * 2.72 * n_total / 256
    # the heavy hitter is far above the error floor → exact-ish
    top = max(est, key=lambda r: r["exact_cnt"])
    assert top["exact_cnt"] == 2000
    assert top["cms_est"] - top["exact_cnt"] <= n_total // 64


def test_cms_absent_value_estimates_zero_or_collision(spark):
    from pdf_parser_benchmark_spark.operators.sketch import (
        cms_counters,
        cms_estimate,
    )

    corpus = spark.createDataFrame([("in0",), ("in1",)], "val string")
    counters = cms_counters(corpus, "val", d=4, w=4096)
    probes = spark.createDataFrame(
        [("in0",), ("never-seen-1",), ("never-seen-2",)], "val string")
    got = {r["val"]: r["cms_est"]
           for r in cms_estimate(probes, counters, "val",
                                 d=4, w=4096).collect()}
    assert len(got) == 3          # absent probes are NOT dropped
    assert got["in0"] == 1
    # with 8 touched buckets of 4096, an absent probe's 4 buckets are
    # almost surely not all touched → estimate 0
    assert got["never-seen-1"] == 0 and got["never-seen-2"] == 0


def test_cms_duplicate_candidate_rows_still_present(spark):
    """ADVICE r6: duplicate candidate rows must not defeat the
    all-d-rows-matched presence test (count_distinct on the row index,
    not a plain count)."""
    from pdf_parser_benchmark_spark.operators.sketch import (
        cms_counters,
        cms_estimate,
    )

    corpus = spark.createDataFrame([("hot",)] * 7 + [("cold",)], "val string")
    counters = cms_counters(corpus, "val", d=4, w=4096)
    probes = spark.createDataFrame(
        [("hot",), ("hot",), ("hot",), ("cold",)], "val string")
    rows = cms_estimate(probes, counters, "val", d=4, w=4096).collect()
    assert len(rows) == 4  # duplicates survive the join
    for r in rows:
        truth = 7 if r["val"] == "hot" else 1
        assert r["cms_est"] >= truth  # present values never estimate 0


def test_cms_collision_free_is_exact(spark):
    from pdf_parser_benchmark_spark.operators.sketch import (
        cms_counters,
        cms_estimate,
    )

    df = spark.createDataFrame(
        [(f"x{i % 5}",) for i in range(50)], "val string"
    )
    counters = cms_counters(df, "val", d=4, w=4096)
    exact = df.groupBy("val").agg(F.count("*").alias("exact_cnt"))
    for r in cms_estimate(exact, counters, "val", d=4, w=4096).collect():
        assert r["cms_est"] == r["exact_cnt"] == 10


def test_exact_quantiles_match_numpy(spark):
    import numpy as np

    from pdf_parser_benchmark_spark.operators.sketch import exact_quantiles

    vals = [((i * 37) % 101) + (7 if i % 3 == 0 else 0) for i in range(500)]
    df = spark.createDataFrame(
        [("k", v) for v in vals], "key string, v long"
    )
    row = exact_quantiles(df, "key", "v").collect()[0]
    arr = np.sort(np.array(vals))
    for p in (50, 90, 99):
        # lower-bound (type-1) quantile: value at rank ceil(p*n/100)
        rank = -(-p * len(vals) // 100)
        assert row[f"p{p}"] == int(arr[rank - 1]), p
    assert row["n"] == 500


def test_bloom_no_false_negatives_and_bounded_fpr(spark):
    from pdf_parser_benchmark_spark.operators.sketch import (
        bloom_bits,
        bloom_probe,
    )

    members = spark.createDataFrame(
        [(f"m{i}",) for i in range(500)], "val string")
    others = spark.createDataFrame(
        [(f"x{i}",) for i in range(2000)], "val string")
    bits = bloom_bits(members, "val", m=16384, k=4).persist()
    assert bits.count() <= 2000  # ≤ k·|S|, deduped
    # every member must hit (no false negatives — the Bloom guarantee)
    got = bloom_probe(members, "val", bits, m=16384, k=4)
    assert got.filter("NOT bloom_hit").count() == 0
    # non-members: fill ≈ 1-e^(-2000/16384) ≈ 0.115 → FPR ≈ 0.115^4 ≈ 2e-4
    fp = bloom_probe(others, "val", bits, m=16384, k=4) \
        .filter("bloom_hit").count()
    assert fp <= 10  # 2000 probes at ~2e-4 expected ≈ 0.4; 10 = hard cap
    bits.unpersist()


def test_priority_sample_estimator_unbiasedness(spark):
    """Σ max(w_i, τ) over the sample estimates the TOTAL corpus weight
    (Duffield et al. 2007). With k=20 over 5000 zipf-ish weights the
    estimator is noisy but must land in the right decade; also the
    sample must be exactly the top-k by priority and deterministic."""
    from pdf_parser_benchmark_spark.queries import QUERIES

    import duckdb
    import os
    import tempfile

    rows = [(i, "s", 10 + (i * 37) % 500) for i in range(5000)]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, source string, n_chars long"
        ).withColumn("text", F.lit("x")).withColumn("lang", F.lit("en")) \
         .coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = QUERIES["priority_sample"](spark, d).collect()
        out2 = QUERIES["priority_sample"](spark, d).collect()
    assert [r["doc_id"] for r in out] == [r["doc_id"] for r in out2]
    assert len(out) == 20
    total = sum(w for _, _, w in rows)
    est = sum(r["est_w"] for r in out)
    assert total / 3 < est < total * 3  # k=20 → decade-level accuracy
    # every sampled row's estimate is >= its true weight (max(w, tau))
    assert all(r["est_w"] >= r["w"] for r in out)


def test_hll_single_value(spark):
    df = spark.createDataFrame([("k", "only")], "key string, val string")
    row = hll_distinct(df, "key", "val").collect()[0]
    assert row["exact_distinct"] == 1 and row["n_buckets"] == 1
    # one register set → estimate must be tiny
    assert row["hll_est"] <= 50
