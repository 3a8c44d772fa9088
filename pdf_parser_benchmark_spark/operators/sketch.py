"""Cardinality sketches — HyperLogLog (Flajolet et al. 2007) with an
all-integer register path so Spark and the DuckDB oracle agree bit-exactly.

Spark ships `approx_count_distinct` (HLL++), but its binary sketch is not
reproducible in ANSI SQL; this implementation exposes the registers as
plain integer columns:

- 60-bit base hash: conv(substr(md5(v),1,15),16,10) — the repo's standard
  two-engine hash bridge (operators/dedup.py:_base_hash);
- bucket = h mod m (m = 2^p), remainder v = h div m (W = 60-p bits);
- rho = W+1 - bitlength(v) (v=0 → W+1), bitlength via length(bin(v)) —
  transcendental-free;
- register M_b = max(rho) per (key, bucket) — one map-side-combined
  shuffle of (key, bucket, rho) triples, never values;
- integer register sum S = Σ_b 2^(R − M_b) with R = W+1 (empty buckets
  contribute 2^R), S ≤ m·2^R ≤ 2^61 — fits BIGINT exactly;
- raw estimate E = α_m·m²·2^R / S, evaluated as one double expression
  with identical operation order on both engines (IEEE-deterministic).

No small/large-range corrections (HLL's linear-counting switch) — the raw
estimator only; callers compare against the exact count in tests. At
10^12 rows the shuffle volume is m registers per key, independent of
cardinality — the whole point of the sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# alpha_64 = 0.7213 / (1 + 1.079/64), in micro-units
ALPHA_MICRO = {4: 673000, 5: 697000, 6: 709340}


def hll_distinct(df: DataFrame, key_col: str, value_col: str,
                 p: int = 6) -> DataFrame:
    """Per-key HLL distinct estimate of `value_col`, plus the exact
    count for calibration. Returns (key, exact_distinct, n_buckets,
    reg_sum, hll_est) — all BIGINT."""
    m = 1 << p
    w = 60 - p
    r = w + 1
    alpha = ALPHA_MICRO[p]

    h = F.conv(F.substring(F.md5(F.col(value_col)), 1, 15), 16, 10) \
         .cast("bigint")
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(value_col).alias("val"),
        F.pmod(h, F.lit(m)).alias("bucket"),
        h.alias("h"),
    ).withColumn("v", F.expr(f"h DIV {m}"))
    rho = F.when(F.col("v") == 0, F.lit(r)).otherwise(
        F.lit(r) - F.length(F.bin(F.col("v")))
    )
    regs = (
        base.withColumn("rho", rho)
        .groupBy("key", "bucket")
        .agg(F.max("rho").alias("m_reg"))
    )
    sums = regs.groupBy("key").agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                     f"CAST({r} - m_reg AS INT))")).alias("s_present"),
        F.count("*").alias("n_buckets"),
    ).select(
        "key", "n_buckets",
        (F.col("s_present")
         + (F.lit(m) - F.col("n_buckets"))
         * F.lit(1 << r).cast("long")).alias("reg_sum"),
    )
    exact = df.groupBy(F.col(key_col).alias("key")).agg(
        F.countDistinct(value_col).alias("exact_distinct")
    )
    est = F.expr(
        f"CAST(FLOOR(CAST({alpha} AS DOUBLE) / 1000000.0D * {m * m}.0D"
        f" * CAST({1 << r} AS DOUBLE) / CAST(reg_sum AS DOUBLE))"
        f" AS BIGINT)"
    )
    return exact.join(sums, "key").select(
        F.col("key").alias(key_col),
        "exact_distinct", "n_buckets", "reg_sum", est.alias("hll_est"),
    )
