"""Streaming-summary sketches — HyperLogLog cardinality (Flajolet et al.
2007) and count-min frequency (Cormode & Muthukrishnan 2005), both with
all-integer register paths so Spark and the DuckDB oracle agree bit-exactly.

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


def cms_counters(df: DataFrame, value_col: str, d: int = 4,
                 w: int = 256) -> DataFrame:
    """Count-min sketch counters (Cormode & Muthukrishnan 2005): d salted
    hash rows × w buckets. Built from per-value partial counts (ONE
    map-side-combined shuffle of (value, count) pairs, vocabulary-sized),
    then fanned out ×d on the counted relation — never on raw tokens —
    and re-aggregated to (row, bucket, cnt): a d·w-row relation
    regardless of corpus size. Returns (row, bucket, cnt)."""
    counted = df.groupBy(F.col(value_col).alias("val")).agg(
        F.count("*").alias("cnt")
    )
    rows = counted.select(
        "val", "cnt", F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row")
    )
    bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("row").cast("string"), F.lit(":"),
                               F.col("val"))), 1, 15), 16, 10
        ).cast("bigint"),
        F.lit(w),
    )
    return (
        rows.withColumn("bucket", bucket)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(candidates: DataFrame, counters: DataFrame,
                 value_col: str, d: int = 4, w: int = 256) -> DataFrame:
    """Point-query the sketch for each candidate value: min over the d
    row counters at that value's buckets. The counters side is d·w rows —
    always broadcast. Returns candidates + `cms_est`; the estimate
    overcounts, never undercounts. The counter relation is SPARSE (only
    touched buckets have rows), so a probe whose buckets include an
    untouched one has true min 0 — candidates with fewer than d matched
    rows estimate 0 instead of being dropped by the join."""
    fan = candidates.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row")
    )
    bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("row").cast("string"), F.lit(":"),
                               F.col(value_col))), 1, 15), 16, 10
        ).cast("bigint"),
        F.lit(w),
    )
    keys = [c for c in candidates.columns]
    matched = (
        fan.withColumn("bucket", bucket)
        .join(F.broadcast(counters), ["row", "bucket"])
        .groupBy(*keys)
        # count DISTINCT rows (ADVICE r6): duplicate candidate rows would
        # otherwise inflate a plain count to d·multiplicity and flip a
        # genuinely present value to cms_est 0 (an undercount)
        .agg(F.min("cnt").alias("min_cnt"),
             F.count_distinct(F.col("row")).alias("n_rows"))
    )
    return candidates.join(matched, keys, "left").select(
        *keys,
        F.when(F.col("n_rows") == d, F.col("min_cnt"))
         .otherwise(F.lit(0)).cast("long").alias("cms_est"),
    )


def exact_quantiles(df: DataFrame, key_col: str, value_col: str,
                    pcts: tuple[int, ...] = (50, 90, 99)) -> DataFrame:
    """EXACT per-key quantiles of an integer column without a global
    sort: aggregate to a (key, value) histogram (bounded by the value
    domain, not row count), build the cumulative distribution with a
    per-key self-join over the broadcast histogram, then pick each
    percentile as the smallest value whose cumulative count reaches
    ceil(p·n/100) — the lower-bound (type-1) sample quantile. All-integer
    ⇒ bit-exact vs SQL. Spark's percentile_approx trades accuracy for one
    pass; this trades a bounded-histogram shuffle for exactness."""
    hist = df.groupBy(
        F.col(key_col).alias("key"), F.col(value_col).alias("v")
    ).agg(F.count("*").alias("cnt"))
    cum = (
        hist.alias("a")
        .join(F.broadcast(hist.alias("b")),
              (F.col("b.key") == F.col("a.key"))
              & (F.col("b.v") <= F.col("a.v")))
        .groupBy(F.col("a.key").alias("key"), F.col("a.v").alias("v"))
        .agg(F.sum("b.cnt").alias("cum"))
    )
    totals = hist.groupBy("key").agg(F.sum("cnt").alias("n"))
    j = cum.join(totals, "key")
    aggs = [F.max("n").alias("n")]
    for p in pcts:
        aggs.append(
            F.min(
                F.when(
                    F.col("cum") >= F.expr(f"(n * {p} + 99) DIV 100"),
                    F.col("v"),
                )
            ).alias(f"p{p}")
        )
    return j.groupBy("key").agg(*aggs).select(
        F.col("key").alias(key_col), "n",
        *[F.col(f"p{p}") for p in pcts],
    )


def _bloom_pos(i, value_col: str, m: int):
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(i.cast("string"), F.lit(":"),
                               F.col(value_col))), 1, 15), 16, 10
        ).cast("bigint"),
        F.lit(m),
    )


def bloom_bits(df: DataFrame, value_col: str, m: int = 16384,
               k: int = 4) -> DataFrame:
    """Bloom filter build (Bloom 1970): the filter as a relation of
    DISTINCT set bit positions (≤ m rows — broadcastable by
    construction). k salted md5 hashes per value, positions mod m."""
    fan = df.select(
        value_col,
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i"),
    )
    return fan.select(
        _bloom_pos(F.col("i"), value_col, m).alias("pos")
    ).distinct()


def bloom_probe(df: DataFrame, value_col: str, bits: DataFrame,
                m: int = 16384, k: int = 4) -> DataFrame:
    """Membership probe: a value bloom-hits iff ALL k of its positions
    are set. The bit relation joins broadcast; the probe side fans ×k and
    re-aggregates — no state on the probe side. May overmatch (classic
    Bloom false positives), never undermatches."""
    keys = list(df.columns)
    fan = df.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i")
    ).withColumn("pos", _bloom_pos(F.col("i"), value_col, m))
    matched = fan.join(F.broadcast(bits), "pos").groupBy(*keys).agg(
        F.count("*").alias("n_matched")
    )
    return df.join(matched, keys, "left").select(
        *keys,
        (F.coalesce("n_matched", F.lit(0)) == k).alias("bloom_hit"),
    )


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
