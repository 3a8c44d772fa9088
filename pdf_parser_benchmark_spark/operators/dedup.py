"""Deduplication suite for large-scale training-data pipelines.

Five strategies, all shuffle-conscious:

- exact: groupBy a text hash, keep min id. One shuffle of (hash, id) pairs
  only — never shuffles document bodies.
- MinHash + LSH: word-shingles → K md5-seeded min-hashes → B bands of R →
  bucket id per band → self-join on (band, bucket) yields candidate pairs →
  exact Jaccard verify. md5-as-hash keeps every stage reproducible in ANSI
  SQL (DuckDB oracle). Banding math is the standard Broder/LSH scheme
  (public literature: Broder 1997; MMDS ch.3).
- SimHash: 64-bit sign-aggregated fingerprint via md5(word) bits; near-dups
  = hamming distance ≤ t on bucketed prefixes.
- n-gram Jaccard: exact verify metric, also standalone within a blocking
  key.
- embedding cosine: near-dup pairs over array<float> vectors, pruned by a
  blocking column (label/IVF list) to avoid the full cross product.

At 10^12 rows the self-joins are the dominant shuffle: candidates are
(band, bucket)-partitioned, so hot buckets (boilerplate-heavy shingle sets)
are the skew risk — AQE skew-join is on (session.py) and bucket ids include
the band index so the B bands spread over the cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import shingles
from ..functions.similarity import jaccard_arrays, cosine_rounded


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the min-id representative of each exact text group."""
    return (
        df.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("h"))
        .groupBy("h")
        .agg(F.min("id").alias("keep_id"), F.count("*").alias("n_dups"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signature(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 16,
    shingle_k: int = 3,
    hash_fn: str = "md5",
    dedup_shingles: bool = False,
) -> DataFrame:
    """→ (id, sig array<string> of length k): sig[i] = min(hash(i||shingle)).

    hash_fn='md5' keeps every stage reproducible in ANSI SQL (the DuckDB
    oracle); hash_fn='xxhash64' is the production path — one cheap 64-bit
    hash per (seed, shingle) instead of a full MD5, ~4× faster at identical
    statistical quality (uniform min-hash either way).

    dedup_shingles=True hashes each DISTINCT shingle once (k hashes) and
    joins back — identical results, big win when the shingle vocabulary is
    much smaller than the exploded rows (template-heavy/boilerplate-heavy
    corpora); skip it when shingles are mostly unique (the join shuffle
    would outweigh the saved hashing)."""
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(shingles(F.col(text_col), shingle_k)).alias("sh")
    )
    if hash_fn == "md5":
        hcol = lambda i: F.md5(F.concat(F.lit(f"{i}|"), F.col("sh")))
    else:
        hcol = lambda i: F.lpad(
            F.hex(F.xxhash64(F.lit(i), F.col("sh"))), 16, "0"
        )
    if dedup_shingles:
        hashed = sh.select("sh").distinct().select(
            "sh", *[hcol(i).alias(f"hh{i}") for i in range(k)]
        )
        joined = sh.join(hashed, "sh")
        aggs = [F.min(F.col(f"hh{i}")).alias(f"h{i}") for i in range(k)]
        sig = joined.groupBy("id").agg(*aggs)
    else:
        aggs = [F.min(hcol(i)).alias(f"h{i}") for i in range(k)]
        sig = sh.groupBy("id").agg(*aggs)
    return sig.select("id", F.array(*[F.col(f"h{i}") for i in range(k)]).alias("sig"))


def lsh_candidate_pairs(
    sig: DataFrame, bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """Band the signature, bucket-join, emit distinct candidate id pairs."""
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.col("sig")[b * rows_per_band + r]
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    k: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    dedup_shingles: bool = False,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact Jaccard verify ≥ t."""
    sig = minhash_signature(
        df, id_col, text_col, k=k, shingle_k=shingle_k,
        dedup_shingles=dedup_shingles,
    )
    cands = lsh_candidate_pairs(sig, bands=bands, rows_per_band=k // bands)
    docs = df.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), shingle_k).alias("sh")
    )
    return (
        cands.join(docs.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(docs.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn("jaccard", jaccard_arrays(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text_col: Column) -> Column:
    """64-bit SimHash from word md5s, pure built-ins: per word take 64 bits
    of md5; sum ±1 per bit position; sign → fingerprint bits."""
    words = F.array_distinct(F.split(F.lower(F.trim(text_col)), r"\s+"))
    # per word: long from first 15 hex chars (60 bits, sign-safe)
    hashes = F.transform(words, lambda w: F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("bigint"))
    shr = lambda h, i: F.call_function("shiftright", h, i.cast("int"))
    shl = lambda h, i: F.call_function("shiftleft", h, i.cast("int"))
    bit_sums = F.transform(
        F.sequence(F.lit(0), F.lit(59)),
        lambda i: F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(shr(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        ),
    )
    return F.aggregate(
        F.zip_with(
            bit_sums,
            F.sequence(F.lit(0), F.lit(59)),
            lambda s, i: F.when(s > 0, shl(F.lit(1).cast("bigint"), i)).otherwise(
                F.lit(0).cast("bigint")
            ),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc.bitwiseOR(v),
    )


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_neardup_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 8,
    prefix_bits: int = 12,
) -> DataFrame:
    """Near-dup pairs: block on the top prefix bits, verify hamming ≤ t.
    (One-table LSH on the fingerprint prefix; multi-permutation blocking is
    the standard extension.)"""
    fp = df.select(F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("fp"))
    blocked = fp.withColumn("blk", F.shiftright(F.col("fp"), 60 - prefix_bits))
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(b, "blk")
        .filter(F.col("a.id") < F.col("b.id"))
        .withColumn("hamming", hamming64(F.col("a.fp"), F.col("b.fp")))
        .filter(F.col("hamming") <= max_hamming)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "hamming")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard within blocking keys / embedding cosine
# ---------------------------------------------------------------------------

def jaccard_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    threshold: float = 0.5,
    shingle_k: int = 3,
) -> DataFrame:
    """All-pairs word-shingle Jaccard within a blocking key."""
    docs = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id"),
        shingles(F.col(text_col), shingle_k).alias("sh"),
    )
    a, b = docs.alias("a"), docs.alias("b")
    return (
        a.join(b, "blk")
        .filter(F.col("a.id") < F.col("b.id"))
        .withColumn("jaccard", jaccard_arrays(F.col("a.sh"), F.col("b.sh")))
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "jaccard")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float = 0.95,
) -> DataFrame:
    """Cosine near-dup pairs within a blocking key (label / IVF list)."""
    docs = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
    )
    a, b = docs.alias("a"), docs.alias("b")
    return (
        a.join(b, "blk")
        .filter(F.col("a.id") < F.col("b.id"))
        .withColumn("cosine", cosine_rounded(F.col("a.v"), F.col("b.v")))
        .filter(F.col("cosine") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cosine")
    )
