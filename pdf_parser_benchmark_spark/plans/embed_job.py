"""Index-build job — the Spark restatement of the reference's embed path
(§3.2, /root/reference/src/embed.py:79-130):

    read extracted table → anti-join already-embedded urls (incremental
    resume, embed.py:106-115) → deterministic feature-hash embeddings
    (F3 replacement, Arrow-batched) → append embeddings + mark complete.

The reference's Qdrant upsert becomes an append of (url, embedding) rows;
its scroll-scan of existing SKUs becomes a distinct-key read of what's
already written (or of the embed manifest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.embed import hash_embedding

EMBEDDED_SCHEMA_COLS = ("url", "split_id", "embedding")


def embedded_urls(spark: SparkSession, out_dir: str) -> DataFrame:
    """Distinct already-embedded urls (reference: get_existing_skus,
    embed.py:46-76). Empty DF when the sink doesn't exist yet."""
    import os

    if not os.path.isdir(out_dir) or not any(
        f.endswith(".parquet") for _, _, fs in os.walk(out_dir) for f in fs
    ):
        return spark.createDataFrame([], "url string")
    return spark.read.parquet(out_dir).select("url").distinct()


def run_embed(
    spark: SparkSession,
    extracted_dir: str,
    out_dir: str,
    force: bool = False,
) -> dict:
    """Incremental embed: only not-yet-embedded urls are processed.
    `force` mirrors the reference's --force (embed.py:84-88): reprocess all.
    """
    extracted = spark.read.parquet(extracted_dir).filter(
        F.col("error").isNull() & F.col("text").isNotNull()
    )
    todo = extracted.select("url", "split_id", "text")
    if not force:
        done = embedded_urls(spark, out_dir)
        todo = todo.join(F.broadcast(done), "url", "left_anti")

    out = todo.select(
        "url", "split_id", hash_embedding(F.col("text")).alias("embedding")
    )
    mode = "overwrite" if force else "append"
    out.write.mode(mode).parquet(out_dir)
    n = spark.read.parquet(out_dir).count()
    return {"embedded_total": n}
