"""Embed job (§3.2 lifecycle): incremental anti-join resume, determinism,
force-reprocess."""

import pytest
from pyspark.sql import functions as F

from pdf_parser_benchmark_spark.plans.embed_job import run_embed
from pdf_parser_benchmark_spark.plans.pipeline import extract_pages
from pdf_parser_benchmark_spark.synth.pages import generate_pages_df


@pytest.fixture(scope="module")
def extracted_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("extracted"))
    pages = generate_pages_df(spark, 60, partitions=2)
    extract_pages(pages, n_splits=8).write.mode("overwrite").parquet(d)
    return d


def test_embed_all_then_incremental_noop(spark, extracted_dir, tmp_path):
    out = str(tmp_path / "emb")
    r1 = run_embed(spark, extracted_dir, out)
    assert r1["embedded_total"] == 60
    # second run embeds nothing new (anti-join resume, embed.py:106-115)
    r2 = run_embed(spark, extracted_dir, out)
    assert r2["embedded_total"] == 60
    df = spark.read.parquet(out)
    assert df.count() == 60 and df.select("url").distinct().count() == 60


def test_embed_incremental_partial(spark, extracted_dir, tmp_path):
    out = str(tmp_path / "emb2")
    # seed with half the urls
    half = spark.read.parquet(extracted_dir).filter(F.col("split_id") < 4)
    from pdf_parser_benchmark_spark.functions.embed import hash_embedding

    half.select(
        "url", "split_id", hash_embedding(F.col("text")).alias("embedding")
    ).write.parquet(out)
    n_half = spark.read.parquet(out).count()
    r = run_embed(spark, extracted_dir, out)
    assert r["embedded_total"] == 60
    assert n_half < 60


def test_embeddings_deterministic_and_normalized(spark, extracted_dir, tmp_path):
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    run_embed(spark, extracted_dir, out_a)
    run_embed(spark, extracted_dir, out_b)
    a = {r["url"]: r["embedding"] for r in spark.read.parquet(out_a).collect()}
    b = {r["url"]: r["embedding"] for r in spark.read.parquet(out_b).collect()}
    assert a == b
    import math

    some = next(iter(a.values()))
    assert len(some) == 64
    norm = math.sqrt(sum(v * v for v in some))
    assert abs(norm - 1.0) < 1e-3
