"""Distributed pipeline properties: partitioning invariance, crash-resume
byte identity, lineage counters, golden parity of the Spark path vs the
pure-Python extractor (same bytes through mapInPandas)."""

import shutil

import pytest
from pyspark.sql import functions as F

from pdf_parser_benchmark_spark.plans.pipeline import extract_pages, run_pipeline
from pdf_parser_benchmark_spark.sources.lineage import lineage_counters
from pdf_parser_benchmark_spark.synth.pages import generate_pages_df

N_ROWS = 120


@pytest.fixture(scope="module")
def pages(spark):
    return generate_pages_df(spark, N_ROWS, partitions=4)


def _canon_map(df):
    return {
        r["url"]: r["canonical"]
        for r in df.select("url", "canonical").collect()
    }


def test_extract_counts_and_no_errors(spark, pages):
    out = extract_pages(pages, n_splits=8, n_tasks=8).cache()
    assert out.count() == N_ROWS
    assert out.filter(F.col("error").isNotNull()).count() == 0
    parsers = {r["parser"] for r in out.select("parser").distinct().collect()}
    assert parsers == {"html", "pdf"}
    out.unpersist()


def test_partitioning_invariance(spark, pages):
    """Same input at different parallelism ⇒ identical bytes per url."""
    a = _canon_map(extract_pages(pages, n_splits=8, n_tasks=2))
    b = _canon_map(extract_pages(pages.repartition(13), n_splits=8, n_tasks=8))
    assert a == b


def test_spark_path_matches_pure_python(spark, pages):
    """mapInPandas output == driver-side extract_document_json bytes."""
    from pdf_parser_benchmark_spark.extract.assemble import extract_document_json
    from pdf_parser_benchmark_spark.synth.pages import gen_row

    got = _canon_map(extract_pages(pages, n_splits=8))
    for rid in (0, 3, 5, 42):
        row = gen_row(rid)
        assert got[row["url"]] == extract_document_json(row["url"], row["html"])


def test_crash_resume_byte_identity(spark, pages, tmp_path):
    out_a, mani_a = str(tmp_path / "outA"), str(tmp_path / "maniA")
    out_b, mani_b = str(tmp_path / "outB"), str(tmp_path / "maniB")

    run_pipeline(spark, pages, out_a, mani_a, n_splits=8, commit_batches=4)
    fa = _canon_map(spark.read.parquet(out_a))

    r1 = run_pipeline(
        spark, pages, out_b, mani_b, n_splits=8, commit_batches=4,
        fail_after_batches=2,
    )
    assert 0 < r1["splits_done"] < 8
    r2 = run_pipeline(spark, pages, out_b, mani_b, n_splits=8, commit_batches=4)
    assert r1["splits_done"] + r2["splits_done"] == 8
    fb = _canon_map(spark.read.parquet(out_b))
    assert fa == fb

    r3 = run_pipeline(spark, pages, out_b, mani_b, n_splits=8)
    assert r3["splits_done"] == 0  # idempotent noop


def test_lineage_counters(spark, pages):
    out = extract_pages(pages, n_splits=8)
    lin = lineage_counters(out).collect()
    assert sum(r["docs_out"] for r in lin) == N_ROWS
    assert sum(r["docs_err"] for r in lin) == 0
    assert all(r["bytes_in"] > 0 for r in lin)
    assert sum(r["html_docs"] + r["pdf_docs"] for r in lin) == N_ROWS


def test_poison_document_isolated(spark):
    """A malformed payload must produce an error row, not kill the task
    (reference precedent: per-book continue-on-error, ingest.py:162-165)."""
    import pandas as pd

    rows = [
        {"url": "https://h.example/ok.html", "warc_ts": pd.Timestamp("2026-01-01"),
         "html": b"<main><p>fine</p></main>", "text": None, "lang": "en"},
        {"url": "https://h.example/bad.pdf", "warc_ts": pd.Timestamp("2026-01-01"),
         "html": b"%PDF-1.4 garbage without structure", "text": None, "lang": "en"},
    ]
    pages = spark.createDataFrame(
        pd.DataFrame(rows),
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = extract_pages(pages, n_splits=2).collect()
    by_url = {r["url"]: r for r in out}
    assert by_url["https://h.example/ok.html"]["error"] is None
    bad = by_url["https://h.example/bad.pdf"]
    # bad pdf either errors or yields an empty parse — never crashes the job
    assert bad["error"] is not None or bad["chunk_count"] == 0


def test_manifest_compaction(spark, pages, tmp_path):
    from pdf_parser_benchmark_spark.sources.checkpoint import (
        compact_manifest,
        read_completed_splits,
    )

    out, mani = str(tmp_path / "outC"), str(tmp_path / "maniC")
    run_pipeline(spark, pages, out, mani, n_splits=8, commit_batches=4)
    # force duplicate manifest rows: full re-run with resume disabled
    run_pipeline(spark, pages, out, mani, n_splits=8, commit_batches=4,
                 resume=False)
    raw_rows = spark.read.parquet(mani).count()
    assert raw_rows > 8
    n = compact_manifest(spark, mani)
    assert n == 8
    done = read_completed_splits(spark, mani)
    assert done.count() == 8
    # resume still recognizes everything as complete
    r = run_pipeline(spark, pages, out, mani, n_splits=8)
    assert r["splits_done"] == 0


def test_output_compaction(spark, pages, tmp_path):
    from pdf_parser_benchmark_spark.sources.compact import (
        compact_output,
        output_file_stats,
    )

    out, mani = str(tmp_path / "outD"), str(tmp_path / "maniD")
    run_pipeline(spark, pages, out, mani, n_splits=4, commit_batches=4,
                 n_tasks=8)
    # r5: write_extracted now colocates splits (no small-files blowup), so
    # fragmentation must be synthesized: split every split's single file
    # into per-row appends, the state a foreign writer (or many tiny
    # incremental batches) leaves behind
    rows = spark.read.parquet(out)
    out = str(tmp_path / "outD_frag")
    half_a = rows.filter(F.crc32(F.col("url")) % 2 == 0)
    half_b = rows.filter(F.crc32(F.col("url")) % 2 == 1)
    half_a.write.mode("append").partitionBy("split_id").parquet(out)
    half_b.write.mode("append").partitionBy("split_id").parquet(out)
    before = {r["split_id"]: r["n_files"]
              for r in output_file_stats(spark, out).collect()}
    assert any(n > 1 for n in before.values())
    content_before = _canon_map(spark.read.parquet(out))

    res = compact_output(spark, out, min_files=2)
    assert res["compacted_splits"] >= 1
    after = {r["split_id"]: r["n_files"]
             for r in output_file_stats(spark, out).collect()}
    assert all(n == 1 for n in after.values())
    assert _canon_map(spark.read.parquet(out)) == content_before


def test_map_in_arrow_matches_pandas_path(spark, pages):
    from pdf_parser_benchmark_spark.plans.pipeline import (
        extract_pages_arrow,
        extract_pages_slim,
    )

    a = {r["url"]: r["fp"]
         for r in extract_pages_slim(pages, n_splits=8).collect()}
    b = {r["url"]: r["fp"]
         for r in extract_pages_arrow(pages, n_splits=8).collect()}
    assert a == b and len(a) == N_ROWS


def test_iceberg_sink_per_partition_replace_contract(spark, monkeypatch):
    """Pin the Iceberg write mode without the runtime jar: an existing table
    must get overwritePartitions() (replace exactly the written splits),
    NEVER createOrReplace() (which would wipe previously committed batches
    while the manifest still marks them complete)."""
    from pyspark.sql import functions as F

    from pdf_parser_benchmark_spark.sources import sink

    calls = []

    class FakeWriter:
        def __init__(self, table):
            self.table = table

        def partitionedBy(self, *cols):
            return self

        def overwritePartitions(self):
            calls.append(("overwritePartitions", self.table))

        def create(self):
            calls.append(("create", self.table))

        def createOrReplace(self):  # the bug this test forbids
            calls.append(("createOrReplace", self.table))

    df = spark.range(3).withColumn("split_id", F.lit(0))
    monkeypatch.setattr(
        type(df), "writeTo", lambda self, t: FakeWriter(t), raising=True
    )

    monkeypatch.setattr(sink, "_table_exists", lambda s, t: True)
    sink.write_extracted(df, "cat.db.extracted")
    assert calls == [("overwritePartitions", "cat.db.extracted")]

    calls.clear()
    monkeypatch.setattr(sink, "_table_exists", lambda s, t: False)
    sink.write_extracted(df, "cat.db.extracted")
    assert calls == [("create", "cat.db.extracted")]


def test_resume_ignores_manifest_from_different_bucketing(spark, tmp_path):
    """Split 3 of 64 is not split 3 of 128: completed-split rows recorded
    under another n_splits must not suppress work in this run."""
    from pyspark.sql import functions as F

    from pdf_parser_benchmark_spark.sources import checkpoint as ckpt

    mdir = str(tmp_path / "manifest")
    fake = spark.createDataFrame([(3, 100)], "split_id int, rows_out long").select(
        "split_id", F.lit("complete").alias("status"), "rows_out"
    )
    ckpt.mark_splits_complete(
        fake.select("split_id", F.col("rows_out")), mdir, "runA", n_splits=64
    )
    assert ckpt.read_completed_splits(spark, mdir, n_splits=64).count() == 1
    assert ckpt.read_completed_splits(spark, mdir, n_splits=128).count() == 0
    assert ckpt.read_completed_splits(spark, mdir, n_splits=None).count() == 1


def test_compaction_latest_wins_and_crash_recovery(spark, tmp_path):
    """compact_manifest keeps the row with the highest commit_seq per split,
    and a crash that left the manifest renamed aside heals on next read."""
    import os

    from pdf_parser_benchmark_spark.sources import checkpoint as ckpt

    mdir = str(tmp_path / "manifest")
    one = spark.createDataFrame([(7,)], "split_id int")          # 1 row out
    two = spark.createDataFrame([(7,), (7,), (7,)], "split_id int")  # 3 rows out
    ckpt.mark_splits_complete(one, mdir, "older", n_splits=8)
    ckpt.mark_splits_complete(two, mdir, "newer", n_splits=8)
    n = ckpt.compact_manifest(spark, mdir)
    assert n == 1
    row = spark.read.parquet(mdir).collect()[0]
    assert row["run_id"] == "newer" and row["rows_out"] == 3

    # simulate a crash between the two swap renames: live dir gone, .old left
    os.rename(mdir, mdir + ".old")
    assert ckpt.read_completed_splits(spark, mdir, n_splits=8).count() == 1
    assert os.path.isdir(mdir) and not os.path.isdir(mdir + ".old")


def test_write_extracted_no_small_files_blowup(spark, tmp_path):
    """Small-files invariant (r5, found by the 10M pipeline smoke: 2048
    tasks × 256 splits = 524,288 part files): write_extracted colocates
    each split before the partitioned write, so the part-file count scales
    with the number of SPLITS, not tasks × splits."""
    import glob

    from pdf_parser_benchmark_spark.sources.sink import write_extracted

    n_splits, n_parts = 8, 16
    rows = [(i, f"u{i}", i % n_splits) for i in range(400)]
    df = spark.createDataFrame(
        rows, "doc int, url string, split_id int"
    ).repartition(n_parts)  # many upstream tasks, each touching every split
    out = str(tmp_path / "sink_files")
    write_extracted(df, out)
    parts = glob.glob(f"{out}/split_id=*/part-*")
    dirs = glob.glob(f"{out}/split_id=*")
    assert len(dirs) == n_splits
    # without colocation this would be up to n_parts*n_splits = 128 files
    assert len(parts) <= n_splits + 2, f"{len(parts)} part files"
    got = spark.read.parquet(out).count()
    assert got == 400
