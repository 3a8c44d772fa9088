"""Structured Streaming: extraction stream matches batch bytes, watermark
windowed agg, applyInPandasWithState sessionization vs the batch window
query."""

import pytest
from pyspark.sql import functions as F

from pdf_parser_benchmark_spark.streaming.ingest_stream import (
    sessionize_stateful,
    stream_extract,
    windowed_counts,
)
from pdf_parser_benchmark_spark.synth.pages import generate_pages_df


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@pytest.fixture(params=["hdfs", "rocksdb"])
def state_provider(spark, request):
    """Run stateful streaming tests under BOTH state-store backends: the
    HDFS-backed default and RocksDB (the provider a real cluster would use
    for large state — rocksdbjni ships with Spark). The provider class is
    read from the session conf at query start, so setting it here pins the
    backend for queries started inside the test."""
    if request.param == "rocksdb":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
        )
    try:
        yield request.param
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages_in"))
    generate_pages_df(spark, 60, partitions=3).write.mode("overwrite").parquet(d)
    return d


def test_stream_extract_matches_batch(spark, pages_dir, tmp_path):
    from pdf_parser_benchmark_spark.plans.pipeline import extract_pages

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_extract(spark, pages_dir, out_dir, ckpt, n_splits=8)
    q.awaitTermination(120)

    streamed = {
        r["url"]: r["canonical"]
        for r in spark.read.parquet(out_dir).select("url", "canonical").collect()
    }
    batch = {
        r["url"]: r["canonical"]
        for r in extract_pages(spark.read.parquet(pages_dir), n_splits=8)
        .select("url", "canonical")
        .collect()
    }
    assert streamed == batch


def test_stream_resume_processes_only_new_files(spark, pages_dir, tmp_path):
    """Streaming twin of the batch checkpoint-resume property: with the same
    checkpointLocation, a second availableNow run picks up ONLY files added
    since the first run (Spark's offset log = the manifest analog)."""
    from pdf_parser_benchmark_spark.synth.pages import generate_pages_df

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    generate_pages_df(spark, 30, partitions=2).write.mode("overwrite").parquet(in_dir)
    q = stream_extract(spark, in_dir, out_dir, ckpt, n_splits=8)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == 30

    # append 20 more rows as new files; resume from the same checkpoint
    generate_pages_df(spark, 50, partitions=2).filter("url > ''").exceptAll(
        spark.read.parquet(in_dir)
    ).write.mode("append").parquet(in_dir)
    q2 = stream_extract(spark, in_dir, out_dir, ckpt, n_splits=8)
    q2.awaitTermination(120)
    out = spark.read.parquet(out_dir)
    assert out.count() == 50
    assert out.select("url").distinct().count() == 50


def test_windowed_counts_with_watermark(spark, sf_dir, tmp_path):
    # stream the events table through a file source
    ev_dir = str(tmp_path / "ev")
    spark.read.parquet(f"{sf_dir}/events.parquet").write.parquet(ev_dir)
    stream = spark.readStream.schema(
        spark.read.parquet(ev_dir).schema
    ).parquet(ev_dir)
    agg = windowed_counts(stream)
    q = (
        agg.writeStream.trigger(availableNow=True)
        .format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.sql("select * from win_counts").collect()
    }
    # batch oracle (same expression, no watermark cutoff matters: availableNow
    # processes everything, append emits windows older than the watermark)
    batch = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.read.parquet(ev_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
        .collect()
    }
    assert got  # emitted at least the closed windows
    for k, v in got.items():
        assert batch[k] == v


def test_stateful_sessionize_matches_batch_query(spark, sf_dir, tmp_path, state_provider):
    from pdf_parser_benchmark_spark.queries import QUERIES

    ev_dir = str(tmp_path / "ev2")
    spark.read.parquet(f"{sf_dir}/events.parquet").write.parquet(ev_dir)
    stream = spark.readStream.schema(
        spark.read.parquet(ev_dir).schema
    ).parquet(ev_dir)
    q = (
        sessionize_stateful(stream)
        .writeStream.trigger(availableNow=True)
        .format("memory")
        .queryName(f"sess_{state_provider}")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r["event_id"]: r["session_id"]
        for r in spark.sql(f"select * from sess_{state_provider}").collect()
    }
    batch = {
        r["event_id"]: r["session_id"]
        for r in QUERIES["sessionize"](spark, sf_dir).collect()
    }
    assert streamed == batch


def test_stream_static_join(spark, sf_dir, tmp_path):
    from pdf_parser_benchmark_spark.streaming.ingest_stream import enrich_with_dim

    ev_dir = str(tmp_path / "ev3")
    spark.read.parquet(f"{sf_dir}/events.parquet").write.parquet(ev_dir)
    stream = spark.readStream.schema(
        spark.read.parquet(ev_dir).schema
    ).parquet(ev_dir)
    dim = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id").distinct()
        .withColumn("segment", (F.col("user_id") % 3).cast("int"))
    )
    q = (
        enrich_with_dim(stream, dim)
        .writeStream.trigger(availableNow=True)
        .format("memory").queryName("enriched").outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from enriched")
    assert got.count() == spark.read.parquet(ev_dir).count()
    assert got.filter(F.col("segment").isNull()).count() == 0
    one = got.limit(5).collect()
    assert all(r["segment"] == r["user_id"] % 3 for r in one)


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, tmp_path, state_provider):
    """True stream-stream join (watermarks both sides, bounded interval):
    availableNow over the full events table must equal the batch join."""
    from pdf_parser_benchmark_spark.streaming.ingest_stream import (
        impression_click_join,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    imp_dir, clk_dir = str(tmp_path / "imp"), str(tmp_path / "clk")
    ev.filter(F.col("event_type") == "view").write.parquet(imp_dir)
    ev.filter(F.col("event_type") == "click").write.parquet(clk_dir)
    schema = ev.schema
    imp_s = spark.readStream.schema(schema).parquet(imp_dir)
    clk_s = spark.readStream.schema(schema).parquet(clk_dir)
    q = (
        impression_click_join(imp_s, clk_s)
        .writeStream.trigger(availableNow=True)
        .format("memory")
        .queryName(f"ssjoin_{state_provider}")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_ss"))
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        (r["imp_id"], r["clk_id"])
        for r in spark.sql(f"select * from ssjoin_{state_provider}").collect()
    }
    batch = {
        (r["imp_id"], r["clk_id"])
        for r in impression_click_join(
            spark.read.parquet(imp_dir), spark.read.parquet(clk_dir)
        ).collect()
    }
    assert batch, "fixture must produce attributed clicks"
    assert streamed == batch


def test_stream_dedup_within_watermark(spark, sf_dir, tmp_path, state_provider):
    """At-least-once input (every event written twice) streams through
    dropDuplicatesWithinWatermark → exactly-once output."""
    from pdf_parser_benchmark_spark.streaming.ingest_stream import dedup_stream

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(500)
    dup_dir = str(tmp_path / "dup")
    ev.unionAll(ev).write.parquet(dup_dir)  # duplicated source
    stream = spark.readStream.schema(ev.schema).parquet(dup_dir)
    q = (
        dedup_stream(stream)
        .writeStream.trigger(availableNow=True)
        .format("memory")
        .queryName(f"dedup_{state_provider}")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_dd"))
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql(f"select event_id from dedup_{state_provider}").collect()
    ids = [r["event_id"] for r in got]
    assert len(ids) == len(set(ids)) == ev.count()


def test_stream_ingest_crash_resume_exactly_once(
    spark, pages_dir, tmp_path, state_provider, monkeypatch
):
    """VERDICT r3 item 8, the streaming twin of test_crash_resume: the
    stream dies mid-batch AFTER the output parquet write but BEFORE the
    manifest append (the worst partial-commit point); a restart from the
    same checkpoint replays the batch, write_extracted's dynamic overwrite
    by split makes the replay idempotent, and the final output + manifest
    are exactly the single-run result — no dup rows, no orphan splits.
    Runs under both HDFS and RocksDB state-store providers."""
    from pdf_parser_benchmark_spark.plans.pipeline import extract_pages
    from pdf_parser_benchmark_spark.sources import checkpoint as ckpt_mod
    from pdf_parser_benchmark_spark.sources.checkpoint import read_completed_splits
    from pdf_parser_benchmark_spark.streaming.ingest_stream import (
        stream_ingest_with_manifest,
    )

    out = str(tmp_path / f"out_cr_{state_provider}")
    man = str(tmp_path / f"man_cr_{state_provider}")
    ck = str(tmp_path / f"ck_cr_{state_provider}")

    real_mark = ckpt_mod.mark_splits_complete
    crashed = {"done": False}

    def crashing_mark(*args, **kwargs):
        if not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash after output write")
        return real_mark(*args, **kwargs)

    monkeypatch.setattr(ckpt_mod, "mark_splits_complete", crashing_mark)

    q = stream_ingest_with_manifest(spark, pages_dir, out, man, ck, n_splits=16)
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination(180)
        q.processAllAvailable()  # pragma: no cover — query fails first
    assert crashed["done"]
    # partial state on disk: output rows exist, manifest has no rows
    assert spark.read.parquet(out).count() > 0
    assert read_completed_splits(spark, man).count() == 0

    # restart from the SAME checkpoint — batch replays, overwrite dedups
    q2 = stream_ingest_with_manifest(spark, pages_dir, out, man, ck, n_splits=16)
    q2.awaitTermination(180)

    batch = spark.read.parquet(pages_dir)
    expect = {
        (r["url"], r["text"])
        for r in extract_pages(batch, n_splits=16).select("url", "text").collect()
    }
    got_rows = spark.read.parquet(out)
    got = [(r["url"], r["text"]) for r in got_rows.select("url", "text").collect()]
    assert len(got) == len(expect)  # exactly once, not at-least-once
    assert set(got) == expect
    done = {r["split_id"] for r in read_completed_splits(spark, man).collect()}
    written = {r["split_id"] for r in got_rows.select("split_id").distinct().collect()}
    assert done == written and done


def test_stream_ingest_multibatch_crash_preserves_committed_batches(
    spark, pages_dir, tmp_path, monkeypatch
):
    """Cross-batch-boundary resume: with one file per trigger the input is
    3 micro-batches; batch 0 commits fully, the crash hits batch 1 after
    its output write, and the restart must replay batch 1 (uncommitted in
    the offset log) WITHOUT re-running batch 0 — proven by counting sink
    invocations on the second run — and still land exactly-once."""
    from pdf_parser_benchmark_spark.plans.pipeline import extract_pages
    from pdf_parser_benchmark_spark.sources import checkpoint as ckpt_mod
    from pdf_parser_benchmark_spark.sources.checkpoint import read_completed_splits
    from pdf_parser_benchmark_spark.streaming.ingest_stream import (
        stream_ingest_with_manifest,
    )

    out = str(tmp_path / "out_mb")
    man = str(tmp_path / "man_mb")
    ck = str(tmp_path / "ck_mb")

    real_mark = ckpt_mod.mark_splits_complete
    calls: list[str] = []
    crashed = {"done": False}

    def crashing_mark(df, manifest_dir, job_id, n_splits):
        calls.append(job_id)
        if job_id == "stream-1" and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash in batch 1")
        return real_mark(df, manifest_dir, job_id, n_splits)

    monkeypatch.setattr(ckpt_mod, "mark_splits_complete", crashing_mark)

    q = stream_ingest_with_manifest(
        spark, pages_dir, out, man, ck, n_splits=16, max_files_per_trigger=1
    )
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination(180)
    assert calls == ["stream-0", "stream-1"]  # batch 0 committed, 1 died
    assert read_completed_splits(spark, man).count() > 0

    calls.clear()
    q2 = stream_ingest_with_manifest(
        spark, pages_dir, out, man, ck, n_splits=16, max_files_per_trigger=1
    )
    q2.awaitTermination(180)
    # resume replays ONLY the uncommitted batches, never batch 0
    assert "stream-0" not in calls and calls

    batch = spark.read.parquet(pages_dir)
    expect = {
        (r["url"], r["text"])
        for r in extract_pages(batch, n_splits=16).select("url", "text").collect()
    }
    got_rows = spark.read.parquet(out)
    got = [(r["url"], r["text"]) for r in got_rows.select("url", "text").collect()]
    assert len(got) == len(expect) and set(got) == expect
    done = {r["split_id"] for r in read_completed_splits(spark, man).collect()}
    written = {r["split_id"] for r in got_rows.select("split_id").distinct().collect()}
    assert done == written and done


def test_stream_ingest_writes_manifest_and_matches_batch(spark, pages_dir, tmp_path):
    """foreachBatch ingest: streaming output is content-identical to the
    batch extraction, and the checkpoint manifest carries `complete` rows
    for every split the stream wrote (same lineage the batch job reads)."""
    from pdf_parser_benchmark_spark.plans.pipeline import extract_pages
    from pdf_parser_benchmark_spark.sources.checkpoint import read_completed_splits
    from pdf_parser_benchmark_spark.streaming.ingest_stream import (
        stream_ingest_with_manifest,
    )

    out = str(tmp_path / "out_m")
    man = str(tmp_path / "man_m")
    q = stream_ingest_with_manifest(
        spark, pages_dir, out, man, str(tmp_path / "ck_m"), n_splits=16
    )
    q.awaitTermination(180)

    batch = spark.read.parquet(pages_dir)
    expect = {
        (r["url"], r["text"])
        for r in extract_pages(batch, n_splits=16).select("url", "text").collect()
    }
    got_rows = spark.read.parquet(out)
    got = {(r["url"], r["text"]) for r in got_rows.select("url", "text").collect()}
    assert got == expect

    done = {r["split_id"] for r in read_completed_splits(spark, man).collect()}
    written = {r["split_id"] for r in got_rows.select("split_id").distinct().collect()}
    assert done == written and done  # every written split is marked complete

    # ADVICE r4 interop fix: stream rows are recorded under the NEGATED
    # bucketing sentinel, so a batch resume filtering on the plain
    # n_splits=16 bucketing must see NONE of them (stream split ids are
    # batch-namespaced, not hash buckets — treating them as completed hash
    # buckets would silently skip urls the stream never saw), while a
    # stream-side audit on n_splits=-16 sees them all.
    assert read_completed_splits(spark, man, n_splits=16).count() == 0
    stream_rows = read_completed_splits(spark, man, n_splits=-16)
    assert {r["split_id"] for r in stream_rows.collect()} == written


def test_stream_curation_filters_match_batch(spark, sf_dir, tmp_path):
    """The stateless curation stages (C4 + Gopher predicates) run
    identically on a stream: same expressions, per-row, no state. The
    tier stage needs corpus-global LM counts and stays batch (or
    foreachBatch) by design."""
    from pdf_parser_benchmark_spark.functions.text import gopher_keep
    from pdf_parser_benchmark_spark.operators.curation import (
        c4_doc_signals,
        c4_lines,
    )

    docs_path = f"{sf_dir}/documents.parquet"
    batch = spark.read.parquet(docs_path)
    schema = batch.schema

    def verdicts(df):
        gk, _ = gopher_keep(F.col("text"), min_words=30, min_stop=1)
        s = c4_doc_signals(c4_lines(F.col("doc_id"), F.col("text")))
        return df.select(
            "doc_id", gk.alias("p_gopher"), s["keep"].alias("p_c4"),
            s["fail_reason"].alias("c4_reason"),
        )

    # the sf tables are single parquet FILES; the streaming file source
    # wants a directory, so stream the sf dir with a glob filter
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    q = (
        verdicts(stream)
        .writeStream.format("memory")
        .queryName("curation_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["p_gopher"], r["p_c4"], r["c4_reason"])
        for r in spark.sql("SELECT * FROM curation_stream").collect()
    }
    want = {
        r["doc_id"]: (r["p_gopher"], r["p_c4"], r["c4_reason"])
        for r in verdicts(batch).collect()
    }
    assert got == want and len(got) == batch.count()
