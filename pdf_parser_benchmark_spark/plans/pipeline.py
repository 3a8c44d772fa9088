"""The flagship extraction pipeline, end to end:

    read pages table → assign split buckets → resume-filter vs checkpoint
    manifest → salt + repartition (skew control) → Arrow-vectorized
    extraction (mapInPandas) → write partitioned output → lineage counters
    → mark splits complete.

This is the Spark restatement of the reference's sequential per-book loop
(/root/reference/src/ingest.py:283-296) — the loop becomes per-partition
Arrow batches; the HTTP hops to LLMSherpa/GPT-4o become in-process
from-scratch extractors (extract/); the nodes.json sink becomes a
partitioned, resumable table write.

Scale design (north_rule):
- parallelism: explicit repartition to ``n_tasks`` on a salted key, sized so
  a task holds ~target_partition_mb of payload at the configured scale;
- skew: the repartition key is ``xxhash64(url)`` — uniform regardless of the
  zipf host distribution; for host-colocated variants use
  ``salted_host_key`` which splits hot hosts across S buckets
  (``concat(host, pmod(xxhash64(url), S))``); AQE skew-join stays on;
- the heavy stage is mapInPandas: no shuffle after the repartition until the
  (tiny, pre-aggregated) lineage shuffle.
"""

from __future__ import annotations

import uuid
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

from ..extract.assemble import extract_document
from ..canonical import encode_doc
from ..sources import checkpoint as ckpt
from ..sources.lineage import lineage_counters
from ..sources.sink import read_extracted, write_extracted

EXTRACTED_SCHEMA = (
    "url string, warc_ts timestamp, lang string, text string, "
    "spans array<struct<start:int,end:int,kind:string,page:int,"
    "chapter:string,section:string>>, "
    "chunk_count int, parser string, source string, "
    "canonical string, n_bytes_in bigint, error string, split_id int"
)


def _extract_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
    """Arrow batch → extracted rows. Per-document try/except keeps poison
    documents from killing the task (reference precedent: per-page and
    per-book continue-on-error, /root/reference/src/ingest.py:154-165)."""
    import pandas as pd

    cols = (
        "url", "warc_ts", "lang", "text", "spans", "chunk_count",
        "parser", "source", "canonical", "n_bytes_in", "error", "split_id",
    )
    for b in batches:
        out: dict[str, list] = {c: [] for c in cols}
        for url, ts, payload, lang, split_id in zip(
            b["url"], b["warc_ts"], b["html"], b["lang"], b["split_id"]
        ):
            text = spans = chunk_count = parser = source = canonical = error = None
            try:
                payload = bytes(payload) if payload is not None else b""
                rec = extract_document(url, payload)
                text, spans = rec["text"], rec["spans"]
                meta = rec["meta"]
                chunk_count, parser, source = (
                    meta["chunk_count"], meta["parser"], meta["source"],
                )
                canonical = encode_doc(rec["url"], text, spans, meta)
            except Exception as e:  # poison document
                error = f"{type(e).__name__}: {e}"[:500]
            out["url"].append(url)
            out["warc_ts"].append(ts)
            out["lang"].append(lang)
            out["text"].append(text)
            out["spans"].append(spans)
            out["chunk_count"].append(chunk_count)
            out["parser"].append(parser)
            out["source"].append(source)
            out["canonical"].append(canonical)
            out["n_bytes_in"].append(len(payload) if payload is not None else 0)
            out["error"].append(error)
            out["split_id"].append(int(split_id))
        yield pd.DataFrame(out)


SLIM_SCHEMA = (
    "url string, parser string, chunk_count int, n_bytes_in bigint, "
    "error string, split_id int, fp string"
)


def _extract_batches_slim(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
    """Benchmark/fingerprint variant: same extraction, but the canonical
    bytes are hashed (md5) worker-side and only slim columns cross the
    Arrow channel — separates extraction throughput from result-transfer
    volume in scaling measurements."""
    import hashlib

    import pandas as pd

    for b in batches:
        out: list[dict] = []
        for url, payload, split_id in zip(b["url"], b["html"], b["split_id"]):
            row: dict = {
                "url": url,
                "parser": None,
                "chunk_count": None,
                "n_bytes_in": len(payload) if payload is not None else 0,
                "error": None,
                "split_id": int(split_id),
                "fp": None,
            }
            try:
                payload = bytes(payload) if payload is not None else b""
                rec = extract_document(url, payload)
                canon = encode_doc(rec["url"], rec["text"], rec["spans"], rec["meta"])
                row.update(
                    parser=rec["meta"]["parser"],
                    chunk_count=rec["meta"]["chunk_count"],
                    fp=hashlib.md5(canon.encode("utf-8")).hexdigest(),
                )
            except Exception as e:
                row["error"] = f"{type(e).__name__}: {e}"[:500]
            out.append(row)
        yield pd.DataFrame(out)


def extract_pages_slim(pages: DataFrame, n_splits: int = 64) -> DataFrame:
    """Zero-shuffle slim extraction (url + md5-of-canonical only)."""
    df = ckpt.with_split_id(pages, n_splits)
    return df.mapInPandas(_extract_batches_slim, schema=SLIM_SCHEMA)


def _extract_batches_arrow(batches):  # Iterator[pa.RecordBatch]
    """mapInArrow twin of the slim extractor: RecordBatch in, RecordBatch
    out — skips the pandas layer entirely (lowest-overhead Python channel;
    same per-doc logic, verified byte-identical in tests)."""
    import hashlib

    import pyarrow as pa

    for b in batches:
        urls = b.column("url").to_pylist()
        payloads = b.column("html").to_pylist()
        splits = b.column("split_id").to_pylist()
        cols: dict[str, list] = {
            "url": [], "parser": [], "chunk_count": [], "n_bytes_in": [],
            "error": [], "split_id": [], "fp": [],
        }
        for url, payload, split_id in zip(urls, payloads, splits):
            parser = chunk_count = fp = error = None
            try:
                payload = bytes(payload) if payload is not None else b""
                rec = extract_document(url, payload)
                canon = encode_doc(rec["url"], rec["text"], rec["spans"], rec["meta"])
                parser = rec["meta"]["parser"]
                chunk_count = rec["meta"]["chunk_count"]
                fp = hashlib.md5(canon.encode("utf-8")).hexdigest()
            except Exception as e:
                error = f"{type(e).__name__}: {e}"[:500]
            cols["url"].append(url)
            cols["parser"].append(parser)
            cols["chunk_count"].append(chunk_count)
            cols["n_bytes_in"].append(len(payload) if payload is not None else 0)
            cols["error"].append(error)
            cols["split_id"].append(int(split_id))
            cols["fp"].append(fp)
        yield pa.RecordBatch.from_pydict(
            cols,
            schema=pa.schema(
                [
                    ("url", pa.string()), ("parser", pa.string()),
                    ("chunk_count", pa.int32()), ("n_bytes_in", pa.int64()),
                    ("error", pa.string()), ("split_id", pa.int32()),
                    ("fp", pa.string()),
                ]
            ),
        )


def extract_pages_arrow(pages: DataFrame, n_splits: int = 64) -> DataFrame:
    """mapInArrow variant of the slim extractor."""
    df = ckpt.with_split_id(pages, n_splits)
    return df.mapInArrow(_extract_batches_arrow, schema=SLIM_SCHEMA)


def salted_host_key(url_col: str = "url", salt_buckets: int = 16):
    """Host-colocated partition key with hot-host splitting:
    concat(host, pmod(xxhash64(url), S)). Salts EVERY host — co-location
    is lost for all of them; prefer auto_salted_host_key when only a few
    hosts are hot (the common web-corpus shape)."""
    host = F.parse_url(F.col(url_col), F.lit("HOST"))
    return F.concat_ws(
        "#", host, F.pmod(F.xxhash64(F.col(url_col)), F.lit(salt_buckets))
    )


def auto_salted_host_key(
    df: DataFrame,
    url_col: str = "url",
    share_threshold: float = 0.05,
    salt_buckets: int = 16,
):
    """MEASURED skew handling: one tiny (host, count) aggregation finds the
    hosts holding more than ``share_threshold`` of the rows; only those are
    salted across ``salt_buckets``, every cold host keeps its pure host key
    (co-location preserved). Scale shape: the per-host counts never leave
    the cluster — only the hot list does, and it is bounded above by
    1/share_threshold entries regardless of corpus size."""
    host = F.parse_url(F.col(url_col), F.lit("HOST"))
    counts = df.groupBy(host.alias("h")).count().persist()
    try:
        total = counts.agg(F.sum("count")).collect()[0][0] or 0
        hot = [
            r["h"]
            for r in counts.filter(
                F.col("count") >= share_threshold * total
            ).collect()
        ]
    finally:
        counts.unpersist()
    salted = F.concat_ws(
        "#", host, F.pmod(F.xxhash64(F.col(url_col)), F.lit(salt_buckets))
    )
    return F.when(host.isin(hot), salted).otherwise(host) if hot else host


def extract_pages(
    pages: DataFrame,
    n_splits: int = 64,
    n_tasks: int | None = None,
    partition_by_host: bool = False,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → extracted DF (no I/O).

    Extraction is embarrassingly parallel, so the DEFAULT (n_tasks=None) is
    zero-shuffle: task granularity comes from input splits
    (`spark.sql.files.maxPartitionBytes` — size it so a task holds a few MB
    of payload; small splits double as skew insurance since per-doc cost
    varies ~12× between HTML and PDF). Pass n_tasks to force a repartition
    — needed when the source is a few huge unsplittable files or when
    host-colocation with hot-host salting (`partition_by_host`) is wanted.
    """
    df = ckpt.with_split_id(pages, n_splits)
    if n_tasks is not None or partition_by_host:
        spark = pages.sparkSession
        n_tasks = n_tasks or spark.sparkContext.defaultParallelism
        key = salted_host_key() if partition_by_host else F.xxhash64("url")
        df = df.repartition(n_tasks, key)
    return df.mapInPandas(_extract_batches, schema=EXTRACTED_SCHEMA)


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    output_dir: str,
    manifest_dir: str,
    n_splits: int = 64,
    n_tasks: int | None = None,
    resume: bool = True,
    commit_batches: int = 4,
    fail_after_batches: int | None = None,
) -> dict:
    """Full resumable job. Returns summary counters (small driver dict).

    Splits are processed in ``commit_batches`` write+mark transactions: a
    crash loses at most one batch of splits; a resumed run anti-joins the
    manifest and redoes only unmarked splits. ``fail_after_batches`` is a
    test hook that simulates a mid-job crash between commits.
    """
    run_id = uuid.uuid4().hex[:12]
    df = ckpt.with_split_id(pages, n_splits)
    if resume:
        df = ckpt.filter_resumable(df, spark, manifest_dir, n_splits)

    remaining = sorted(
        r["split_id"] for r in df.select("split_id").distinct().collect()
    )
    if not remaining:
        return {"run_id": run_id, "docs": 0, "errors": 0, "bytes_in": 0,
                "html_docs": 0, "pdf_docs": 0, "splits_done": 0}

    batch_size = max(1, -(-len(remaining) // commit_batches))
    batches = [
        remaining[i : i + batch_size] for i in range(0, len(remaining), batch_size)
    ]
    done_splits: list[int] = []
    for bi, split_batch in enumerate(batches):
        if fail_after_batches is not None and bi >= fail_after_batches:
            break  # simulated crash: manifest only covers committed batches
        part = df.filter(F.col("split_id").isin(split_batch))
        if n_tasks is not None:  # else zero-shuffle: input-split granularity
            part = part.repartition(n_tasks, F.xxhash64("url"))
        extracted = part.mapInPandas(_extract_batches, schema=EXTRACTED_SCHEMA)
        # persist so the write and the manifest aggregates share ONE
        # extraction pass — re-reading the output directory per batch costs
        # a driver-side file listing that grows with files-per-batch (real
        # at 10^5 output files), and re-aggregating the un-persisted plan
        # would run the extraction twice
        extracted = extracted.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            write_extracted(extracted, output_dir)  # dynamic overwrite by split
            ckpt.mark_splits_complete(extracted, manifest_dir, run_id, n_splits)
        finally:
            extracted.unpersist()
        done_splits.extend(split_batch)

    written = read_extracted(spark, output_dir).filter(
        F.col("split_id").isin(done_splits)
    )
    lineage = lineage_counters(written)

    totals = lineage.agg(
        F.sum("docs_out").alias("docs"),
        F.sum("docs_err").alias("errors"),
        F.sum("bytes_in").alias("bytes_in"),
        F.sum("html_docs").alias("html_docs"),
        F.sum("pdf_docs").alias("pdf_docs"),
    ).collect()[0]
    return {
        "run_id": run_id,
        "docs": totals["docs"],
        "errors": totals["errors"],
        "bytes_in": totals["bytes_in"],
        "html_docs": totals["html_docs"],
        "pdf_docs": totals["pdf_docs"],
        "splits_done": len(done_splits),
    }
