"""Sequence-packing operator: conservation invariants (every token in
exactly one span), boundary behavior, and the plan shape (one metadata-only
exchange) that makes packing viable at 10^12 documents."""

import pytest
from pyspark.sql import functions as F

from pdf_parser_benchmark_spark.operators.seqpack import (
    pack_sequences,
    pack_sequences_greedy,
)

L = 16


@pytest.fixture()
def docs(spark):
    # token counts chosen to exercise: empty doc (excluded), exact-fit,
    # boundary split (concat), multi-piece long doc (> L), tiny tail
    rows = [
        (0, 10), (1, 7), (2, 0), (3, 16), (4, 40), (5, 1),
        (6, 15), (7, 16), (8, 5), (9, 33), (10, 2), (11, 16),
    ]
    return spark.createDataFrame(rows, "doc_id long, n long")


def test_concat_chunk_conservation_and_contiguity(docs):
    out = pack_sequences(docs, "doc_id", "n", seq_len=L, n_buckets=2)
    rows = out.collect()
    # every token of every non-empty doc lands in exactly one span
    per_doc = {
        r["doc_id"]: r["s"]
        for r in out.groupBy("doc_id").agg(F.sum("span_tokens").alias("s")).collect()
    }
    expect = {d: n for d, n in [(r["doc_id"], r["n"]) for r in docs.collect()] if n > 0}
    assert per_doc == expect
    # every sequence except the last per bucket is exactly full, none overfull
    per_seq = (
        out.groupBy("bucket", "seq_idx").agg(F.sum("span_tokens").alias("s")).collect()
    )
    last = {}
    for r in per_seq:
        last[r["bucket"]] = max(last.get(r["bucket"], -1), r["seq_idx"])
    for r in per_seq:
        if r["seq_idx"] < last[r["bucket"]]:
            assert r["s"] == L, r
        else:
            assert 0 < r["s"] <= L, r
    # spans within a sequence are contiguous and non-overlapping
    by_seq = {}
    for r in rows:
        by_seq.setdefault((r["bucket"], r["seq_idx"]), []).append(r)
    for spans in by_seq.values():
        spans.sort(key=lambda r: r["start_in_seq"])
        pos = 0
        for s in spans:
            assert s["start_in_seq"] == pos
            pos += s["span_tokens"]
    # spans within a doc are contiguous from 0
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, spans in by_doc.items():
        spans.sort(key=lambda r: r["start_in_doc"])
        pos = 0
        for s in spans:
            assert s["start_in_doc"] == pos
            pos += s["span_tokens"]
        assert pos == expect[d]


def test_greedy_no_split_and_no_overflow(docs):
    out = pack_sequences_greedy(docs, "doc_id", "n", seq_len=L, n_buckets=2)
    rows = out.collect()
    # piece sizes: ≤ L, and per-doc piece sums reconstruct the doc
    assert all(0 < r["n_tokens"] <= L for r in rows)
    per_doc = {}
    for r in rows:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["n_tokens"]
    assert per_doc == {
        d: n for d, n in [(r["doc_id"], r["n"]) for r in docs.collect()] if n > 0
    }
    # sequences never overfull; placements contiguous in offset order
    by_seq = {}
    for r in rows:
        by_seq.setdefault((r["bucket"], r["seq_idx"]), []).append(r)
    for spans in by_seq.values():
        spans.sort(key=lambda r: r["offset_in_seq"])
        pos = 0
        for s in spans:
            assert s["offset_in_seq"] == pos
            pos += s["n_tokens"]
        assert pos <= L
    # a 40-token doc becomes pieces 16,16,8; each placed unsplit
    d4 = sorted(
        (r["piece"], r["n_tokens"]) for r in rows if r["doc_id"] == 4
    )
    assert d4 == [(0, 16), (1, 16), (2, 8)]


def test_packing_is_partitioning_invariant(docs):
    base = sorted(
        tuple(r)
        for r in pack_sequences(docs, "doc_id", "n", seq_len=L, n_buckets=2).collect()
    )
    repart = sorted(
        tuple(r)
        for r in pack_sequences(
            docs.repartition(7), "doc_id", "n", seq_len=L, n_buckets=2
        ).collect()
    )
    assert base == repart
    gbase = sorted(
        tuple(r)
        for r in pack_sequences_greedy(
            docs, "doc_id", "n", seq_len=L, n_buckets=2
        ).collect()
    )
    grepart = sorted(
        tuple(r)
        for r in pack_sequences_greedy(
            docs.repartition(5), "doc_id", "n", seq_len=L, n_buckets=2
        ).collect()
    )
    assert gbase == grepart


def test_concat_chunk_plan_single_metadata_exchange(spark, sf_dir):
    """The 100 TB shape: exactly one hash exchange (the bucket window), and
    the scan reads only (doc_id, text) — bodies never shuffle because the
    packed columns are doc_id + token count only."""
    from pdf_parser_benchmark_spark.queries import QUERIES

    df = QUERIES["sequence_pack"](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    import re

    # formatted mode names each node in the tree AND in the details section
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    start = plan.find("ReadSchema")
    read_schema = plan[start : plan.find("\n", start)]
    assert "doc_id" in read_schema and "text" in read_schema
    assert "lang" not in read_schema and "source" not in read_schema
