"""Sequence packing — pack tokenized documents into fixed-length training
sequences (the training-data pipeline step between cleaning/dedup and the
trainer's data loader; VERDICT r5 item 6). Two standard disciplines:

- :func:`pack_sequences` — concat-and-chunk (the GPT/Pile shape): within a
  bucket, documents are concatenated in doc_id order into one token stream
  that is cut into fixed seq_len windows; a document may span sequence
  boundaries. The assignment is CLOSED FORM from a windowed cumulative sum
  (first_seq = floor(start/L) … last_seq = floor((end-1)/L)), so the whole
  operator is built-ins: one hash exchange on bucket (the window), a
  sequence-range explode, pure column arithmetic. Exactly one shuffle, and
  it carries (doc_id, n_tokens) metadata — never document bodies.

- :func:`pack_sequences_greedy` — first-fit-in-order (no token is split
  across sequences except documents longer than seq_len, which are
  pre-chunked into ≤seq_len pieces): within a bucket, pieces are placed in
  (doc_id, piece) order; a piece that would overflow the open sequence
  starts a new one. The fill recursion is inherently sequential, so it runs
  as a per-bucket applyInPandas loop — over METADATA ONLY (bucket, doc_id,
  piece, n_tokens): the only shuffle is those few-byte rows; bodies are
  joined back on doc_id downstream if materialization is wanted.

Scale shape (10^12 documents): n_buckets is the parallelism knob — each
bucket is an independent token stream, so packing is embarrassingly
parallel across buckets; per bucket the work is linear in document COUNT
(not bytes). Bucket id is `doc_id % n_buckets` — deterministic and
SQL-expressible, so the DuckDB oracle reproduces the exact assignment
(a hash-based bucket would diverge between engines).

Conservation contract (pinned by tests and the oracle): every token of
every document lands in exactly one span — per-doc span sums equal the
doc's token count, spans within a sequence are contiguous and
non-overlapping, and every sequence except the last per bucket is
exactly full (concat-chunk) / never overfull (greedy).

Reference analog: the reference pipeline stops at chunked nodes
(/root/reference/src/ingest.py chunk step); packing is the engine-extension
step a trainer-facing pipeline needs, per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _with_bucket_and_tokens(
    docs: DataFrame, doc_id: str, ntok_col, n_buckets: int
) -> DataFrame:
    ntok = F.col(ntok_col) if isinstance(ntok_col, str) else ntok_col
    return docs.select(
        F.col(doc_id),
        (F.col(doc_id) % n_buckets).cast("int").alias("bucket"),
        ntok.cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)


def pack_sequences(
    docs: DataFrame,
    doc_id: str = "doc_id",
    ntok_col="n_tokens",
    seq_len: int = 512,
    n_buckets: int = 8,
) -> DataFrame:
    """Concat-and-chunk packing: returns one row per (document × sequence it
    overlaps): (bucket, seq_idx, doc_id, start_in_seq, start_in_doc,
    span_tokens). ntok_col may be a column name or a Column expression
    (e.g. the regex token count over text)."""
    toks = _with_bucket_and_tokens(docs, doc_id, ntok_col, n_buckets)
    w = (
        Window.partitionBy("bucket")
        .orderBy(doc_id)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pos = toks.withColumn("end", F.sum("n_tokens").over(w)).withColumn(
        "start", F.col("end") - F.col("n_tokens")
    )
    L = F.lit(seq_len)
    spans = pos.select(
        "bucket",
        doc_id,
        "start",
        "n_tokens",
        # integer `div`, not double `/`: token offsets in a 10^12-token
        # bucket exceed double's exact-integer range
        F.explode(
            F.sequence(
                F.expr(f"start div {seq_len}"),
                F.expr(f"(end - 1) div {seq_len}"),
            )
        ).alias("seq_idx"),
    )
    s0 = F.col("seq_idx") * L
    return spans.select(
        "bucket",
        F.col("seq_idx").cast("long").alias("seq_idx"),
        doc_id,
        (F.greatest(F.col("start"), s0) - s0).alias("start_in_seq"),
        F.greatest(F.lit(0), s0 - F.col("start")).alias("start_in_doc"),
        (
            F.least(F.col("start") + F.col("n_tokens"), s0 + L)
            - F.greatest(F.col("start"), s0)
        ).alias("span_tokens"),
    )


def pack_sequences_greedy(
    docs: DataFrame,
    doc_id: str = "doc_id",
    ntok_col="n_tokens",
    seq_len: int = 512,
    n_buckets: int = 8,
) -> DataFrame:
    """First-fit-in-order packing (no cross-sequence token spill): documents
    longer than seq_len are pre-chunked into ≤seq_len pieces; pieces are
    placed in (doc_id, piece) order, opening a new sequence whenever the
    next piece would overflow the current one. Returns (bucket, doc_id,
    piece, seq_idx, offset_in_seq, n_tokens) — one row per placed piece."""
    toks = _with_bucket_and_tokens(docs, doc_id, ntok_col, n_buckets)
    L = F.lit(seq_len)
    pieces = toks.select(
        "bucket",
        doc_id,
        "n_tokens",
        F.explode(
            F.sequence(F.lit(0).cast("long"),
                       F.expr(f"(n_tokens - 1) div {seq_len}"))
        ).alias("piece"),
    ).select(
        "bucket",
        doc_id,
        "piece",
        F.least(L.cast("long"), F.col("n_tokens") - F.col("piece") * L).alias(
            "pn"
        ),
    )

    def pack_bucket(pdf):
        import pandas as pd

        pdf = pdf.sort_values([doc_id, "piece"], kind="stable")
        seq_idx, fill = 0, 0
        seqs, offs = [], []
        for pn in pdf["pn"]:
            if fill + pn > seq_len:
                seq_idx += 1
                fill = 0
            seqs.append(seq_idx)
            offs.append(fill)
            fill += pn
        return pd.DataFrame(
            {
                "bucket": pdf["bucket"],
                doc_id: pdf[doc_id],
                "piece": pdf["piece"],
                "seq_idx": seqs,
                "offset_in_seq": offs,
                "n_tokens": pdf["pn"],
            }
        )

    id_type = docs.schema[doc_id].dataType.simpleString()
    return pieces.groupBy("bucket").applyInPandas(
        pack_bucket,
        f"bucket int, {doc_id} {id_type}, piece long, seq_idx long, "
        "offset_in_seq long, n_tokens long",
    )
