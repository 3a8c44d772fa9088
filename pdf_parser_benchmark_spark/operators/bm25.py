"""BM25 ranked retrieval (Robertson & Zaragoza 2009) over an inverted-
index-shaped plan, with ALL-INTEGER scoring so Spark and the DuckDB
oracle agree bit-exactly.

Plan shape (the classic distributed inverted index):
  postings  (doc_id, term, tf)      — one map-side-combined shuffle
  doc stats (doc_id, dl)            — in-row
  term stats(term, df)              — one shuffle of (term) keys
  query ⋈ postings on term          — the selective join (query terms
                                      only; at 10^12 docs this is the
                                      only stage that touches the index)
  per-(query,doc) sum → top-k       — window partitioned by query id

Integer arithmetic:
- idf: BM25's ln((N−df+0.5)/(df+0.5)+1) needs a transcendental; instead
  the ratio v = ((N+2)·2^20) div (df+1) — the integer shift of
  (N−df+0.5)/(df+0.5)+1 = (N+1)/(df+0.5), Lucene's always-positive
  "+1 inside the log" variant — is scored by a quantized
  log2 with 4 fractional bits: e = bitlength(v)−1 (length(bin(v))−1) and
  a linear-mantissa refinement frac = (v·16 div 2^e) − 16, giving
  idf_q4 = (e−20)·16 + frac — monotone in the true idf, 1/16-bit
  granularity, pure integer (same bin-length trick as the perplexity
  operator); v ≥ 2^20 always, so idf_q4 ≥ 0 (the greatest() is a guard).
- tf saturation with k1 = 1.2, b = 0.75 in milli-units:
  norm_milli  = 250 + (750·dl·1000) div avgdl_milli
  denom_milli = tf·1000 + (1200·norm_milli) div 1000
  tf_milli    = (tf·2200·1000) div denom_milli       (k1+1 = 2.2)
- score = Σ idf_q4 · tf_milli  (arbitrary integer units; ranking only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

K1_MILLI = 1200
B_MILLI = 750


def _postings(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("term"),
    )
    return toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))


def bm25_topk(docs: DataFrame, queries: DataFrame, id_col: str,
              text_col: str, k: int = 5) -> DataFrame:
    """Top-k docs per query by integer-quantized BM25.

    `queries`: DataFrame(qid, term) — one row per query term (already
    tokenized/lowered). Returns (qid, doc_id, score, rank)."""
    post = _postings(docs, id_col, text_col)
    dl = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
        .cast("long").alias("dl"),
    )
    totals = dl.agg(
        F.count("*").alias("n_docs"),
        F.expr("(sum(dl) * 1000) DIV count(*)").alias("avgdl_milli"),
    )
    dfreq = post.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    # idf_q4: quantized log2 of the odds ratio, 4 fractional bits
    idf = (
        dfreq.crossJoin(F.broadcast(totals))
        .withColumn(
            "v",
            F.expr("((n_docs + 2) * 1048576) DIV (df + 1)"),
        )
        .withColumn("e", (F.length(F.bin(F.col("v"))) - 1).cast("long"))
        .withColumn(
            "idf_q4",
            F.greatest(
                F.expr("(e - 20) * 16 + ((v * 16) DIV (CAST(1 AS BIGINT)"
                       " << CAST(e AS INT))) - 16"),
                F.lit(0).cast("long"),
            ),
        )
        .select("term", "idf_q4")
    )
    scored_terms = (
        queries.join(post, "term")
        .join(idf, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "norm_milli",
            F.expr(f"250 + ({B_MILLI} * dl * 1000) DIV avgdl_milli"),
        )
        .withColumn(
            "denom_milli",
            F.expr(f"tf * 1000 + ({K1_MILLI} * norm_milli) DIV 1000"),
        )
        .withColumn(
            "part",
            F.expr(f"idf_q4 * ((tf * {K1_MILLI + 1000} * 1000)"
                   f" DIV denom_milli)"),
        )
    )
    scores = scored_terms.groupBy("qid", "doc_id").agg(
        F.sum("part").alias("score")
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "doc_id", "score", "rank")
    )
