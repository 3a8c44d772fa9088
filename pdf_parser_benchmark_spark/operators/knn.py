"""J4/W2 — k-NN retrieval over an embedding column, plus the scale path.

- brute-force: queries ⋈ corpus crossJoin (queries broadcast — the small
  side by construction) + JVM-side cosine + window top-k. Exact; right
  answer at any scale where |queries|×|corpus| tasks fit — the reference's
  own ANN config falls back to full scan below 10k vectors
  (/root/reference/docs/INFRASTRUCTURE.md:227-244).
- IVF: coarse quantizer = centroid per partition key (here: per `label`,
  the testdata's natural cluster id; in production k-means iterations of
  the same groupBy-average shape). Probe = nearest `nprobe` centroids, then
  exact search within the probed inverted lists only — turns the crossJoin
  into a pruned join on list id.

Top-k ties break on vec_id ascending for determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.similarity import cosine_rounded


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "qid",
    query_vec: str = "qvec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    pairs = corpus.crossJoin(F.broadcast(queries))
    scored = pairs.withColumn(
        "score", cosine_rounded(F.col(query_vec), F.col(corpus_vec))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(corpus_id))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id, corpus_id, "score", F.col("rn").alias("rank"))
    )


def centroids_by(
    corpus: DataFrame, list_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Inverted-list centroids: element-wise mean via posexplode+groupBy —
    all built-ins, partial-aggregated."""
    exploded = corpus.select(
        F.col(list_col), F.posexplode(F.col(vec_col)).alias("dim", "v")
    )
    return (
        exploded.groupBy(list_col, "dim")
        .agg(F.avg("v").alias("mv"))
        .groupBy(list_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "mv"))),
                lambda s: s["mv"].cast("float"),
            ).alias("centroid")
        )
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    nprobe: int = 1,
    query_id: str = "qid",
    query_vec: str = "qvec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    list_col: str = "label",
) -> DataFrame:
    cents = centroids_by(corpus, list_col, corpus_vec)
    q2c = queries.crossJoin(F.broadcast(cents)).withColumn(
        "cscore", cosine_rounded(F.col(query_vec), F.col("centroid"))
    )
    wq = Window.partitionBy(query_id).orderBy(F.desc("cscore"), F.asc(list_col))
    probed = (
        q2c.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select(query_id, query_vec, list_col)
    )
    # pruned equi-join on list id replaces the full crossJoin
    pairs = corpus.join(F.broadcast(probed), list_col)
    scored = pairs.withColumn(
        "score", cosine_rounded(F.col(query_vec), F.col(corpus_vec))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(corpus_id))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id, corpus_id, "score", F.col("rn").alias("rank"))
    )
