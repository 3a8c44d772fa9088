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


def l2_sq(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def kmeans_fit(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iterations: int = 4,
) -> DataFrame:
    """Deterministic Lloyd's k-means as DataFrame iterations (the proper IVF
    coarse quantizer; `centroids_by` is the cheap label-based stand-in).

    Each iteration: broadcast the k centroids → assign each vector to the
    nearest (squared L2, ties to lowest cid) → recompute element-wise means
    (posexplode+groupBy, map-side partial) → round to 6 decimals (pins
    determinism against float summation order) → collect k×dim floats to
    the driver for the next broadcast. Init = the k lowest-id vectors.
    Fixed iteration count, no data-dependent stopping — reruns and
    different partitionings produce identical centroids.

    Returns the assignment DataFrame (id, cid) — centroids are in
    `kmeans_fit.last_centroids` after the call (list of (cid, [floats])).
    """
    spark = corpus.sparkSession
    init = [
        (i, [round(float(v), 6) for v in r[vec_col]])
        for i, r in enumerate(
            corpus.orderBy(id_col).limit(k).collect()
        )
    ]
    centroids = init

    def assign(cents):
        cdf = spark.createDataFrame(cents, "cid int, centroid array<float>")
        w = Window.partitionBy(id_col).orderBy(F.asc("d2"), F.asc("cid"))
        return (
            corpus.crossJoin(F.broadcast(cdf))
            .withColumn("d2", F.round(l2_sq(F.col(vec_col), F.col("centroid")), 9))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(id_col, "cid", vec_col)
        )

    for _ in range(iterations):
        assigned = assign(centroids)
        new = (
            assigned.select("cid", F.posexplode(F.col(vec_col)).alias("dim", "v"))
            .groupBy("cid", "dim")
            .agg(F.avg("v").alias("mv"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "mv"))),
                    lambda s: F.round(s["mv"], 6).cast("float"),
                ).alias("centroid")
            )
            .collect()
        )
        got = {r["cid"]: [float(v) for v in r["centroid"]] for r in new}
        # empty clusters keep their previous centroid
        centroids = [(cid, got.get(cid, vec)) for cid, vec in centroids]

    kmeans_fit.last_centroids = centroids
    return assign(centroids).select(id_col, "cid")


def ivf_topk_kmeans(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    n_lists: int = 4,
    iterations: int = 4,
    query_id: str = "qid",
    query_vec: str = "qvec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """IVF with a k-means coarse quantizer: fit lists, probe the nprobe
    nearest centroids per query, exact-search only the probed lists."""
    spark = corpus.sparkSession
    assignment = kmeans_fit(corpus, corpus_id, corpus_vec, k=n_lists,
                            iterations=iterations)
    cents = spark.createDataFrame(
        kmeans_fit.last_centroids, "cid int, centroid array<float>"
    )
    listed = corpus.join(assignment, corpus_id)
    q2c = queries.crossJoin(F.broadcast(cents)).withColumn(
        "d2", F.round(l2_sq(F.col(query_vec), F.col("centroid")), 9)
    )
    wq = Window.partitionBy(query_id).orderBy(F.asc("d2"), F.asc("cid"))
    probed = (
        q2c.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select(query_id, query_vec, "cid")
    )
    pairs = listed.join(F.broadcast(probed), "cid")
    scored = pairs.withColumn(
        "score", cosine_rounded(F.col(query_vec), F.col(corpus_vec))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(corpus_id))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id, corpus_id, "score", F.col("rn").alias("rank"))
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
