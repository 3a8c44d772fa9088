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


def pq_fit(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    dim: int = 64,
    k: int = 16,
    iterations: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Product quantization (Jégou et al. 2011, public literature): split
    each vector into m subspaces, k-means each subspace independently
    (deterministic Lloyd's — same quantizer as kmeans_fit), encode every
    vector as m code ids. Compresses dim floats → m bytes; probe bandwidth
    drops dim·4/m per vector (the IVF refinement named in ROADMAP).

    → (codebooks (s, cid, centroid array<float>), encoded (pqid, c0..c{m-1}))."""
    spark = corpus.sparkSession
    sub = dim // m
    enc: DataFrame | None = None
    cb_rows: list[tuple[int, int, list[float]]] = []
    for s in range(m):
        sdf = corpus.select(
            F.col(id_col).alias("pqid"),
            F.slice(F.col(vec_col), s * sub + 1, sub).alias("embedding"),
        )
        asg = kmeans_fit(sdf, "pqid", "embedding", k=k, iterations=iterations)
        asg = asg.select("pqid", F.col("cid").alias(f"c{s}"))
        for cid, vec in kmeans_fit.last_centroids:
            cb_rows.append((s, cid, vec))
        enc = asg if enc is None else enc.join(asg, "pqid")
    cb = spark.createDataFrame(cb_rows, "s int, cid int, centroid array<float>")
    return cb, enc


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    m: int = 4,
    dim: int = 64,
    codes: int = 16,
    iterations: int = 3,
    query_id: str = "qid",
    query_vec: str = "qvec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    rerank: int = 0,
    codebooks: DataFrame | None = None,
    encoded: DataFrame | None = None,
) -> DataFrame:
    """PQ top-k via asymmetric distance computation (ADC): per query build
    the m×codes subspace-distance table (broadcast — m·codes rows per
    query), join it to the exploded code stream, sum per (query, vector).
    The corpus side never ships vectors — only (id, subspace, code) — which
    is the whole point at 10^12 vectors.

    rerank > k: keep the top `rerank` ADC candidates per query, fetch only
    those candidates' full vectors (semi-join — Q·rerank rows, never the
    corpus), score exact cosine, return the exact top k. This is the
    standard two-stage PQ search (coarse ADC recall set → exact re-rank);
    output schema becomes (qid, vec_id, score, rank) like the exact paths.

    codebooks/encoded: pass pq_fit's outputs to SKIP the in-call fit — the
    production shape trains once, persists (cb is m·codes tiny rows, enc is
    m bytes/vector), and serves every query batch from the stored index; a
    10^12-vector corpus is encoded exactly once."""
    sub = dim // m
    if (codebooks is None) != (encoded is None):
        raise ValueError("pass codebooks and encoded together")
    if codebooks is None:
        cb, enc = pq_fit(corpus, corpus_id, corpus_vec, m=m, dim=dim,
                         k=codes, iterations=iterations)
    else:
        cb, enc = codebooks, encoded
    qsub = queries.select(
        query_id,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        F.slice(F.col(query_vec), s * sub + 1, sub).alias("qs"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("x"),
    ).select(query_id, "x.s", "x.qs")
    tables = (
        qsub.join(F.broadcast(cb), "s")
        .withColumn("d2", F.round(l2_sq(F.col("qs"), F.col("centroid")), 9))
        .select(query_id, "s", "cid", "d2")
    )
    enc_long = enc.select(
        "pqid",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(s).alias("s"), F.col(f"c{s}").alias("cid"))
                    for s in range(m)
                ]
            )
        ).alias("x"),
    ).select("pqid", "x.s", "x.cid")
    scored = (
        enc_long.join(F.broadcast(tables), ["s", "cid"])
        .groupBy(query_id, "pqid")
        .agg(F.round(F.sum("d2"), 6).alias("adc"))
    )
    w = Window.partitionBy(query_id).orderBy(F.asc("adc"), F.asc("pqid"))
    if rerank <= k:
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select(query_id, F.col("pqid").alias(corpus_id), "adc",
                    F.col("rn").alias("rank"))
        )
    cands = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= rerank)
        .select(query_id, F.col("pqid").alias(corpus_id))
    )
    pool = corpus.join(
        F.broadcast(cands), corpus_id
    ).join(
        F.broadcast(queries.select(query_id, query_vec)), query_id
    )
    exact = pool.withColumn(
        "score", cosine_rounded(F.col(query_vec), F.col(corpus_vec))
    )
    w2 = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(corpus_id))
    return (
        exact.withColumn("rn", F.row_number().over(w2))
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
