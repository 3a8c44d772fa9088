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
        # Zero-shuffle nearest-centroid: the k centroids are a LITERAL
        # array<struct<cid,centroid>> column, per-row distances are an
        # in-row transform, and argmin is array_min over struct(d2, cid)
        # (lexicographic — same (d2 asc, cid asc) tie-break as the former
        # crossJoin+row_number, without materializing k rows per vector or
        # the window's hash exchange; at 10^12 vectors that exchange IS the
        # training cost).
        carr = F.array(
            *[
                F.struct(
                    F.lit(cid).alias("cid"),
                    F.array(
                        *[F.lit(float(v)).cast("float") for v in vec]
                    ).alias("centroid"),
                )
                for cid, vec in cents
            ]
        )
        best = F.array_min(
            F.transform(
                carr,
                lambda c: F.struct(
                    F.round(l2_sq(F.col(vec_col), c["centroid"]), 9).alias("d2"),
                    c["cid"].alias("cid"),
                ),
            )
        )
        return corpus.select(id_col, best["cid"].alias("cid"), vec_col)

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

    → (codebooks (s, cid, centroid array<float>), encoded (pqid, c0..c{m-1})).

    Training is JOINT across subspaces (r5): one explode of the corpus to
    (pqid, s, subvec), then Lloyd's over the compound key (s, cid) — each
    iteration is ONE Spark job over m·n rows instead of m independent fits
    of iterations jobs each (the m-sequential shape was pure job-overhead:
    ~3.7 s per subspace at 100k vectors, dominated by scheduling not data).
    Per-subspace semantics are unchanged: init = the k lowest-id vectors'
    slices rounded to 6, assignment = squared-L2 rounded to 9 with ties to
    lowest cid (in-row array_min — zero shuffle), recompute = per-(s, cid)
    element-wise mean rounded to 6; empty clusters keep their previous
    centroid."""
    spark = corpus.sparkSession
    sub = dim // m

    init_rows = corpus.orderBy(id_col).limit(k).collect()
    cents: dict[tuple[int, int], list[float]] = {}
    for cid, r in enumerate(init_rows):
        full = [round(float(v), 6) for v in r[vec_col]]
        for s in range(m):
            cents[(s, cid)] = full[s * sub : (s + 1) * sub]

    exploded = corpus.select(
        F.col(id_col).alias("pqid"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        F.slice(F.col(vec_col), s * sub + 1, sub).alias("sv"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("x"),
    ).select("pqid", "x.s", "x.sv").persist()  # read once, iterated 1+its times
    # (released by the caller's clearCache/release pass; bench does this)

    def assign(cc: dict) -> DataFrame:
        # literal array indexed by s of (array of (cid, centroid) structs);
        # per row: pick this subspace's codebook, in-row argmin over
        # struct(d2, cid) — lexicographic min == (d2 asc, cid asc).
        by_s = F.array(
            *[
                F.array(
                    *[
                        F.struct(
                            F.lit(cid).alias("cid"),
                            F.array(
                                *[F.lit(float(v)).cast("float") for v in cc[(s, cid)]]
                            ).alias("centroid"),
                        )
                        for cid in range(k)
                    ]
                )
                for s in range(m)
            ]
        )
        best = F.array_min(
            F.transform(
                F.element_at(by_s, F.col("s") + 1),
                lambda c: F.struct(
                    F.round(l2_sq(F.col("sv"), c["centroid"]), 9).alias("d2"),
                    c["cid"].alias("cid"),
                ),
            )
        )
        return exploded.select("pqid", "s", "sv", best["cid"].alias("cid"))

    for _ in range(iterations):
        new = (
            assign(cents)
            .select("s", "cid", F.posexplode("sv").alias("dim", "v"))
            .groupBy("s", "cid", "dim")
            .agg(F.avg("v").alias("mv"))
            .groupBy("s", "cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "mv"))),
                    lambda z: F.round(z["mv"], 6).cast("float"),
                ).alias("centroid")
            )
            .collect()
        )
        got = {(r["s"], r["cid"]): [float(v) for v in r["centroid"]] for r in new}
        cents = {key: got.get(key, vec) for key, vec in cents.items()}

    cb = spark.createDataFrame(
        [(s, cid, vec) for (s, cid), vec in sorted(cents.items())],
        "s int, cid int, centroid array<float>",
    )
    enc = (
        assign(cents)
        .groupBy("pqid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("s", "cid"))),
                lambda z: z["cid"],
            ).alias("cs")
        )
        .select(
            "pqid", *[F.col("cs")[s].alias(f"c{s}") for s in range(m)]
        )
    )
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


def pq_topk_lut(
    queries: DataFrame,
    corpus: DataFrame | None = None,
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
    """ADC top-k via broadcast LUT gather — the scale-shaped twin of
    :func:`pq_topk` (VERDICT r4 item 3: the relational explode+join+sum ADC
    turns every corpus vector into m joined rows; at 10^12 vectors that code
    stream is shuffle-heavy and the per-row DataFrame overhead swamps the
    microseconds a LUT scan costs).

    Here the per-query subspace-distance tables (Q·m·codes doubles — a few
    KB) are computed driver-side and shipped to executors inside the
    mapInPandas closure (broadcast-by-value); each Arrow batch of packed
    codes (pqid, c0..c{m-1}) is scored with a numpy gather
    ``adc[q,b] = Σ_s D[q, s, C[b,s]]`` and immediately reduced to a
    per-batch top-R per query — so the only thing that ever shuffles is the
    tiny candidate stream (≤ batches·Q·R rows), never the corpus. Zero
    joins on the code stream, zero explode, one window over candidates.

    Numeric parity with the relational path (so both twins rank
    identically): the distance tables replicate l2_sq bit-for-bit —
    float32 elementwise squared diff (zip_with over array<float>), float64
    sequential accumulate (F.aggregate from lit(0.0)), then Spark's
    HALF_UP decimal round to 9 (BigDecimal.valueOf semantics via
    Decimal(repr(x))). Batch ADC sums round HALF_UP to 6 on the binary
    value (distances are non-negative), matching F.round(sum, 6) except in
    shortest-decimal-repr midpoint corner cases; test_operators_spark pins
    LUT == relational on the real embeddings tables.

    queries must be the bounded side (same contract as brute_force_topk's
    broadcast): Q vectors are collected to the driver.
    rerank/codebooks/encoded behave exactly as in pq_topk."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    sub = dim // m
    if (codebooks is None) != (encoded is None):
        raise ValueError("pass codebooks and encoded together")
    if codebooks is None:
        if corpus is None:
            raise ValueError("pass corpus or a prebuilt (codebooks, encoded)")
        cb, enc = pq_fit(corpus, corpus_id, corpus_vec, m=m, dim=dim,
                         k=codes, iterations=iterations)
    else:
        cb, enc = codebooks, encoded

    qrows = queries.select(query_id, query_vec).collect()
    qids = np.array([int(r[0]) for r in qrows], dtype=np.int64)
    Q = np.array([[np.float32(v) for v in r[1]] for r in qrows],
                 dtype=np.float32)
    CB = np.zeros((m, codes, sub), dtype=np.float32)
    for r in cb.collect():
        CB[r["s"], r["cid"]] = np.asarray(r["centroid"], dtype=np.float32)

    nq = len(qids)
    D = np.zeros((nq, m, codes), dtype=np.float64)
    q9 = Decimal("1e-9")
    for s in range(m):
        qs = Q[:, s * sub : (s + 1) * sub]
        diff = qs[:, None, :] - CB[s][None, :, :]        # float32, as zip_with
        sq = (diff * diff).astype(np.float64)            # widen after f32 mult
        acc = np.zeros((nq, codes), dtype=np.float64)
        for i in range(sub):                             # sequential fold
            acc = acc + sq[:, :, i]
        for qi in range(nq):
            for ci in range(codes):
                D[qi, s, ci] = float(
                    Decimal(repr(float(acc[qi, ci]))).quantize(q9, ROUND_HALF_UP)
                )

    R = max(k, rerank)
    code_cols = [f"c{s}" for s in range(m)]
    mm = m

    def scan(batches):
        import numpy as _np
        import pandas as _pd

        for b in batches:
            ids = b["pqid"].to_numpy(dtype=_np.int64)
            order = _np.argsort(ids, kind="stable")      # id-asc tie-break
            ids = ids[order]
            C = _np.stack(
                [b[c].to_numpy(dtype=_np.int64)[order] for c in code_cols],
                axis=1,
            )
            adc = _np.zeros((nq, len(ids)), dtype=_np.float64)
            for s in range(mm):
                adc += D[:, s, C[:, s]]
            adc = _np.floor(adc * 1e6 + 0.5) / 1e6       # HALF_UP to 6
            r = min(R, len(ids))
            out_q, out_id, out_d = [], [], []
            for qi in range(nq):
                top = _np.argsort(adc[qi], kind="stable")[:r]
                out_q.append(_np.full(r, qids[qi]))
                out_id.append(ids[top])
                out_d.append(adc[qi][top])
            yield _pd.DataFrame(
                {
                    "qid_": _np.concatenate(out_q),
                    "pqid": _np.concatenate(out_id),
                    "adc": _np.concatenate(out_d),
                }
            )

    cand = enc.select("pqid", *code_cols).mapInPandas(
        scan, "qid_ long, pqid long, adc double"
    ).withColumnRenamed("qid_", query_id)
    w = Window.partitionBy(query_id).orderBy(F.asc("adc"), F.asc("pqid"))
    ranked = cand.withColumn("rn", F.row_number().over(w))
    if rerank <= k:
        return ranked.filter(F.col("rn") <= k).select(
            query_id, F.col("pqid").alias(corpus_id), "adc",
            F.col("rn").alias("rank")
        )
    cands = ranked.filter(F.col("rn") <= rerank).select(
        query_id, F.col("pqid").alias(corpus_id)
    )
    if corpus is None:
        raise ValueError("rerank needs the corpus vectors")
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
