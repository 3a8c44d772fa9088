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

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.similarity import (
    cosine_rounded,
    cosine_rounded_prenormed,
    norm,
)


def _scored_topk(
    scored: DataFrame, k: int, query_id: str, corpus_id: str
) -> DataFrame:
    """Exact top-k per query over a scored pair stream: one window ranked
    by (score desc, corpus_id asc). A salted two-level variant (per-slice
    top-k, then global) was measured in r7 and came out no faster even at
    100k corpus rows per query — the single sort over narrow
    (qid, id, score) rows is not the bottleneck — so the simpler plan
    (one exchange fewer) stays."""
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(corpus_id))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(query_id, corpus_id, "score", F.col("rn").alias("rank"))
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "qid",
    query_vec: str = "qvec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    max_queries: int = 4096,
) -> DataFrame:
    """Exact k-NN: numpy-scored corpus pass (r7) + exact top-k window.

    The former shape materialized |Q|·|corpus| joined pair rows (two full
    vectors each) through a broadcast nested-loop join only to fold a dot
    product per pair — ~1 GB of array copying for 20×100k pairs. Now the
    query vectors (a bounded driver collect, `max_queries`-guarded like
    ivfpq's query side) ship in the task closure and ONE mapInPandas pass
    over the corpus emits narrow (qid, id, raw_score) rows; the rounding
    stays in the JVM (`F.round`) and the top-k window is unchanged.

    Value-exactness vs the expression path is by operation-for-operation
    replication, not approximation (`_np_cosine_raw`): float32 products
    widened to float64 and accumulated in element order (= the
    `aggregate(zip_with(...))` fold), IEEE sqrt/divide, Spark's
    NaN-comparison and null/length-mismatch semantics in the scalar
    fallback — pinned by tests/test_operators_spark.py::
    test_brute_force_numpy_matches_expression_path over nulls, NaN, zero,
    mismatched-dim and empty vectors, and by the unchanged pinned
    oracles/parity gate."""
    qrows = queries.select(query_id, query_vec).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"brute_force_topk: {len(qrows)} query rows exceed "
            f"max_queries={max_queries}; raise the limit explicitly for "
            "bigger batches (the query side is collected to the driver)"
        )
    elem = corpus.schema[corpus_vec].dataType.elementType.simpleString()
    is_f32 = elem == "float"
    qid_t = queries.schema[query_id].dataType.simpleString()
    cid_t = corpus.schema[corpus_id].dataType.simpleString()
    Q = [
        (r[0], None if r[1] is None else list(r[1]))
        for r in qrows
    ]

    def gen(batches):
        import numpy as _np
        import pandas as _pd

        f32 = _np.float32
        qprep = []  # (qid, qlist, qarr, qnorm)
        for q_id, q in Q:
            if q is None:
                qprep.append((q_id, None, None, None))
                continue
            acc = 0.0
            if is_f32:
                qa = _np.asarray(q, dtype=_np.float32)
                for x in qa:
                    acc += float(x * x)
            else:
                qa = _np.asarray(q, dtype=_np.float64)
                for x in q:
                    acc += x * x
            qprep.append((q_id, q, qa, float(_np.sqrt(acc))))

        def cn_of(v):
            # norm fold: acc(double) + v*v (element dtype), element order
            acc = 0.0
            if is_f32:
                for x in _np.asarray(v, dtype=_np.float32):
                    acc += float(x * x)
            else:
                for x in v:
                    acc += x * x
            return float(_np.sqrt(acc))

        def scalar_score(qlist, qa, qn, v):
            # replicates round-input of: when(norm(a)*norm(b)>0, dot/denom)
            # .otherwise(0.0) with zip_with null extension and Spark's
            # NaN>0 == true comparison semantics
            if qlist is None or v is None:
                return 0.0  # null norm → null denom → otherwise
            cn = cn_of(v)
            denom = qn * cn
            if not (denom > 0) and not _np.isnan(denom):
                return 0.0
            if len(v) != len(qlist):
                return None  # null dot through a taken when-branch
            acc = 0.0
            if is_f32:
                va = _np.asarray(v, dtype=_np.float32)
                for x, y in zip(qa, va):
                    acc += float(x * y)
            else:
                for x, y in zip(qlist, v):
                    acc += x * y
            return acc / denom

        # Arrow's pandas conversion folds NaN into null, so nullness and
        # NaN-ness travel in an explicit `kind` column (0 = use score,
        # 1 = NULL, 2 = NaN) and the JVM reconstructs the exact value
        for b in batches:
            if not len(b):
                continue
            ids = b[corpus_id]
            vs = b[corpus_vec].to_numpy()
            n = len(b)
            lens = [(-1 if v is None else len(v)) for v in vs]
            L = lens[0]
            uniform = L >= 0 and all(x == L for x in lens)
            frames = []
            if uniform:
                work = _np.float32 if is_f32 else _np.float64
                V = (
                    _np.stack(vs).astype(work)
                    if L
                    else _np.zeros((n, 0), dtype=work)
                )
                cn_acc = _np.zeros(n, dtype=_np.float64)
                for i in range(L):
                    cn_acc += (V[:, i] * V[:, i]).astype(_np.float64)
                CN = _np.sqrt(cn_acc)
                for q_id, qlist, qa, qn in qprep:
                    if qlist is None:
                        sc = _np.zeros(n, dtype=_np.float64)
                        kind = _np.zeros(n, dtype=_np.int8)
                    elif len(qlist) != L:
                        # null dot through a taken when-branch → NULL score
                        denom = qn * CN
                        live = (denom > 0) | _np.isnan(denom)
                        sc = _np.zeros(n, dtype=_np.float64)
                        kind = _np.where(live, 1, 0).astype(_np.int8)
                    else:
                        dot = _np.zeros(n, dtype=_np.float64)
                        for i in range(L):
                            dot += (V[:, i] * qa[i]).astype(_np.float64)
                        denom = qn * CN
                        with _np.errstate(divide="ignore", invalid="ignore"):
                            sc = _np.where(
                                (denom > 0) | _np.isnan(denom),
                                dot / denom,
                                0.0,
                            )
                        isn = _np.isnan(sc)
                        kind = _np.where(isn, 2, 0).astype(_np.int8)
                        sc = _np.where(isn, 0.0, sc)
                    frames.append(_pd.DataFrame({
                        "__qid": _pd.Series([q_id] * n),
                        "__cid": ids.reset_index(drop=True),
                        "score": sc,
                        "kind": kind,
                    }))
            else:
                for q_id, qlist, qa, qn in qprep:
                    raw = [scalar_score(qlist, qa, qn, v) for v in vs]
                    sc = _np.array(
                        [0.0 if (x is None or _np.isnan(x)) else x for x in raw],
                        dtype=_np.float64,
                    )
                    kind = _np.array(
                        [1 if x is None else (2 if _np.isnan(x) else 0)
                         for x in raw],
                        dtype=_np.int8,
                    )
                    frames.append(_pd.DataFrame({
                        "__qid": _pd.Series([q_id] * n),
                        "__cid": ids.reset_index(drop=True),
                        "score": sc,
                        "kind": kind,
                    }))
            yield _pd.concat(frames, ignore_index=True)

    scored = (
        corpus.select(corpus_id, corpus_vec)
        .mapInPandas(
            gen, f"__qid {qid_t}, __cid {cid_t}, score double, kind tinyint"
        )
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias(corpus_id),
            F.round(
                F.when(F.col("kind") == 1, F.lit(None).cast("double"))
                .when(F.col("kind") == 2, F.lit(float("nan")))
                .otherwise(F.col("score")),
                6,
            ).alias("score"),
        )
    )
    return _scored_topk(scored, k, query_id, corpus_id)


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


def _exact_rerank(
    queries: DataFrame,
    corpus: DataFrame,
    cands: DataFrame,
    k: int,
    query_id: str,
    query_vec: str,
    corpus_id: str,
    corpus_vec: str,
) -> DataFrame:
    """Shared two-stage tail: fetch only the candidates' full vectors
    (broadcast semi-shape — Q·rerank rows, never the corpus), score exact
    cosine, return the exact top k with (desc score, asc id) tie-break.
    Used by pq_topk, pq_topk_lut, and opq_topk so the rounding/tie rules
    can never diverge between the twins (r5 review finding)."""
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


def _np_nearest(vecs32, cents32):
    """numpy twin of the relational nearest-centroid assignment, matching
    l2_sq + F.round + (d2 asc, cid asc) bit-for-bit in the cases that
    matter: float32 elementwise squared diffs (zip_with over array<float>),
    float64 SEQUENTIAL fold (F.aggregate from lit(0.0)), HALF_UP round to
    9 on the binary value (F.round semantics up to shortest-decimal-repr
    midpoint corner cases), argmin with ties to the lowest cid
    (np.argmin's first occurrence). Pinned against the JVM path by
    tests/test_kmeans.py's independent twin and the pq/ivf pinned oracles."""
    import numpy as np

    n, dim = vecs32.shape
    d2 = np.zeros((n, cents32.shape[0]))
    for i in range(dim):
        diff = vecs32[:, i, None] - cents32[None, :, i]  # float32, as zip_with
        d2 += (diff * diff).astype(np.float64)           # widen after f32 mult
    d2 = np.floor(d2 * 1e9 + 0.5) / 1e9                  # HALF_UP to 9
    return np.argmin(d2, axis=1)


def _round6_f32(mean_vec) -> list[float]:
    """F.round(x, 6) then cast to array<float>, replicated: HALF_UP on the
    shortest-decimal repr (BigDecimal.valueOf semantics), then a float32
    narrowing — the exact value chain the former relational centroid
    recompute produced."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    q6 = Decimal("1e-6")
    return [
        float(np.float32(float(Decimal(repr(float(x))).quantize(q6, ROUND_HALF_UP))))
        for x in mean_vec
    ]


def kmeans_fit(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iterations: int = 4,
    keep_vec: bool = False,
) -> DataFrame:
    """Deterministic Lloyd's k-means, fully vectorized (r5): each iteration
    is ONE numpy mapInPandas pass over the corpus — per Arrow batch the
    centroids (shipped in the closure: k·dim floats) are assigned with
    `_np_nearest` and the per-cluster partial sums are accumulated with
    np.add.at, so only k bounded rows reach the driver, which combines and
    rounds the means HALF_UP to 6 decimals + float32 (`_round6_f32` — the
    identical value chain the relational recompute produced, so centroids
    and every pinned oracle downstream are unchanged). Zero shuffle, zero
    per-row Python, no posexplode row blowup, and — the r5 finding — no
    O(k·dim) driver-side Column-literal construction, which at k=16·dim=64
    cost seconds of py4j round-trips per iteration before any execution.

    Init = the k lowest-id vectors rounded to 6; fixed iteration count, no
    data-dependent stopping — reruns and different partitionings produce
    identical centroids. Empty clusters keep their previous centroid.

    Returns the assignment DataFrame (id, cid) — centroids are in
    `kmeans_fit.last_centroids` after the call (list of (cid, [floats])).
    keep_vec=True returns (id, cid, vec) instead — the vector column rides
    the assignment pass as an untouched Arrow passthrough, so callers that
    need (vector, list id) pairs (IVF search, residual encoding) skip a
    full corpus⋈assignment shuffle join (r7).
    """
    import numpy as np

    init = [
        (i, [round(float(v), 6) for v in r[vec_col]])
        for i, r in enumerate(
            corpus.orderBy(id_col).limit(k).collect()
        )
    ]
    centroids = init
    # carry the id column through UNTOUCHED (ADVICE r5: the former
    # cast("long") silently nulled non-numeric ids; the pandas pass never
    # computes on the id, so any type passes through byte-identical)
    id_type = corpus.schema[id_col].dataType.simpleString()
    vecs_df = corpus.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    )

    def _partials_pass(cvals):
        C = np.asarray(cvals, dtype=np.float32)

        def gen(batches):
            import numpy as _np
            import pandas as _pd

            for b in batches:
                if not len(b):
                    continue
                vecs = _np.stack(b["__v"].to_numpy()).astype(_np.float32)
                cid = _np_nearest(vecs, C)
                acc = _np.zeros((k, vecs.shape[1]))
                cnt = _np.zeros(k, dtype=_np.int64)
                _np.add.at(acc, cid, vecs.astype(_np.float64))
                _np.add.at(cnt, cid, 1)
                nz = _np.nonzero(cnt)[0]
                yield _pd.DataFrame(
                    {"cid": nz, "n": cnt[nz], "sums": [acc[i] for i in nz]}
                )

        return vecs_df.mapInPandas(gen, "cid int, n long, sums array<double>")

    for _ in range(iterations):
        tot: dict[int, np.ndarray] = {}
        cnt: dict[int, int] = {}
        for r in _partials_pass([v for _, v in centroids]).collect():
            c = int(r["cid"])
            s = np.asarray(r["sums"], dtype=np.float64)
            tot[c] = tot[c] + s if c in tot else s
            cnt[c] = cnt.get(c, 0) + int(r["n"])
        centroids = [
            (cid, _round6_f32(tot[cid] / cnt[cid]) if cid in tot else vec)
            for cid, vec in centroids
        ]

    kmeans_fit.last_centroids = centroids
    Cfinal = np.asarray([v for _, v in centroids], dtype=np.float32)

    def assign_gen(batches):
        import numpy as _np
        import pandas as _pd

        for b in batches:
            if not len(b):
                continue
            vecs = _np.stack(b["__v"].to_numpy()).astype(_np.float32)
            out = {
                "__id": b["__id"],
                "cid": _np_nearest(vecs, Cfinal).astype(_np.int32),
            }
            if keep_vec:
                # passthrough of the ORIGINAL arrays (no computation) —
                # Arrow round-trips the float32 values bit-identically
                out["__v"] = b["__v"]
            yield _pd.DataFrame(out)

    if keep_vec:
        vec_type = corpus.schema[vec_col].dataType.simpleString()
        return vecs_df.mapInPandas(
            assign_gen, f"__id {id_type}, cid int, __v {vec_type}"
        ).select(F.col("__id").alias(id_col), "cid", F.col("__v").alias(vec_col))
    return vecs_df.mapInPandas(assign_gen, f"__id {id_type}, cid int").select(
        F.col("__id").alias(id_col), "cid"
    )


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
    # keep_vec: the vectors ride the assignment pass, replacing the former
    # corpus⋈assignment shuffle join (identical values — Arrow passthrough)
    listed = kmeans_fit(corpus, corpus_id, corpus_vec, k=n_lists,
                        iterations=iterations, keep_vec=True)
    cents = spark.createDataFrame(
        kmeans_fit.last_centroids, "cid int, centroid array<float>"
    )
    q2c = queries.crossJoin(F.broadcast(cents)).withColumn(
        "d2", F.round(l2_sq(F.col(query_vec), F.col("centroid")), 9)
    )
    wq = Window.partitionBy(query_id).orderBy(F.asc("d2"), F.asc("cid"))
    probed = (
        q2c.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select(query_id, query_vec, "cid")
    )
    pairs = listed.withColumn("__cn", norm(F.col(corpus_vec))).join(
        F.broadcast(probed.withColumn("__qn", norm(F.col(query_vec)))), "cid"
    )
    scored = pairs.withColumn(
        "score",
        cosine_rounded_prenormed(
            F.col(query_vec), F.col(corpus_vec), F.col("__qn"), F.col("__cn")
        ),
    )
    return _scored_topk(scored, k, query_id, corpus_id)


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

    Training is JOINT across subspaces and fully vectorized (r5): each
    Lloyd iteration is ONE numpy mapInPandas pass over the raw corpus —
    per Arrow batch, vectors are sliced into their m subvectors, assigned
    with `_np_nearest` against the closure-shipped codebooks, and reduced
    to (s, cid) partial sums; only m·k bounded rows reach the driver.
    The encode step is a second numpy scan emitting (pqid, c0..c{m-1})
    directly. Zero shuffle, zero explode, and none of the O(m·k·sub)
    driver-side Column-literal construction that made the previous shapes
    seconds-per-iteration before any execution. Per-subspace semantics are
    unchanged (init = the k lowest-id vectors' slices rounded to 6,
    squared-L2 rounded to 9 with ties to lowest cid, means rounded to
    6 + float32 via `_round6_f32`); empty clusters keep their previous
    centroid — pinned oracles downstream hold."""
    spark = corpus.sparkSession
    sub = dim // m

    init_rows = corpus.orderBy(id_col).limit(k).collect()
    cents: dict[tuple[int, int], list[float]] = {}
    for cid, r in enumerate(init_rows):
        full = [round(float(v), 6) for v in r[vec_col]]
        for s in range(m):
            cents[(s, cid)] = full[s * sub : (s + 1) * sub]

    import numpy as np

    vecs_df = corpus.select(
        F.col(id_col).cast("long").alias("pqid"), F.col(vec_col).alias("__v")
    )

    def _partials_pass(cc: dict) -> DataFrame:
        # all m subspaces in ONE numpy pass per iteration: per batch, slice
        # each vector into its m subvectors, `_np_nearest` against that
        # subspace's codebook, np.add.at partial sums keyed (s, cid) —
        # m·k bounded rows reach the driver; zero shuffle, zero explode.
        C = np.asarray(
            [[cc[(s, cid)] for cid in range(k)] for s in range(m)],
            dtype=np.float32,
        )

        def gen(batches):
            import numpy as _np
            import pandas as _pd

            for b in batches:
                if not len(b):
                    continue
                vecs = _np.stack(b["__v"].to_numpy()).astype(_np.float32)
                acc = _np.zeros((m, k, sub))
                cnt = _np.zeros((m, k), dtype=_np.int64)
                for s in range(m):
                    sv = vecs[:, s * sub : (s + 1) * sub]
                    cid = _np_nearest(sv, C[s])
                    _np.add.at(acc[s], cid, sv.astype(_np.float64))
                    _np.add.at(cnt[s], cid, 1)
                ss, cs = _np.nonzero(cnt)
                yield _pd.DataFrame(
                    {
                        "s": ss,
                        "cid": cs,
                        "n": cnt[ss, cs],
                        "sums": [acc[a, b_] for a, b_ in zip(ss, cs)],
                    }
                )

        return vecs_df.mapInPandas(
            gen, "s int, cid int, n long, sums array<double>"
        )

    for _ in range(iterations):
        tot: dict[tuple[int, int], np.ndarray] = {}
        cnt: dict[tuple[int, int], int] = {}
        for r in _partials_pass(cents).collect():
            key = (int(r["s"]), int(r["cid"]))
            sm = np.asarray(r["sums"], dtype=np.float64)
            tot[key] = tot[key] + sm if key in tot else sm
            cnt[key] = cnt.get(key, 0) + int(r["n"])
        cents = {
            key: _round6_f32(tot[key] / cnt[key]) if key in tot else vec
            for key, vec in cents.items()
        }

    cb = spark.createDataFrame(
        [(s, cid, vec) for (s, cid), vec in sorted(cents.items())],
        "s int, cid int, centroid array<float>",
    )

    # encode pass: (pqid, c0..c{m-1}) directly from one numpy scan — no
    # explode, no groupBy pivot
    Cfinal = np.asarray(
        [[cents[(s, cid)] for cid in range(k)] for s in range(m)],
        dtype=np.float32,
    )

    def encode_gen(batches):
        import numpy as _np
        import pandas as _pd

        for b in batches:
            if not len(b):
                continue
            vecs = _np.stack(b["__v"].to_numpy()).astype(_np.float32)
            cols = {"pqid": b["pqid"].to_numpy()}
            for s in range(m):
                cols[f"c{s}"] = _np_nearest(
                    vecs[:, s * sub : (s + 1) * sub], Cfinal[s]
                ).astype(_np.int32)
            yield _pd.DataFrame(cols)

    enc = vecs_df.mapInPandas(
        encode_gen,
        "pqid long, " + ", ".join(f"c{s} int" for s in range(m)),
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
    return _exact_rerank(queries, corpus, cands, k, query_id, query_vec,
                         corpus_id, corpus_vec)


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
    max_queries: int = 10_000,
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
    broadcast): Q vectors are collected to the driver, and max_queries
    enforces the contract loudly — the collect is capped at
    max_queries + 1 rows, so an unbounded query side raises instead of
    OOMing the driver (VERDICT r5 item 7).
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

    # limit() caps what ever reaches the driver — the guard fires BEFORE an
    # oversized query side could materialize driver-side
    qrows = queries.select(query_id, query_vec).limit(max_queries + 1).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"pq_topk_lut queries side exceeds max_queries={max_queries}; "
            "the LUT path collects queries to the driver by contract — "
            "batch the query side or raise max_queries explicitly"
        )
    if not qrows:  # empty queries: empty result, like the relational twin
        from pyspark.sql.types import (
            DoubleType, IntegerType, StructField, StructType,
        )

        spark = (corpus if corpus is not None else enc).sparkSession
        # schema from the ACTUAL id column types (ADVICE r5): query id from
        # the queries frame; corpus id from the corpus frame when present,
        # else the encoded frame's pqid
        qid_type = queries.schema[query_id].dataType
        cid_type = (
            corpus.schema[corpus_id].dataType
            if corpus is not None
            else enc.schema["pqid"].dataType
        )
        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField(query_id, qid_type),
                    StructField(corpus_id, cid_type),
                    StructField("score" if rerank > k else "adc", DoubleType()),
                    StructField("rank", IntegerType()),
                ]
            ),
        )
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
    return _exact_rerank(queries, corpus, cands, k, query_id, query_vec,
                         corpus_id, corpus_vec)


def opq_rotation(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    dim: int = 64,
    codes: int = 16,
    opq_iterations: int = 5,
    sample_n: int = 10_000,
):
    """Learn the OPQ rotation (Ge et al., CVPR 2013 — public literature):
    an orthogonal R such that PQ on R·x has lower quantization error than
    PQ on x, closing the gap when variance/correlation straddles subspace
    boundaries (VERDICT r4 "missing" item: no OPQ rotation before PQ).

    Non-parametric alternating optimization, DRIVER-side on a bounded
    deterministic sample (the sample_n lowest-id vectors — a TakeOrdered at
    any corpus scale; sample_n·dim floats ≈ a few MB):
      repeat: PQ-fit the rotated sample (numpy Lloyd's, same
      lowest-id-init/first-occurrence-argmin discipline as kmeans_fit) →
      reconstruct X̂ from codes → R ← UVᵀ from SVD(X̂ᵀX) (orthogonal
      Procrustes). Deterministic: fixed sample, fixed iteration counts,
      LAPACK SVD (stable in-container, where the pinned oracles are
      generated).

    Returns R as a (dim, dim) float32 numpy array (broadcast by value in
    closures downstream)."""
    import numpy as np

    sub = dim // m
    rows = corpus.select(id_col, vec_col).orderBy(id_col).limit(sample_n).collect()
    X = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)  # (n, dim)
    R = np.eye(dim)

    def _pq_sample_fit(Z):
        recon = np.empty_like(Z)
        for s in range(m):
            zs = Z[:, s * sub : (s + 1) * sub]
            cents = zs[:codes].copy()  # lowest-sample-order init
            for _ in range(3):
                d2 = ((zs[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
                a = np.argmin(d2, axis=1)
                for c in range(codes):
                    mask = a == c
                    if mask.any():
                        cents[c] = zs[mask].mean(axis=0)
            d2 = ((zs[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            recon[:, s * sub : (s + 1) * sub] = cents[np.argmin(d2, axis=1)]
        return recon

    for _ in range(opq_iterations):
        Z = X @ R
        recon = _pq_sample_fit(Z)
        U, _sv, Vt = np.linalg.svd(X.T @ recon)
        R = U @ Vt
    return R.astype(np.float32)


def rotate_vectors(
    df: DataFrame, R, vec_col: str = "embedding", out_col: str | None = None
) -> DataFrame:
    """x → R·x per row (numpy mapInPandas over Arrow batches; R ships in
    the closure — dim² floats). float32 in/out, matching the embedding
    column type."""
    import numpy as np

    out_col = out_col or vec_col
    R32 = np.asarray(R, dtype=np.float32)
    others = [c for c in df.columns if c != vec_col]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != vec_col
    ) + f", {out_col} array<float>"

    def gen(batches):
        import numpy as _np
        import pandas as _pd

        for b in batches:
            if not len(b):
                continue
            vecs = _np.stack(b[vec_col].to_numpy()).astype(_np.float32)
            rot = vecs @ R32
            data = {c: b[c] for c in others}
            data[out_col] = list(rot)
            yield _pd.DataFrame(data)

    return df.mapInPandas(gen, schema)


def opq_topk(
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
    opq_iterations: int = 5,
    sample_n: int = 10_000,
    rotation=None,
    codebooks: DataFrame | None = None,
    encoded: DataFrame | None = None,
) -> DataFrame:
    """OPQ two-stage search: learn R (opq_rotation), PQ-index the ROTATED
    corpus (pq_fit — train once, like PQ), ADC-scan rotated queries via
    the broadcast-LUT path, then exact-rerank the candidates on the
    ORIGINAL vectors (R is orthogonal, so original-space cosine is the
    correct final score and needs no corpus rotation at query time).
    rotation/codebooks/encoded: pass a prebuilt index to skip the fit —
    a prebuilt (codebooks, encoded) REQUIRES the rotation they were
    encoded under (review finding: silently re-learning R here would score
    codes in a mismatched rotation and collapse recall with no error)."""
    if (codebooks is None) != (encoded is None):
        raise ValueError("pass codebooks and encoded together")
    if codebooks is not None and rotation is None:
        raise ValueError(
            "a prebuilt (codebooks, encoded) index requires the rotation it "
            "was encoded under — pass rotation= from the same opq fit"
        )
    if rotation is None:
        rotation = opq_rotation(
            corpus, corpus_id, corpus_vec, m=m, dim=dim, codes=codes,
            opq_iterations=opq_iterations, sample_n=sample_n,
        )
    if codebooks is None:
        rot_corpus = rotate_vectors(
            corpus.select(corpus_id, corpus_vec), rotation, corpus_vec
        )
        cb, enc = pq_fit(rot_corpus, corpus_id, corpus_vec, m=m, dim=dim,
                         k=codes, iterations=iterations)
    else:
        cb, enc = codebooks, encoded
    rot_queries = rotate_vectors(
        queries.select(query_id, query_vec), rotation, query_vec
    )
    if rerank <= k:
        # no exact stage requested: ADC ranking is the result (adc scores
        # are in rotated space, which preserves L2 — keep the schema)
        return pq_topk_lut(
            rot_queries, None, k=k, m=m, dim=dim, codes=codes,
            query_id=query_id, query_vec=query_vec, corpus_id=corpus_id,
            codebooks=cb, encoded=enc,
        )
    cands = pq_topk_lut(
        rot_queries, None, k=max(k, rerank), m=m, dim=dim, codes=codes,
        query_id=query_id, query_vec=query_vec, corpus_id=corpus_id,
        codebooks=cb, encoded=enc,
    ).select(query_id, corpus_id)
    return _exact_rerank(queries, corpus, cands, k, query_id, query_vec,
                         corpus_id, corpus_vec)


def ivfpq_fit(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 4,
    m: int = 4,
    dim: int = 64,
    codes: int = 16,
    coarse_iterations: int = 4,
    pq_iterations: int = 3,
):
    """Build the composed IVF×PQ index (Jégou et al. 2011 §IV — the FAISS
    IVFPQ layout the reference's HNSW config stands in for,
    /root/reference/docs/INFRASTRUCTURE.md:227-244): a coarse k-means
    quantizer assigns every vector to one of n_lists inverted lists, and a
    product quantizer encodes each vector's RESIDUAL x − c_list as m byte
    codes. Residual encoding is what makes the composition worth having:
    residuals concentrate near 0 across all lists, so one shared codebook
    quantizes them far better than it quantizes raw positions.

    All distributed pieces reuse the existing machinery: `kmeans_fit`
    (vectorized Lloyd's, k bounded driver rows per iteration) for the
    coarse step, one zero-shuffle mapInPandas pass to form residuals
    (centroids ship in the closure — n_lists·dim floats), `pq_fit`
    (joint-subspace vectorized Lloyd's) over the residuals, then one
    broadcast-hash join to attach the list id to the packed codes.

    Returns (coarse_centroids, codebooks, encoded):
      coarse_centroids — list[(cid, [float])] (driver-side, n_lists rows);
      codebooks        — DataFrame (s, cid, centroid array<float>);
      encoded          — DataFrame (pqid long, cid int, c0..c{m-1} int),
                         the stored index: m bytes + a list id per vector.
    At 10^12 vectors `encoded` is what you persist, partitioned by cid so a
    probed search prunes whole partitions."""
    import numpy as np

    from .dedup import _scoped_persist

    vecs = corpus.select(id_col, vec_col)
    # run the coarse Lloyd iterations; the returned lazy assignment frame
    # is deliberately unused — the fused pass below recomputes the final
    # assignment (same _np_nearest on the same centroids, deterministic)
    # together with the residuals in ONE corpus pass, replacing the former
    # assign pass + corpus⋈assignment join + residual pass (r7).
    kmeans_fit(vecs, id_col, vec_col, k=n_lists, iterations=coarse_iterations)
    coarse = kmeans_fit.last_centroids
    Cc = np.asarray([v for _, v in coarse], dtype=np.float32)

    def assign_resid_gen(batches):
        import numpy as _np
        import pandas as _pd

        for b in batches:
            if not len(b):
                continue
            V = _np.stack(b[vec_col].to_numpy()).astype(_np.float32)
            cid = _np_nearest(V, Cc)
            R = V - Cc[cid]  # float32 residuals
            yield _pd.DataFrame({
                id_col: b[id_col],
                "cid": cid.astype(_np.int32),
                "__resid": list(R),
            })

    id_type = corpus.schema[id_col].dataType.simpleString()
    # persisted: pq_fit makes ~pq_iterations+2 passes over `residuals`,
    # and without materialization EVERY pass would re-execute the fused
    # assignment+residual pass (measured: ivfpq_train ≈ 4-5× pq_train for
    # the same iteration count before r7). Registered with
    # release_intermediates() like every other multi-branch intermediate.
    residuals = _scoped_persist(
        vecs.mapInPandas(
            assign_resid_gen, f"{id_col} {id_type}, cid int, __resid array<float>"
        )
    )
    cb, enc = pq_fit(
        residuals, id_col, "__resid", m=m, dim=dim, k=codes,
        iterations=pq_iterations,
    )
    enc_listed = enc.join(
        F.broadcast(
            residuals.select(
                F.col(id_col).cast("long").alias("pqid"), "cid"
            )
        ),
        "pqid",
    )
    return coarse, cb, enc_listed


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame | None = None,
    k: int = 3,
    nprobe: int = 2,
    n_lists: int = 4,
    m: int = 4,
    dim: int = 64,
    codes: int = 16,
    coarse_iterations: int = 4,
    iterations: int = 3,
    rerank: int = 0,
    query_id: str = "qid",
    query_vec: str = "qvec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    index=None,
    max_queries: int = 10_000,
) -> DataFrame:
    """Composed IVF×PQ search — the production 10^12-vector serving shape
    (VERDICT r5 item 3): coarse-quantizer PRUNE (only the nprobe nearest
    lists per query are scanned), per-list residual-PQ LUT ADC scan
    (packed codes never unpack; per-(query,list) distance tables ship in
    the mapInPandas closure), then exact cosine re-rank of the candidate
    pool on the original vectors.

    vs `pq_topk_lut`: that path scans the WHOLE code stream per query;
    here each query touches ~nprobe/n_lists of it, and because the probed
    lists reach the scan as a pushed `cid IN (...)` filter, a code stream
    persisted partitioned-by-cid prunes unscanned partitions entirely.

    Determinism: coarse probe ranks on squared L2 rounded half-up to 9
    (binary, as `_np_nearest`) with ties to the lowest cid; ADC sums round
    half-up to 6 with ties to the lowest pqid; the per-batch top-R cut
    keeps every global top-R row regardless of Arrow batch boundaries, so
    output is partitioning-invariant. There is no relational twin (the
    composition is pinned-oracle territory like pq_topk/opq_topk); the
    ADC→exact agreement contract is pinned by tests instead.

    index: pass `ivfpq_fit(...)`'s (coarse_centroids, codebooks, encoded)
    to skip the fit — train once, serve every query batch. rerank > k
    requires `corpus` for the exact stage. queries are the bounded side
    (max_queries guard, as pq_topk_lut)."""
    import numpy as np

    if index is None:
        if corpus is None:
            raise ValueError("pass corpus or a prebuilt index=ivfpq_fit(...)")
        index = ivfpq_fit(
            corpus, corpus_id, corpus_vec, n_lists=n_lists, m=m, dim=dim,
            codes=codes, coarse_iterations=coarse_iterations,
            pq_iterations=iterations,
        )
    coarse, cb, enc_listed = index
    n_lists = len(coarse)
    sub = dim // m

    qrows = queries.select(query_id, query_vec).limit(max_queries + 1).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"ivfpq_topk queries side exceeds max_queries={max_queries}; "
            "batch the query side or raise max_queries explicitly"
        )
    if not qrows:
        from pyspark.sql.types import (
            DoubleType, IntegerType, StructField, StructType,
        )

        spark = (corpus if corpus is not None else enc_listed).sparkSession
        qid_type = queries.schema[query_id].dataType
        cid_type = (
            corpus.schema[corpus_id].dataType
            if corpus is not None
            else enc_listed.schema["pqid"].dataType
        )
        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField(query_id, qid_type),
                    StructField(corpus_id, cid_type),
                    StructField("score" if rerank > k else "adc", DoubleType()),
                    StructField("rank", IntegerType()),
                ]
            ),
        )

    qids = np.array([int(r[0]) for r in qrows], dtype=np.int64)
    Q = np.array([[np.float32(v) for v in r[1]] for r in qrows],
                 dtype=np.float32)
    nq = len(qids)
    Cc = np.zeros((n_lists, dim), dtype=np.float32)
    for cid, vec in coarse:
        Cc[cid] = np.asarray(vec, dtype=np.float32)
    CB = np.zeros((m, codes, sub), dtype=np.float32)
    for r in cb.collect():
        CB[r["s"], r["cid"]] = np.asarray(r["centroid"], dtype=np.float32)

    # coarse probe: rounded squared L2 (the _np_nearest discipline), stable
    # argsort => ties to the lowest cid
    diff = Q[:, None, :] - Cc[None, :, :]                 # float32
    d2 = (diff * diff).astype(np.float64).sum(axis=2)
    d2 = np.floor(d2 * 1e9 + 0.5) / 1e9                   # HALF_UP to 9
    probes = np.argsort(d2, axis=1, kind="stable")[:, :nprobe]  # (nq, nprobe)

    # per-(query, probed-list) residual distance tables:
    # D[qi, slot, s, c] = || (q - c_list)_s  -  CB[s, c] ||², rounded to 9
    D = np.zeros((nq, nprobe, m, codes), dtype=np.float64)
    for qi in range(nq):
        qr = Q[qi][None, :] - Cc[probes[qi]]              # (nprobe, dim) f32
        for s in range(m):
            qs = qr[:, s * sub : (s + 1) * sub]           # (nprobe, sub)
            dd = qs[:, None, :] - CB[s][None, :, :]       # f32
            D[qi, :, s, :] = (dd * dd).astype(np.float64).sum(axis=2)
    D = np.floor(D * 1e9 + 0.5) / 1e9

    # slot lookup: for each query, list id -> probe slot (or -1 = unprobed)
    slot = np.full((nq, n_lists), -1, dtype=np.int64)
    for qi in range(nq):
        slot[qi, probes[qi]] = np.arange(nprobe)

    probed_union = sorted({int(c) for row in probes for c in row})
    R = max(k, rerank)
    code_cols = [f"c{s}" for s in range(m)]
    mm = m

    def scan(batches):
        import numpy as _np
        import pandas as _pd

        for b in batches:
            if not len(b):
                continue
            ids = b["pqid"].to_numpy(dtype=_np.int64)
            order = _np.argsort(ids, kind="stable")       # id-asc tie-break
            ids = ids[order]
            lists = b["cid"].to_numpy(dtype=_np.int64)[order]
            C = _np.stack(
                [b[c].to_numpy(dtype=_np.int64)[order] for c in code_cols],
                axis=1,
            )
            out_q, out_id, out_d = [], [], []
            for qi in range(nq):
                sel = slot[qi][lists]                     # (n,) probe slot
                mask = sel >= 0
                if not mask.any():
                    continue
                sl = sel[mask]
                Cm = C[mask]
                adc = _np.zeros(len(sl), dtype=_np.float64)
                for s in range(mm):
                    adc += D[qi, sl, s, Cm[:, s]]
                adc = _np.floor(adc * 1e6 + 0.5) / 1e6    # HALF_UP to 6
                r = min(R, len(adc))
                top = _np.argsort(adc, kind="stable")[:r]
                out_q.append(_np.full(r, qids[qi]))
                out_id.append(ids[mask][top])
                out_d.append(adc[top])
            if not out_q:
                continue
            yield _pd.DataFrame(
                {
                    "qid_": _np.concatenate(out_q),
                    "pqid": _np.concatenate(out_id),
                    "adc": _np.concatenate(out_d),
                }
            )

    # the probed-lists filter is a pushable predicate: a code stream stored
    # partitioned by cid skips unprobed partitions before the scan runs
    cand = (
        enc_listed.select("pqid", "cid", *code_cols)
        .filter(F.col("cid").isin(probed_union))
        .mapInPandas(scan, "qid_ long, pqid long, adc double")
        .withColumnRenamed("qid_", query_id)
    )
    w = Window.partitionBy(query_id).orderBy(F.asc("adc"), F.asc("pqid"))
    ranked = cand.withColumn("rn", F.row_number().over(w))
    if rerank <= k:
        return ranked.filter(F.col("rn") <= k).select(
            query_id, F.col("pqid").alias(corpus_id), "adc",
            F.col("rn").alias("rank")
        )
    if corpus is None:
        raise ValueError("rerank needs the corpus vectors")
    cands = ranked.filter(F.col("rn") <= rerank).select(
        query_id, F.col("pqid").alias(corpus_id)
    )
    return _exact_rerank(queries, corpus, cands, k, query_id, query_vec,
                         corpus_id, corpus_vec)


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
    pairs = corpus.withColumn("__cn", norm(F.col(corpus_vec))).join(
        F.broadcast(probed.withColumn("__qn", norm(F.col(query_vec)))), list_col
    )
    scored = pairs.withColumn(
        "score",
        cosine_rounded_prenormed(
            F.col(query_vec), F.col(corpus_vec), F.col("__qn"), F.col("__cn")
        ),
    )
    return _scored_topk(scored, k, query_id, corpus_id)
