"""Deterministic clustered vector corpus for honest-scale ANN quality
measurement (VERDICT r3 item 7: fixture-scale recall is trivially high; the
contract worth pinning is recall@10 over ~10⁵ clustered vectors, where a
bad probe or quantizer genuinely loses neighbors).

Shape mirrors the testdata `embeddings` table (vec_id, label, embedding) so
every kNN operator runs unchanged. Vectors are unit-norm draws around
well-separated cluster centers:

    embedding(id) = normalize(center[id % n_clusters] + sigma * noise(id))

Noise is per-(kind, key)-seeded (`RandomState(seed ^ (2*key+kind))` — see
`_noise`), so any subset of rows is reproducible independent of
partitioning — the same discipline as the pages corpus — and corpus rows
can never alias a query's noise draw. Generation runs distributed via mapInPandas over
spark.range (never a driver-side materialization): 10⁸ vectors would
generate the same way, partitioned by range.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

VECTORS_VERSION = 3  # v3: structurally disjoint noise-key spaces (ADVICE r4)

VEC_SCHEMA = "vec_id long, label int, embedding array<float>"

# noise-key kinds: corpus rows and query base vectors draw from disjoint key
# spaces BY CONSTRUCTION (even/odd split below), not by offset — the v2
# scheme keyed queries at 0x5EED+qi, which aliased the corpus row with
# vec_id == 0x5EED+qi to the identical noise draw (ADVICE r4: a silent
# ground-truth bias hole if sigma grew or n shrank).
_KIND_CORPUS = 0
_KIND_QUERY = 1


def _centers(seed: int, n_clusters: int, dim: int) -> np.ndarray:
    rs = np.random.RandomState(seed)
    c = rs.standard_normal((n_clusters, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def _noise(seed: int, kind: int, key: int, dim: int) -> np.ndarray:
    """Per-(kind, key) noise: key spaces of different kinds can never
    collide — the combined key is 2*key+kind, so corpus keys are even and
    query keys odd for every possible key value."""
    mixed = (int(seed) ^ (2 * int(key) + int(kind))) & 0x7FFFFFFF
    return np.random.RandomState(mixed).standard_normal(dim)


def _query_raw(seed: int, qi: int, centers: np.ndarray, sigma: float) -> np.ndarray:
    dim = centers.shape[1]
    return centers[qi % len(centers)] + sigma * _noise(seed, _KIND_QUERY, qi, dim)


def generate_clustered_vectors(
    spark,
    n: int,
    dim: int = 64,
    n_clusters: int = 16,
    sigma: float = 0.25,
    seed: int = 7,
    partitions: int | None = None,
    planted_queries: int = 0,
    planted_per_query: int = 10,
    planted_delta: float = 0.01,
) -> DataFrame:
    """→ (vec_id, label, embedding) with `n` unit-norm base vectors in
    `n_clusters` well-separated clusters. label = vec_id % n_clusters, so
    the k lowest ids cover every cluster — which makes kmeans_fit's
    lowest-id init one seed per true cluster.

    With planted_queries > 0, `planted_queries * planted_per_query` EXTRA
    rows (ids n ..) are near-duplicates of the held-out query vectors from
    `planted_queries_df` (displacement `planted_delta` ≪ cluster sigma):
    each query's exact top-`planted_per_query` neighbors are its planted
    rows. This is the ground-truth structure that makes recall@k a real
    measurement — in a pure cluster cloud the true neighbors differ only
    by noise, which any quantizer is allowed to destroy."""
    centers = _centers(seed, n_clusters, dim)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs = np.empty((len(ids), dim))
            labels = np.empty(len(ids), dtype=np.int32)
            for i, vid in enumerate(ids):
                vid = int(vid)
                if vid < n:
                    lab = vid % n_clusters
                    v = centers[lab] + sigma * _noise(seed, _KIND_CORPUS, vid, dim)
                else:
                    qi = (vid - n) // planted_per_query
                    lab = qi % n_clusters
                    v = _query_raw(seed, qi, centers, sigma)
                    v = v + planted_delta * _noise(seed, _KIND_CORPUS, vid, dim)
                vecs[i], labels[i] = v, lab
            vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
            yield pdf.assign(
                label=labels,
                embedding=[v.astype(np.float32) for v in vecs],
            ).rename(columns={"id": "vec_id"})

    total = n + planted_queries * planted_per_query
    base = spark.range(
        total, numPartitions=partitions or spark.sparkContext.defaultParallelism
    )
    return base.mapInPandas(gen, VEC_SCHEMA)


def planted_queries_df(
    spark,
    n_queries: int,
    dim: int = 64,
    n_clusters: int = 16,
    sigma: float = 0.25,
    seed: int = 7,
) -> DataFrame:
    """→ (qid, qvec): the held-out query vectors whose planted
    near-duplicates `generate_clustered_vectors(..., planted_queries=...)`
    inserted into the corpus. Driver-side build — n_queries is small."""
    centers = _centers(seed, n_clusters, dim)
    rows = []
    for qi in range(n_queries):
        v = _query_raw(seed, qi, centers, sigma)
        v = v / np.linalg.norm(v)
        rows.append((qi, [float(x) for x in v.astype(np.float32)]))
    return spark.createDataFrame(rows, "qid long, qvec array<float>")


def ensure_vector_corpus(
    spark,
    n: int,
    dim: int = 64,
    n_clusters: int = 16,
    seed: int = 7,
    planted_queries: int = 0,
) -> str:
    """Materialize once to /tmp parquet (shared by tests and bench)."""
    import os

    path = (
        f"/tmp/spark_graft_vectors_v{VECTORS_VERSION}"
        f"_n{n}_d{dim}_c{n_clusters}_s{seed}_q{planted_queries}"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        generate_clustered_vectors(
            spark, n, dim=dim, n_clusters=n_clusters, seed=seed,
            planted_queries=planted_queries,
        ).write.mode("overwrite").parquet(path)
    return path
