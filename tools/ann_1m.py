"""1M-vector ANN lane (ROADMAP item: '1M-vector lane worth it if budget
allows' — affordable since the r5 vectorized training). Generates (once) a
1,000,000-vector clustered corpus with planted ground truth, then measures
recall@10 + wall time for IVF(nprobe=4) and OPQ/PQ two-stage search from a
train-once index. Ground truth is the planted construction, so no brute
force over 1M vectors is needed to score recall.

Usage: python tools/ann_1m.py   (run in a quiet window; VM noise ±30%)
Writes /tmp/ann_1m.json and prints one JSON line; paste results into
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    from pdf_parser_benchmark_spark.operators.knn import (
        ivf_topk_kmeans,
        ivfpq_fit,
        ivfpq_topk,
        pq_fit,
        pq_topk_lut,
    )
    from pdf_parser_benchmark_spark.session import get_spark
    from pdf_parser_benchmark_spark.synth.vectors import (
        ensure_vector_corpus,
        planted_queries_df,
    )

    AN, AD, AC, AK, ANQ, PPQ = 1_000_000, 64, 64, 10, 20, 10
    spark = get_spark(cpus=32, extra_conf={"spark.ui.showConsoleProgress": "false"})
    t0 = time.monotonic()
    corpus = spark.read.parquet(
        ensure_vector_corpus(spark, AN, dim=AD, n_clusters=AC, planted_queries=ANQ)
    ).persist()
    corpus.count()
    t_gen = time.monotonic() - t0
    queries = planted_queries_df(spark, ANQ, dim=AD, n_clusters=AC).persist()
    queries.count()

    # planted ground truth: query qi's true top-PPQ are exactly rows
    # AN + qi*PPQ .. AN + (qi+1)*PPQ - 1 (see synth/vectors.py)
    def recall(approx_df) -> float:
        rows = approx_df.select("qid", "vec_id").collect()
        hits = sum(
            1
            for r in rows
            if AN + int(r["qid"]) * PPQ <= int(r["vec_id"]) < AN + (int(r["qid"]) + 1) * PPQ
        )
        return round(hits / (ANQ * AK), 3)

    t0 = time.monotonic()
    ivf = ivf_topk_kmeans(
        queries, corpus, k=AK, nprobe=4, n_lists=AC, iterations=4
    ).persist()
    ivf.count()
    t_ivf = time.monotonic() - t0
    r_ivf = recall(ivf)
    ivf.unpersist()

    t0 = time.monotonic()
    cb, enc = pq_fit(corpus, m=8, dim=AD, k=16, iterations=3)
    cb, enc = cb.persist(), enc.persist()
    enc.count(), cb.count()
    t_train = time.monotonic() - t0
    t0 = time.monotonic()
    pq = pq_topk_lut(
        queries, corpus, k=AK, m=8, dim=AD, codes=16, rerank=100,
        codebooks=cb, encoded=enc,
    ).persist()
    pq.count()
    t_pq = time.monotonic() - t0
    r_pq = recall(pq)
    pq.unpersist()

    # composed IVF×PQ (VERDICT r5 item 3): coarse prune to nprobe of
    # n_lists, residual-PQ LUT scan restricted to the probed lists, exact
    # rerank — must beat the full-code-stream PQ scan above at >=0.9 recall
    t0 = time.monotonic()
    index = ivfpq_fit(
        corpus, n_lists=AC, m=8, dim=AD, codes=16, coarse_iterations=4,
        pq_iterations=3,
    )
    coarse, icb, ienc = index
    icb, ienc = icb.persist(), ienc.persist()
    ienc.count(), icb.count()
    t_itrain = time.monotonic() - t0
    t0 = time.monotonic()
    ivfpq = ivfpq_topk(
        queries, corpus, k=AK, nprobe=4, m=8, dim=AD, codes=16, rerank=100,
        index=(coarse, icb, ienc),
    ).persist()
    ivfpq.count()
    t_ivfpq = time.monotonic() - t0
    r_ivfpq = recall(ivfpq)
    ivfpq.unpersist()

    out = {
        "n": AN, "dim": AD, "n_lists": AC, "k": AK,
        "corpus_gen_or_read_sec": round(t_gen, 1),
        "ivf_nprobe4_sec": round(t_ivf, 2), "ivf_recall_at_10": r_ivf,
        "pq_train_sec": round(t_train, 2), "pq_rerank_sec": round(t_pq, 2),
        "pq_recall_at_10": r_pq,
        "ivfpq_train_sec": round(t_itrain, 2),
        "ivfpq_nprobe4_sec": round(t_ivfpq, 2),
        "ivfpq_recall_at_10": r_ivfpq,
    }
    print(json.dumps(out))
    open("/tmp/ann_1m.json", "w").write(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
