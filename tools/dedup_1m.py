"""1M-document MinHash near-dup lane (VERDICT r5 item 5: ANN has honest
scale lanes at 100k/1M; the dedup suite was benched only at 24k docs).

Generates (once, cached in /tmp) a 1,000,000-document text corpus with
PLANTED near-duplicates — every (10j, 10j+1) pair shares 78 of 80 words,
Jaccard ≈ 0.86 over 3-shingles, comfortably over the 0.7 verify threshold;
all other documents draw words from a 2^22 vocabulary so cross-pair
collisions are negligible — then times the production xxhash64 lane
(minhash_dedup_pairs: in-row signature fold → banded LSH self-join →
semi-join-restricted exact-Jaccard verify, exactly q:minhash_neardup_xx's
shape) end-to-end and reports wall time, candidate/verified counts and
recall on the planted pairs.

Usage: python tools/dedup_1m.py   (quiet window; VM noise ±30%)
Writes /tmp/dedup_1m.json and prints one JSON line; paste results into
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

N = int(os.environ.get("DEDUP_N", "1000000"))
WORDS = 80
VOCAB = 1 << 22
CORPUS_VERSION = 1


def ensure_text_corpus(spark) -> str:
    path = f"/tmp/spark_graft_dedup_v{CORPUS_VERSION}_{N}"
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path

    def gen(batches):
        import numpy as np
        import pandas as pd

        def mix(x):
            # splitmix64-style integer hash, vectorized
            x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
            x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
            x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
            return x ^ (x >> 31)

        for b in batches:
            ids = b["id"].to_numpy(dtype=np.uint64)
            # near-dup rows (id % 10 == 1) copy row id-1's words…
            base = np.where(ids % 10 == 1, ids - 1, ids)
            W = (
                mix(base[:, None] * np.uint64(WORDS)
                    + np.arange(WORDS, dtype=np.uint64)[None, :])
                % np.uint64(VOCAB)
            )
            # …then replace two hash-chosen positions with fresh words
            dup = ids % 10 == 1
            if dup.any():
                di = np.nonzero(dup)[0]
                p1 = (mix(ids[di]) % np.uint64(WORDS)).astype(np.int64)
                p2 = (mix(ids[di] + np.uint64(1)) % np.uint64(WORDS)).astype(
                    np.int64
                )
                W[di, p1] = np.uint64(VOCAB) + mix(ids[di]) % np.uint64(VOCAB)
                W[di, p2] = (
                    np.uint64(2 * VOCAB) + mix(ids[di] + np.uint64(2))
                    % np.uint64(VOCAB)
                )
            texts = [" ".join(f"w{int(w):07d}" for w in row) for row in W]
            yield pd.DataFrame({"doc_id": ids.astype(np.int64), "text": texts})

    spark.range(N, numPartitions=256).mapInPandas(
        gen, "doc_id long, text string"
    ).write.mode("overwrite").parquet(path)
    return path


def main() -> int:
    from pdf_parser_benchmark_spark.operators.dedup import (
        minhash_dedup_pairs,
        release_intermediates,
    )
    from pdf_parser_benchmark_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(cpus=32, extra_conf={"spark.ui.showConsoleProgress": "false"})
    t0 = time.monotonic()
    path = ensure_text_corpus(spark)
    docs = spark.read.parquet(path)
    n_docs = docs.count()
    t_gen = time.monotonic() - t0

    t0 = time.monotonic()
    pairs = minhash_dedup_pairs(
        docs, "doc_id", "text", threshold=0.7, hash_fn="xxhash64"
    ).persist()
    n_pairs = pairs.count()
    t_dedup = time.monotonic() - t0

    planted = n_docs // 10
    hits = pairs.filter(
        (F.col("id_a") % 10 == 0) & (F.col("id_b") == F.col("id_a") + 1)
    ).count()
    false_pos = n_pairs - hits
    pairs.unpersist()
    release_intermediates()

    # candidate-stage count (untimed second pass — the wrapper's internal
    # candidate frame is scoped; the headline timing above stays one-shot)
    from pdf_parser_benchmark_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signature,
    )

    sig = minhash_signature(docs, "doc_id", "text", hash_fn="xxhash64")
    n_cands = lsh_candidate_pairs(sig).count()
    release_intermediates()

    out = {
        "n_docs": n_docs,
        "words_per_doc": WORDS,
        "corpus_gen_or_read_sec": round(t_gen, 1),
        "minhash_xx_end_to_end_sec": round(t_dedup, 2),
        "docs_per_sec": round(n_docs / t_dedup, 1),
        "lsh_candidate_pairs": n_cands,
        "verified_pairs": n_pairs,
        "planted_pairs": planted,
        "planted_recall": round(hits / planted, 4),
        "non_planted_pairs": false_pos,
    }
    print(json.dumps(out))
    open("/tmp/dedup_1m.json", "w").write(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
