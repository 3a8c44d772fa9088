"""1M-document curation-funnel lane: the composed tier-extraction pipeline
(lang → Gopher → C4 → prefix-dedup → CCNet perplexity tiers,
operators/curation.py:curation_funnel) timed end-to-end at 1,000,000
synthetic web documents.

Corpus (generated once, cached in /tmp, splitmix64-deterministic):
- 60 words/doc from a 2^16 vocabulary (so the perplexity LM has reusable
  counts and the tier stage is meaningful);
- lang ∈ {en, de, fr, es, zh} by id%5 with en on 2/5 (lang stage live);
- 'the' injected for id%3 != 0 (Gopher's stop-word rule live both ways);
- the C4 trigger phrases key off doc_id moduli inside c4_lines (live);
- ids ≡ 10 (mod 1000) copy the 3-token prefix of id-10 (same id%5 ⇒ same
  lang ⇒ the dup stage is live).

Usage: python tools/curation_1m.py   (quiet window; VM noise ±30%)
Writes /tmp/curation_1m.json and prints one JSON line; paste results into
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

N = int(os.environ.get("CURATION_N", "1000000"))
WORDS = 60
VOCAB = 1 << 16
CORPUS_VERSION = 2


def ensure_corpus(spark) -> str:
    path = f"/tmp/spark_graft_curation_v{CORPUS_VERSION}_{N}"
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path

    def gen(batches):
        import numpy as np
        import pandas as pd

        def mix(x):
            x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
            x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
            x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
            return x ^ (x >> 31)

        langs = ["en", "de", "en", "fr", "es"]
        for b in batches:
            ids = b["id"].to_numpy(dtype=np.uint64)
            w = (
                mix(ids[:, None] * np.uint64(WORDS)
                    + np.arange(WORDS, dtype=np.uint64)[None, :])
                % np.uint64(VOCAB)
            )
            # prefix-dup rows copy doc id-10's first 3 words (both ids
            # share id%5, so both land on the same lang and the dup can
            # survive to the dedup stage)
            dup = ids % 1000 == 10
            if dup.any():
                di = np.nonzero(dup)[0]
                prev = (
                    mix((ids[di] - 10)[:, None] * np.uint64(WORDS)
                        + np.arange(3, dtype=np.uint64)[None, :])
                    % np.uint64(VOCAB)
                )
                w[di, :3] = prev
            texts = []
            for row_id, row in zip(ids, w):
                toks = [f"w{int(x):05d}" for x in row]
                if row_id % 3 != 0:
                    toks[5] = "the"
                texts.append(" ".join(toks))
            yield pd.DataFrame({
                "doc_id": ids.astype(np.int64),
                "text": texts,
                "lang": [langs[int(i) % 5] for i in ids],
            })

    spark.range(N, numPartitions=256).mapInPandas(
        gen, "doc_id long, text string, lang string"
    ).write.mode("overwrite").parquet(path)
    return path


def main() -> int:
    from pdf_parser_benchmark_spark.operators.curation import curation_funnel
    from pdf_parser_benchmark_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(
        cpus=32, extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    t0 = time.monotonic()
    path = ensure_corpus(spark)
    docs = spark.read.parquet(path)
    n_docs = docs.count()
    t_gen = time.monotonic() - t0

    t0 = time.monotonic()
    out_df = curation_funnel(docs).persist()
    stages = {
        r["stage"]: r["cnt"]
        for r in out_df.groupBy("stage").agg(
            F.count("*").alias("cnt")).collect()
    }
    tiers = {
        r["tier"]: r["cnt"]
        for r in out_df.filter(F.col("tier").isNotNull())
        .groupBy("tier").agg(F.count("*").alias("cnt")).collect()
    }
    t_run = time.monotonic() - t0
    out_df.unpersist()

    out = {
        "n_docs": n_docs,
        "words_per_doc": WORDS,
        "corpus_gen_or_read_sec": round(t_gen, 1),
        "funnel_end_to_end_sec": round(t_run, 2),
        "docs_per_sec": round(n_docs / t_run, 1),
        "stages": stages,
        "tiers": tiers,
    }
    print(json.dumps(out))
    open("/tmp/curation_1m.json", "w").write(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
