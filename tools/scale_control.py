"""Pure-Python multiprocessing control for the 8→32 scaling pair.

The 8→32-core pinned pair saturates every core of this VM at the 4N
level; a framework-free control separates "Spark scales badly" from "the
hardware stops scaling". This runs the IDENTICAL extraction code
(extract_document on the same scale-corpus payloads) in N worker
processes with no Spark and no JVM, pinned the same way as the Spark
levels, and reports per-core throughput at each level. The 8→32
per-core ratio is the ceiling ANY framework can measure on this box —
real 4N executors are 4× separate machines and do not share clocks or
L3. Referenced by BENCH/BASELINE.md; run it in the same quiet window as
the level it contextualizes:

    taskset -c 0-7  python tools/scale_control.py 8  <corpus_dir>
    taskset -c 0-31 python tools/scale_control.py 32 <corpus_dir>

Prints one JSON line per run: docs, wall seconds, docs/s, docs/s/core.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOCS_PER_CORE = int(os.environ.get("CTRL_DOCS_PER_CORE", "700"))


def _work(args):
    rows, = args
    from pdf_parser_benchmark_spark.extract.assemble import extract_document

    n = 0
    for url, payload in rows:
        try:
            extract_document(url, payload)
        except Exception:
            pass
        n += 1
    return n


def main() -> None:
    cores = int(sys.argv[1])
    corpus = sys.argv[2]
    import pyarrow.dataset as ds

    table = ds.dataset(corpus).head(
        cores * DOCS_PER_CORE, columns=["url", "html"]
    )
    rows = list(zip(table["url"].to_pylist(), table["html"].to_pylist()))
    chunks = [rows[i::cores] for i in range(cores)]

    with mp.get_context("spawn").Pool(cores) as pool:
        pool.map(_work, [(c[: len(c) // 10],) for c in chunks])  # warm-up
        t0 = time.monotonic()
        done = pool.map(_work, [(c,) for c in chunks])
        wall = time.monotonic() - t0
    n = sum(done)
    print(json.dumps({
        "cores": cores,
        "docs": n,
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(n / wall, 1),
        "docs_per_sec_per_core": round(n / wall / cores, 2),
    }))


if __name__ == "__main__":
    main()
