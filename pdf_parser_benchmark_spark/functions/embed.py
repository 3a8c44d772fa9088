"""Deterministic feature-hash embeddings (replacement for the reference's
OpenAI embedding call F3, /root/reference/src/embed.py:95-99 — external
APIs are out of scope per the public-knowledge constraint).

Feature hashing (the "hashing trick", public literature: Weinberger et al.
2009) over word tokens: dim = md5(word) % D with ±1 sign from another hash
bit, L2-normalized. Vectorized numpy inside an Iterator pandas UDF; batch
size = Arrow batch (the reference batches at 100, TECHSPEC.md:88).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

DIM = 64  # matches the driver testdata embeddings table


def _embed_one(text: str, dim: int = DIM) -> list[float]:
    vec = np.zeros(dim, dtype=np.float64)
    for w in (text or "").lower().split():
        h = hashlib.md5(w.encode("utf-8")).digest()
        idx = int.from_bytes(h[:4], "big") % dim
        sign = 1.0 if h[4] & 1 else -1.0
        vec[idx] += sign
    n = float(np.linalg.norm(vec))
    if n > 0:
        vec /= n
    return [float(round(v, 6)) for v in vec]


@pandas_udf(T.ArrayType(T.FloatType()))
def hash_embedding(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for s in it:
        yield s.map(lambda t: _embed_one(t))
