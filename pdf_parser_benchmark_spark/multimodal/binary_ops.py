"""Multimodal (image/audio/video) columns for training-data pipelines.

Model: media is an opaque `binary` column + a typed metadata struct
(mime/width/height/duration), exactly like the pages table carries HTML/PDF
bytes. All heavy per-row work is Arrow-batched `mapInPandas` — the Spark
plumbing (schemas, batch iteration, partitioning) is real and tested.

The actual codec calls are STUBBED: this container has no image/audio
libraries (SURVEY.md §7), so `decode_image`/`decode_audio` raise
NotImplementedError unless `deterministic_fake=True`, which substitutes a
seeded, content-derived fake decode (stable bytes → stable features) so the
distributed plumbing is testable end-to-end. Swapping in PIL/ffmpeg on a
real cluster changes only the two `_decode_*_real` bodies.

Reference analog: the GPT-4o vision path rendered page PNGs and sent them
out-of-process (/root/reference/src/ingest.py:57-63,79-99); here the binary
→ feature step is in-process and vectorized.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id bigint, payload binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:int>"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id bigint, mime string, width int, height int, "
    "feat array<float>, decode_error string"
)

FEAT_DIM = 16


def _decode_image_real(payload: bytes):
    raise NotImplementedError(
        "image codecs not available in this container; run with "
        "deterministic_fake=True or install PIL on the cluster"
    )


def _decode_image_fake(payload: bytes) -> np.ndarray:
    """Deterministic stand-in: 'pixels' derived from a sha256 stream of the
    payload — stable bytes→features, so tests can assert exact values."""
    h = hashlib.sha256(payload).digest()
    raw = (h * ((FEAT_DIM * 4) // len(h) + 1))[: FEAT_DIM * 4]
    arr = np.frombuffer(raw, dtype=np.uint32).astype(np.float64)
    return (arr % 1000) / 1000.0


def image_features(
    media: DataFrame, deterministic_fake: bool = False
) -> DataFrame:
    """binary → FEAT_DIM feature vector, Arrow-batched, poison-tolerant."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _decode_image_fake if deterministic_fake else _decode_image_real
        for b in batches:
            out = []
            for mid, payload, meta in zip(b["media_id"], b["payload"], b["meta"]):
                rec = {
                    "media_id": int(mid),
                    "mime": meta["mime"] if meta is not None else None,
                    "width": meta["width"] if meta is not None else None,
                    "height": meta["height"] if meta is not None else None,
                    "feat": None,
                    "decode_error": None,
                }
                try:
                    vec = decode(bytes(payload))
                    rec["feat"] = [float(round(v, 6)) for v in vec]
                except Exception as e:
                    rec["decode_error"] = f"{type(e).__name__}: {e}"[:200]
                out.append(rec)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms) —
    pure built-ins (sequence+explode); the decode of each frame would go
    through image_features. Shows the explode-then-decode shape without
    codecs."""
    return media.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
