"""Multimodal binary-column plumbing: schema, Arrow batching, poison
tolerance, deterministic fake decode, frame-sample plan."""

import pytest
from pyspark.sql import functions as F

from pdf_parser_benchmark_spark.multimodal.binary_ops import (
    MEDIA_SCHEMA,
    frame_sample_plan,
    image_features,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"\x89PNG fake bytes 1", ("image/png", 64, 48, 0)),
        (2, b"\x89PNG fake bytes 2", ("image/png", 32, 32, 0)),
        (3, b"RIFF fake wav", ("audio/wav", 0, 0, 5500)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_fake_decode_deterministic(spark, media):
    a = image_features(media, deterministic_fake=True).collect()
    b = image_features(media, deterministic_fake=True).collect()
    fa = {r["media_id"]: r["feat"] for r in a}
    fb = {r["media_id"]: r["feat"] for r in b}
    assert fa == fb
    assert all(len(v) == 16 for v in fa.values())
    assert fa[1] != fa[2]  # content-derived


def test_real_decode_stubbed_as_error_rows(spark, media):
    out = image_features(media, deterministic_fake=False).collect()
    assert all(r["decode_error"] is not None for r in out)
    assert all("NotImplementedError" in r["decode_error"] for r in out)
    assert all(r["feat"] is None for r in out)


def test_metadata_passthrough(spark, media):
    out = {r["media_id"]: r for r in image_features(media, True).collect()}
    assert out[1]["mime"] == "image/png" and out[1]["width"] == 64
    assert out[3]["mime"] == "audio/wav"


def test_frame_sample_plan(spark, media):
    plan = frame_sample_plan(media, every_ms=1000)
    got = {
        (r["media_id"], r["frame_ts_ms"]) for r in plan.collect()
    }
    # 5500ms video → frames at 0..5000; images (duration 0) → single frame 0
    assert {(3, t) for t in (0, 1000, 2000, 3000, 4000, 5000)} <= got
    assert (1, 0) in got and (1, 1000) not in got
