"""CCITT Group 4 (ITU-T T.6) codec: round-trip identity, spec-derived bit
pins, the PDF /CCITTFaxDecode filter-chain path, and the JPEG segment-parser
robustness fixes that share the marker-stream discipline (ADVICE r5)."""

import hashlib

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from pdf_parser_benchmark_spark.multimodal.ccitt import (
    ccittfax_decode,
    ccittfax_encode,
    g4_decode,
    g4_encode,
)


def test_all_white_matches_hand_derived_spec_bits():
    """8×8 all-white: each row is V0 (a1 = b1 = 8, one '1' bit) → 0xFF,
    then EOFB (two 12-bit EOLs) padded: 0x00 0x10 0x01. Derived by hand
    from T.6 §2.2 + T.4 §4.1.3 — pins the bit-level conventions
    independent of the decoder."""
    assert g4_encode(np.zeros((8, 8), dtype=np.uint8)).hex() == "ff001001"


def test_vertical_pass_horizontal_modes_roundtrip():
    """A shape exercising every mode: wide black block (horizontal runs on
    row entry), drifting edges (vertical ±1..3), an interior white gap
    that closes (pass mode on the row after it ends)."""
    img = np.zeros((20, 80), dtype=np.uint8)
    img[2:18, 10:60] = 1
    img[4:16, 30:34] = 0  # interior gap → pass mode when it closes
    for y in range(5, 15):  # drifting right edge → vertical modes
        img[y, 60 : 60 + (y % 4)] = 1
    out = g4_decode(g4_encode(img), 80, 20)
    assert np.array_equal(out, img)


def test_checkerboard_and_extremes_roundtrip():
    for img in (
        np.indices((9, 17)).sum(axis=0) % 2,  # checkerboard: all-H rows
        np.ones((5, 64), dtype=np.uint8),  # all black
        np.zeros((3, 1), dtype=np.uint8),  # 1-px wide
        np.ones((1, 2561), dtype=np.uint8),  # run beyond ext make-ups
    ):
        img = img.astype(np.uint8)
        out = g4_decode(g4_encode(img), img.shape[1], img.shape[0])
        assert np.array_equal(out, img), img.shape


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 2**63 - 1), st.integers(1, 40), st.integers(1, 90),
       st.floats(0.05, 0.95))
def test_random_bitmaps_roundtrip(seed, h, w, density):
    rng = np.random.default_rng(seed)
    img = (rng.random((h, w)) < density).astype(np.uint8)
    assert np.array_equal(g4_decode(g4_encode(img), w, h), img)


def test_pdf_surface_packs_rows_and_maps_black_is_1():
    rng = np.random.default_rng(3)
    img = (rng.random((16, 20)) < 0.5).astype(np.uint8)  # 0 = black sense
    enc = ccittfax_encode(img)
    assert ccittfax_decode(enc, columns=20, rows=16) == np.packbits(
        img, axis=1
    ).tobytes()
    # BlackIs1 true: 1 bits are black — same stream, inverted sample sense
    enc1 = ccittfax_encode(1 - img, black_is_1=True)
    assert enc1 == enc  # the G4 payload encodes the same black pixels
    assert ccittfax_decode(
        enc1, columns=20, rows=16, black_is_1=True
    ) == np.packbits(1 - img, axis=1).tobytes()
    with pytest.raises(ValueError, match="G4"):
        ccittfax_decode(enc, columns=20, k=0)


def test_pdf_embed_parse_decode_end_to_end():
    """writer → /CCITTFaxDecode image XObject → PdfDocument.images():
    decoded 1-bit samples come back expanded to 0/255 gray, ncomp=1,
    byte-exact vs the source bitmap."""
    from pdf_parser_benchmark_spark.extract.pdf_parser import PdfDocument
    from pdf_parser_benchmark_spark.synth.pdf_writer import (
        PageSpec,
        TextItem,
        build_pdf,
    )

    # structured text-like page (0 = black): G4 targets scans, not noise
    img = np.ones((32, 64), dtype=np.uint8)
    for line in range(5):
        y = 3 + line * 6
        img[y : y + 2, 4 + line : 50 - 2 * line] = 0
    g4 = ccittfax_encode(img)
    data = build_pdf(
        [PageSpec(items=[TextItem(50, 700, "scan")], images=[(g4, 64, 32, 1, "g4")])]
    )
    images = PdfDocument(data).images()
    assert len(images) == 1
    page, name, w, h, nc, px = images[0]
    assert (w, h, nc) == (64, 32, 1)
    assert px == (img * np.uint8(255)).tobytes()
    # and the G4 stream is actually compressing the scan-like data
    assert len(g4) < 64 * 32 // 8


def test_jpeg_marker_fill_bytes_and_tem(tmp_path):
    """ADVICE r5 probe: 0xFF fill padding before a marker (B.1.1.2) and a
    standalone TEM (0x01) marker must not desync the segment parse."""
    from pdf_parser_benchmark_spark.multimodal.jpeg import (
        jpeg_decode,
        jpeg_encode,
    )

    img = np.frombuffer(
        hashlib.sha256(b"fill").digest() * 8, dtype=np.uint8
    )[:256].reshape(16, 16)
    jpg = jpeg_encode(img, quality=85)
    base = jpeg_decode(jpg)
    # inject a fill byte and a TEM right after SOI
    patched = jpg[:2] + b"\xff" + b"\xff\x01" + jpg[2:]
    assert np.array_equal(jpeg_decode(patched), base)
