"""JBIG2 (ITU-T T.88) generic-region codec: MQ-coder round trips and
state-machine pins, generic-region round-trip identity (plain + TPGDON),
embedded segment-stream organization, the PDF /JBIG2Decode filter-chain
path incl. /JBIG2Globals, and compression sanity on text-like pages."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from pdf_parser_benchmark_spark.multimodal.jbig2 import (
    MQDecoder,
    MQEncoder,
    _new_cx,
    generic_region_decode,
    generic_region_encode,
    jbig2_decode,
    jbig2_embed_encode,
)


def _unpack_filter_output(out: bytes, w: int, h: int) -> np.ndarray:
    """Filter output (0 = black, byte-padded rows) back to a 1=black
    bitmap for comparison with the encoder input."""
    rowbytes = (w + 7) // 8
    packed = np.frombuffer(out, np.uint8).reshape(h, rowbytes)
    return 1 - np.unpackbits(packed, axis=1)[:, :w]


# --- MQ arithmetic coder ----------------------------------------------------


def test_mq_roundtrip_multicontext():
    rng = np.random.RandomState(0)
    for seed in range(6):
        rng = np.random.RandomState(seed)
        n = int(rng.randint(1, 4000))
        bits = (rng.rand(n) < rng.rand()).astype(int).tolist()
        ctxs = (rng.rand(n) * 19).astype(int).tolist()
        enc = MQEncoder()
        ci, cm = _new_cx()
        for b, c in zip(bits, ctxs):
            enc.encode(ci, cm, c, b)
        data = enc.flush()
        dec = MQDecoder(data)
        ci2, cm2 = _new_cx()
        assert [dec.decode(ci2, cm2, c) for c in ctxs] == bits


def test_mq_skewed_all_mps_compresses_hard():
    """10 000 identical MPS decisions in one context must land well under
    one bit per symbol once the state machine reaches the low-Qe states
    (T.88 Annex E adaptation) — pins that NMPS transitions actually run."""
    enc = MQEncoder()
    ci, cm = _new_cx()
    for _ in range(10_000):
        enc.encode(ci, cm, 0, 0)
    data = enc.flush()
    assert len(data) < 40  # ~0.03 bits/symbol; raw would be 1250 bytes
    dec = MQDecoder(data)
    ci2, cm2 = _new_cx()
    assert all(dec.decode(ci2, cm2, 0) == 0 for _ in range(10_000))


def test_mq_bytestuff_after_ff():
    """Encoded streams never contain 0xFF followed by a byte > 0x8F (the
    decoder's BYTEIN would mis-sync otherwise) — T.88 E.3.7 bit stuffing."""
    rng = np.random.RandomState(3)
    bits = (rng.rand(20_000) < 0.5).astype(int).tolist()
    enc = MQEncoder()
    ci, cm = _new_cx()
    for b in bits:
        enc.encode(ci, cm, 0x123, b)
    data = enc.flush()
    for i in range(len(data) - 1):
        if data[i] == 0xFF:
            assert data[i + 1] <= 0x8F


# --- generic region ---------------------------------------------------------


@pytest.mark.parametrize("tpgdon", [False, True])
def test_generic_region_roundtrip_shapes(tpgdon):
    rng = np.random.RandomState(42)
    images = [
        (rng.rand(40, 70) < 0.3).astype(np.uint8),
        np.zeros((32, 64), np.uint8),
        np.ones((32, 64), np.uint8),
        np.tile(np.array([[0, 1]], np.uint8), (33, 31))[:, :61],
        np.eye(50, 50, dtype=np.uint8),
    ]
    for img in images:
        enc = generic_region_encode(img, tpgdon=tpgdon)
        dec = generic_region_decode(
            enc, img.shape[1], img.shape[0], tpgdon=tpgdon
        )
        assert (dec == img).all()


@settings(max_examples=25, deadline=None)
@given(
    st.integers(0, 2**32 - 1),
    st.integers(1, 40),
    st.integers(1, 40),
    st.booleans(),
)
def test_generic_region_roundtrip_property(seed, w, h, tpgdon):
    rng = np.random.RandomState(seed)
    img = (rng.rand(h, w) < rng.rand()).astype(np.uint8)
    enc = generic_region_encode(img, tpgdon=tpgdon)
    assert (generic_region_decode(enc, w, h, tpgdon=tpgdon) == img).all()


def test_tpgdon_wins_on_repeated_rows():
    """TPGDON codes a repeated row as one SLTP decision. On a page tiling
    one high-entropy row the plain coder pays per-context adaptation on
    every repeat while TPGDON pays one decision per row — it must win by
    a wide margin (the reason scanner encoders enable it). Blank pages
    are NOT a discriminator: the adaptive MQ coder already drives those
    to ~9 bytes either way."""
    rng = np.random.RandomState(9)
    row = (rng.rand(128) < 0.5).astype(np.uint8)
    img = np.tile(row, (100, 1))
    plain = generic_region_encode(img, tpgdon=False)
    typ = generic_region_encode(img, tpgdon=True)
    assert len(typ) < len(plain) // 3


# --- embedded segment stream ------------------------------------------------


def test_embed_roundtrip_and_globals_split():
    rng = np.random.RandomState(7)
    img = (rng.rand(32, 64) < 0.25).astype(np.uint8)
    out = jbig2_decode(jbig2_embed_encode(img))
    assert (_unpack_filter_output(out, 64, 32) == img).all()
    g, s = jbig2_embed_encode(img, split_globals=True)
    out2 = jbig2_decode(s, globals_data=g)
    assert out2 == out


def test_decode_rejects_unsupported_segment_types():
    rng = np.random.RandomState(1)
    img = (rng.rand(8, 8) < 0.5).astype(np.uint8)
    data = bytearray(jbig2_embed_encode(img))
    data[4] = (data[4] & 0xC0) | 0  # retag page-info as symbol dictionary
    with pytest.raises(ValueError, match="unsupported"):
        jbig2_decode(bytes(data))


def test_decode_default_pixel_and_or_composite():
    """A page whose info segment sets default pixel 1 (black) stays black
    outside the region; an OR-composited all-white region must not clear
    it (T.88 §8.2 page defaults + external combination)."""
    import struct

    from pdf_parser_benchmark_spark.multimodal.jbig2 import _segment

    w = h = 16
    page_info = struct.pack(">IIIIBH", w, h, 0, 0, 0x05, 0)  # bit2 = 1
    region = generic_region_encode(np.zeros((8, 8), np.uint8), tpgdon=False)
    payload = (
        struct.pack(">IIIIB", 8, 8, 0, 0, 0)
        + b"\x00"
        + struct.pack("8b", 3, -1, -3, -1, 2, -2, -2, -2)
        + region
    )
    stream = _segment(1, 48, (), 1, page_info) + _segment(2, 39, (), 1, payload)
    out = _unpack_filter_output(jbig2_decode(stream), w, h)
    assert (out == 1).all()


# --- PDF filter chain -------------------------------------------------------


@pytest.mark.parametrize("tag", ["jbig2", "jbig2g"])
def test_pdf_jbig2_filter_chain(tag):
    from pdf_parser_benchmark_spark.extract.pdf_parser import PdfDocument
    from pdf_parser_benchmark_spark.synth.pdf_writer import (
        PageSpec,
        TextItem,
        build_pdf,
    )

    rng = np.random.RandomState(11)
    img = (rng.rand(32, 64) < 0.25).astype(np.uint8)
    data = jbig2_embed_encode(img, split_globals=(tag == "jbig2g"))
    pdf = build_pdf([
        PageSpec(items=[TextItem(50, 700, "scan")],
                 images=[(data, 64, 32, 1, tag)])
    ])
    imgs = PdfDocument(pdf).images()
    assert len(imgs) == 1
    _page, _name, w, h, nc, px = imgs[0]
    assert (w, h, nc) == (64, 32, 1)
    arr = np.frombuffer(px, np.uint8).reshape(32, 64)
    assert ((arr == 0).astype(np.uint8) == img).all()


def test_text_page_compresses_better_than_noise():
    """Structured text-like pages (the scanned-book case) must compress
    far better than 50% noise under the adaptive context model."""
    rng = np.random.RandomState(5)
    text = np.zeros((64, 128), np.uint8)
    for line in range(8):
        y = 3 + line * 7
        text[y : y + 2, 4 : 4 + int(rng.randint(60, 120))] = 1
    noise = (rng.rand(64, 128) < 0.5).astype(np.uint8)
    assert len(generic_region_encode(text)) < len(
        generic_region_encode(noise)
    ) // 3


def test_jbig2_and_g4_decode_to_identical_pixels():
    """The same bilevel page embedded via /CCITTFaxDecode and /JBIG2Decode
    must come out of the filter chain byte-identical — decoder-agreement
    pin across the two from-scratch scanned-document codecs."""
    from pdf_parser_benchmark_spark.extract.pdf_parser import PdfDocument
    from pdf_parser_benchmark_spark.multimodal.ccitt import ccittfax_encode
    from pdf_parser_benchmark_spark.synth.pdf_writer import (
        PageSpec,
        TextItem,
        build_pdf,
    )

    rng = np.random.RandomState(21)
    black = (rng.rand(32, 64) < 0.3).astype(np.uint8)  # 1 = black mask
    g4 = ccittfax_encode(1 - black)  # G4 path takes 0 = black samples
    jb = jbig2_embed_encode(black)  # JBIG2 takes 1 = black
    px = {}
    for tag, data in [("g4", g4), ("jbig2", jb)]:
        pdf = build_pdf([
            PageSpec(items=[TextItem(50, 700, "x")],
                     images=[(data, 64, 32, 1, tag)])
        ])
        (_pg, _nm, _w, _h, _nc, px[tag]), = PdfDocument(pdf).images()
    assert px["g4"] == px["jbig2"]
