"""PDF stream filters beyond FlateDecode: LZW, RunLength, ASCIIHex,
ASCII85 — decoders verified against hand-built encoders, plus full-document
parses with each filter on the content stream."""

import base64
import re

from pdf_parser_benchmark_spark.extract.pdf_parser import (
    _ascii85_decode,
    _ascii_hex_decode,
    _lzw_decode,
    _rle_decode,
    parse_pdf,
)
from pdf_parser_benchmark_spark.synth.pdf_writer import build_pdf, lines_page


def _lzw_encode(data: bytes) -> bytes:
    """Minimal PDF-flavor LZW encoder (EarlyChange=1) for test vectors."""
    CLEAR, EOD = 256, 257
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out_bits: list[tuple[int, int]] = [(CLEAR, width)]
    w = b""
    for byte in data:
        c = bytes([byte])
        if w + c in table:
            w = w + c
            continue
        out_bits.append((table[w], width))
        table[w + c] = next_code
        next_code += 1
        if next_code + 1 > (1 << width) and width < 12:
            width += 1
        w = c
    if w:
        out_bits.append((table[w], width))
    out_bits.append((EOD, width))
    acc = nbits = 0
    buf = bytearray()
    for code, wd in out_bits:
        acc = (acc << wd) | code
        nbits += wd
        while nbits >= 8:
            buf.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        buf.append((acc << (8 - nbits)) & 0xFF)
    return bytes(buf)


def test_lzw_roundtrip():
    for payload in (b"abc", b"aaaaaaaaaabbbbbbbb", b"BT (x) Tj ET " * 40,
                    bytes(range(256)) * 3):
        assert _lzw_decode(_lzw_encode(payload)) == payload


def test_rle_roundtrip():
    enc = bytes([2]) + b"abc" + bytes([254]) + b"z" + bytes([128])
    assert _rle_decode(enc) == b"abc" + b"z" * 3


def test_ascii_hex():
    assert _ascii_hex_decode(b"48 65 6C 6C 6F>") == b"Hello"
    assert _ascii_hex_decode(b"486>") == b"H`"  # odd digit padded with 0


def test_ascii85():
    body = base64.a85encode(b"some binary \x00\xff data")
    assert _ascii85_decode(body + b"~>") == b"some binary \x00\xff data"


def _swap_content_filter(pdf: bytes, raw_old: bytes, new_body: bytes, filt: bytes) -> bytes:
    """Replace the uncompressed content stream with a filtered encoding."""
    old = (
        b"<< /Length %d >>\nstream\n" % len(raw_old) + raw_old + b"\nendstream"
    )
    new = (
        b"<< /Length %d /Filter %s >>\nstream\n" % (len(new_body), filt)
        + new_body
        + b"\nendstream"
    )
    assert old in pdf
    return pdf.replace(old, new)


def _uncompressed_content(pdf: bytes) -> bytes:
    m = re.search(
        rb"<< /Length \d+ >>\nstream\n(BT.*?ET)\nendstream", pdf, re.S
    )
    return m.group(1)


def test_full_parse_with_each_filter():
    base = build_pdf([lines_page(["filtered body line"], compress=False)])
    raw = _uncompressed_content(base)
    want = [b.text() for b in parse_pdf(base)[0].blocks]

    variants = [
        (_lzw_encode(raw), b"/LZWDecode"),
        (base64.a85encode(raw) + b"~>", b"/ASCII85Decode"),
        (raw.hex().encode() + b">", b"/ASCIIHexDecode"),
    ]
    for body, filt in variants:
        pdf = _swap_content_filter(base, raw, body, filt)
        got = [b.text() for b in parse_pdf(pdf)[0].blocks]
        assert got == want, filt
