"""From-scratch PDF parser vs from-scratch writer round trips.

The writer emits a controlled but spec-faithful PDF subset
(synth/pdf_writer.py); these tests pin the parser's structure handling:
xref/objects, FlateDecode, ToUnicode CMap, text operators, XY-cut reading
order, rotation detection (reference semantics
/root/reference/src/ingest.py:47-54).
"""

from pdf_parser_benchmark_spark.extract.pdf_parser import (
    is_pdf,
    parse_pdf,
    parse_tounicode,
)
from pdf_parser_benchmark_spark.synth.pdf_writer import (
    PageSpec,
    TextItem,
    build_pdf,
    lines_page,
    two_column_page,
)


def _texts(page):
    return [b.text() for b in page.blocks]


def test_is_pdf_magic():
    assert is_pdf(b"%PDF-1.4\n...")
    assert not is_pdf(b"<html></html>")


def test_single_page_lines_and_order():
    pdf = build_pdf([lines_page(["alpha one", "beta two"], heading="Head")])
    pages = parse_pdf(pdf)
    assert len(pages) == 1
    blocks = pages[0].blocks
    assert blocks[0].lines == ["Head"] and blocks[0].max_size == 18
    assert blocks[1].lines == ["alpha one", "beta two"]


def test_flate_and_uncompressed_equal():
    a = parse_pdf(build_pdf([lines_page(["same text"], compress=True)]))
    b = parse_pdf(build_pdf([lines_page(["same text"], compress=False)]))
    assert _texts(a[0]) == _texts(b[0])


def test_tj_array_and_tm_positioning():
    pdf = build_pdf(
        [
            lines_page(["part one part two"], use_tj_array=True),
            lines_page(["tm line"], use_tm=True),
        ]
    )
    pages = parse_pdf(pdf)
    assert _texts(pages[0]) == ["part one part two"]
    assert _texts(pages[1]) == ["tm line"]


def test_tounicode_cmap_decodes_non_ascii():
    pdf = build_pdf([lines_page(["café Ω x"], font="F2")])
    pages = parse_pdf(pdf)
    assert _texts(pages[0]) == ["café Ω x"]


def test_bfrange_parsing():
    cmap = b"""
1 begincodespacerange
<00> <FF>
endcodespacerange
1 beginbfrange
<41> <43> <0061>
endbfrange
"""
    table, code_bytes = parse_tounicode(cmap)
    assert table[0x41] == "a" and table[0x42] == "b" and table[0x43] == "c"
    assert code_bytes == 1


def test_rotation_detected():
    pdf = build_pdf(
        [lines_page(["portrait"]), lines_page(["landscape"], rotate=90),
         lines_page(["landscape2"], rotate=270)]
    )
    pages = parse_pdf(pdf)
    assert [p.rotation for p in pages] == [0, 90, 270]
    # rotated pages still decode text
    assert _texts(pages[1]) == ["landscape"]
    assert _texts(pages[2]) == ["landscape2"]


def test_two_column_xy_cut_reading_order():
    pdf = build_pdf(
        [two_column_page(["L1", "L2", "L3"], ["R1", "R2"], header="HDR")]
    )
    page = parse_pdf(pdf)[0]
    assert _texts(page) == ["HDR", "L1\nL2\nL3", "R1\nR2"]


def test_header_footer_separate_blocks():
    pdf = build_pdf(
        [lines_page(["body a", "body b"], header="TOP", footer="BOTTOM")]
    )
    page = parse_pdf(pdf)[0]
    assert _texts(page) == ["TOP", "body a\nbody b", "BOTTOM"]


def test_escaped_parens_in_string():
    pdf = build_pdf([lines_page(["with (parens) and \\ backslash"])])
    assert _texts(parse_pdf(pdf)[0]) == ["with (parens) and \\ backslash"]


def test_multi_content_and_page_count():
    specs = [lines_page([f"page {i} body"]) for i in range(6)]
    pages = parse_pdf(build_pdf(specs))
    assert len(pages) == 6
    assert _texts(pages[4]) == ["page 4 body"]


def test_type3_font_differences_decode():
    """Type3 font (no ToUnicode): decode goes through /Encoding
    /Differences glyph names (AGL + uniXXXX). The fixture stores letters
    CASE-FLIPPED, so a latin-1 fallback would provably emit wrong case."""
    from pdf_parser_benchmark_spark.synth.pdf_writer import build_pdf, lines_page

    text = "Mixed Case Type3 line, with digits 07 — dash."
    pages = parse_pdf(build_pdf([lines_page([text], font="F4")]))
    assert [b.lines for b in pages[0].blocks] == [[text]]


def test_differences_on_simple_font_without_tounicode():
    """A non-Type3 simple font with /Differences and no /ToUnicode uses the
    same glyph-name path; codes outside the map fall back to latin-1."""
    from pdf_parser_benchmark_spark.extract.pdf_parser import Font

    f = Font(diff_map={0x41: "b", 0x42: "uni0041", 0x43: "space"})
    assert f.decode(b"ABC!") == "bA !"


def test_vertical_cjk_run_merges_to_one_line():
    """Identity-V-style vertical writing: one Tj per CJK glyph descending a
    column reconstructs into a single top-to-bottom line; Latin text and
    horizontal CJK are untouched."""
    from pdf_parser_benchmark_spark.synth.pdf_writer import (
        PageSpec,
        TextItem,
        build_pdf,
    )

    chars = "学习数据评估团队"
    items = [
        TextItem(500, 700 - i * 14, c, size=12, font="F3")
        for i, c in enumerate(chars)
    ]
    items.append(TextItem(72, 300, "a normal horizontal line", size=11))
    items.append(TextItem(72, 280, "学习 数据", size=11, font="F3"))
    pages = parse_pdf(build_pdf([PageSpec(items=items)]))
    lines = [ln for b in pages[0].blocks for ln in b.lines]
    assert chars in lines
    assert "a normal horizontal line" in lines
    assert "学习 数据" in lines


def test_two_short_cjk_items_not_merged():
    """A run shorter than 3 glyphs stays as-is (no false vertical merge)."""
    from pdf_parser_benchmark_spark.synth.pdf_writer import (
        PageSpec,
        TextItem,
        build_pdf,
    )

    items = [
        TextItem(500, 700, "学", size=12, font="F3"),
        TextItem(500, 686, "习", size=12, font="F3"),
    ]
    pages = parse_pdf(build_pdf([PageSpec(items=items)]))
    lines = [ln for b in pages[0].blocks for ln in b.lines]
    assert "学习" not in lines


def test_uri_link_annotations_roundtrip():
    """/Link annotations with /URI actions round-trip through write→parse
    in both classic-xref and xref-stream layouts, in page/annot order,
    with ()\\ escaping; pages without /Annots yield nothing."""
    from pdf_parser_benchmark_spark.extract.pdf_parser import PdfDocument
    from pdf_parser_benchmark_spark.synth.pdf_writer import (
        PageSpec,
        TextItem,
        build_pdf,
    )

    specs = [
        PageSpec(items=[TextItem(50, 700, "p1")],
                 links=["https://a.ex/x", "https://b.ex/y(z)\\w"]),
        PageSpec(items=[TextItem(50, 700, "plain")]),
        PageSpec(items=[TextItem(50, 700, "p3")], links=["https://c.ex/"]),
    ]
    expect = [
        (0, "https://a.ex/x"),
        (0, "https://b.ex/y(z)\\w"),
        (2, "https://c.ex/"),
    ]
    assert PdfDocument(build_pdf(specs)).uri_links() == expect
    assert PdfDocument(build_pdf(specs, use_xref_stream=True)).uri_links() == expect
    # the no-links writer path is byte-identical to before (goldens hold)
    assert b"/Annots" not in build_pdf([PageSpec(items=[TextItem(50, 700, "x")])])


def test_pdf_image_xobject_dctdecode_roundtrip():
    """Embedded JPEG image XObject (§8.9.5, /Filter /DCTDecode §7.4.8):
    writer embeds, parser's images() walks resources, stream_data runs the
    from-scratch baseline-JPEG decoder; pixels match a direct decode, and
    text extraction is untouched by the image."""
    import numpy as np

    from pdf_parser_benchmark_spark.extract.pdf_parser import (
        PdfDocument,
        parse_pdf,
    )
    from pdf_parser_benchmark_spark.multimodal.jpeg import (
        jpeg_decode,
        jpeg_encode,
    )
    from pdf_parser_benchmark_spark.synth.pdf_writer import (
        PageSpec,
        TextItem,
        build_pdf,
    )

    yy, xx = np.mgrid[0:16, 0:16]
    gray = (50 + 10 * yy).clip(0, 255).astype(np.uint8)
    rgb = np.stack([gray, gray.T, np.full((16, 16), 99, np.uint8)], axis=-1)
    jg = jpeg_encode(gray, quality=85)
    jc = jpeg_encode(rgb, quality=85, subsample=True)
    data = build_pdf(
        [
            PageSpec(items=[TextItem(50, 700, "hello")], images=[(jg, 16, 16, 1)]),
            PageSpec(items=[TextItem(50, 700, "world")],
                     images=[(jc, 16, 16, 3)]),
        ]
    )
    imgs = PdfDocument(data).images()
    assert [(i[0], i[1], i[2], i[3], i[4]) for i in imgs] == [
        (0, "Im0", 16, 16, 1),
        (1, "Im0", 16, 16, 3),
    ]
    assert imgs[0][5] == jpeg_decode(jg).tobytes()
    assert imgs[1][5] == jpeg_decode(jc).tobytes()
    # text path unaffected by the embedded images
    text = " ".join(
        blk.text() for pg in parse_pdf(data) for blk in pg.blocks
    )
    assert "hello" in text and "world" in text


def test_pdf_image_free_output_byte_identical():
    """PageSpec.images defaults empty -> writer output is byte-identical to
    the pre-image-support writer (golden fixtures keep holding)."""
    from pdf_parser_benchmark_spark.synth.pdf_writer import (
        PageSpec,
        TextItem,
        build_pdf,
    )

    a = build_pdf([PageSpec(items=[TextItem(50, 700, "x")])])
    b = build_pdf([PageSpec(items=[TextItem(50, 700, "x")], images=[])])
    assert a == b
