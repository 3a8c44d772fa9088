"""PDF 1.5 object streams + FlateDecode predictors."""

from pdf_parser_benchmark_spark.extract.pdf_parser import _png_unpredict, parse_pdf
from pdf_parser_benchmark_spark.synth.pdf_writer import (
    build_pdf,
    lines_page,
    two_column_page,
)

SPECS = [
    lines_page(["Body one.", "Body two."], header="HDR", footer="FTR",
               heading="Chapter 1"),
    lines_page(["é Ω CMap body"], font="F2"),
    two_column_page(["L1", "L2"], ["R1", "R2"]),
    lines_page(["rotated Reproducible 4.3"], rotate=270),
    lines_page(["tj split page"], use_tj_array=True),
]


def _sig(pages):
    return [(p.rotation, [b.lines for b in p.blocks]) for p in pages]


def test_objstm_round_trip_matches_classic():
    classic = parse_pdf(build_pdf(SPECS))
    objstm_bytes = build_pdf(SPECS, use_object_streams=True)
    assert b"/ObjStm" in objstm_bytes and objstm_bytes.startswith(b"%PDF-1.5")
    assert _sig(parse_pdf(objstm_bytes)) == _sig(classic)


def test_cid_type0_font_decodes_multibyte():
    """Type0/Identity-H with a 2-byte ToUnicode CMap (CJK fixture)."""
    pdf = build_pdf([lines_page(["中文 mixed ascii", "第二 line"], font="F3")])
    page = parse_pdf(pdf)[0]
    assert [b.lines for b in page.blocks] == [["中文 mixed ascii", "第二 line"]]


def test_cid_font_in_tj_array():
    pdf = build_pdf([lines_page(["中文字 and more"], font="F3", use_tj_array=True)])
    page = parse_pdf(pdf)[0]
    assert page.blocks[0].lines == ["中文字 and more"]


def test_cid_font_inside_objstm():
    pdf = build_pdf(
        [lines_page(["中 objstm"], font="F3")], use_object_streams=True
    )
    assert parse_pdf(pdf)[0].blocks[0].lines == ["中 objstm"]


def test_png_predictors_roundtrip():
    rows = [bytes([(i * 7 + r * 13) % 256 for i in range(12)]) for r in range(5)]

    def encode(ftype):
        enc = bytearray()
        prev = bytes(12)
        for r in rows:
            enc.append(ftype)
            if ftype == 0:
                enc += r
            elif ftype == 1:  # Sub
                enc += bytes(
                    (r[i] - (r[i - 1] if i >= 1 else 0)) & 0xFF for i in range(12)
                )
            elif ftype == 2:  # Up
                enc += bytes((r[i] - prev[i]) & 0xFF for i in range(12))
            prev = r
        return bytes(enc)

    for ftype in (0, 1, 2):
        assert _png_unpredict(encode(ftype), columns=12) == b"".join(rows)


def test_form_xobject_do_executed():
    from pdf_parser_benchmark_spark.synth.pdf_writer import PageSpec, TextItem

    page = PageSpec(
        items=[TextItem(72, 700, "main content line")],
        form_items=[TextItem(72, 400, "form xobject text"),
                    TextItem(72, 386, "second form line")],
    )
    pdf = build_pdf([page])
    blocks = parse_pdf(pdf)[0].blocks
    texts = [b.text() for b in blocks]
    assert "main content line" in texts
    assert "form xobject text\nsecond form line" in texts


def test_incremental_update_resolution_regimes():
    """Two regimes for appended duplicate definitions:
    - a VALID xref chain governs: an appended body with no xref entry is
      dead, the chain's offset (the original) stays live (spec semantics);
    - no usable chain (corrupt startxref): tolerant scan semantics —
      the last definition wins."""
    base = build_pdf([lines_page(["original text"], compress=False)])
    import re

    objnum = None
    for m in re.finditer(rb"(\d+) 0 obj\n<< /Length \d+ >>\nstream\n", base):
        end = base.find(b"endstream", m.end())
        if b"original text" in base[m.end() : end]:
            objnum = int(m.group(1))
    assert objnum is not None
    new_stream = b"BT /F1 11 Tf 72 700 Td (updated text) Tj ET"
    update = (
        b"\n%d 0 obj\n<< /Length %d >>\nstream\n" % (objnum, len(new_stream))
        + new_stream
        + b"\nendstream\nendobj\n"
    )
    patched = base + update
    # valid chain: original xref still governs — appended body is dead
    assert [b.text() for b in parse_pdf(patched)[0].blocks] == ["original text"]
    # corrupt the chain: tolerant scan, last definition wins
    broken = patched.replace(b"startxref", b"startXBAD")
    assert [b.text() for b in parse_pdf(broken)[0].blocks] == ["updated text"]


def test_xref_chain_resolves_revert_to_older_object():
    """An incremental update can REVERT an object by pointing its new xref
    entry back at the ORIGINAL offset. A last-definition-wins scan picks the
    wrong body; the xref chain picks the right one."""
    import re

    base = build_pdf([lines_page(["original text"], compress=False)])
    objnum = None
    for m in re.finditer(rb"(\d+) 0 obj\n<< /Length \d+ >>\nstream\n", base):
        end = base.find(b"endstream", m.end())
        if b"original text" in base[m.end() : end]:
            objnum = int(m.group(1))
            orig_offset = m.start()
    assert objnum is not None
    root = int(re.search(rb"/Root (\d+) 0 R", base).group(1))
    old_startxref = int(re.search(rb"startxref\s+(\d+)", base).group(1))

    # update 1: shadow with new content (appended definition)
    new_stream = b"BT /F1 11 Tf 72 700 Td (shadowed text) Tj ET"
    upd = bytearray(base)
    upd += b"\n"
    shadow_off = len(upd)
    upd += (
        b"%d 0 obj\n<< /Length %d >>\nstream\n" % (objnum, len(new_stream))
        + new_stream + b"\nendstream\nendobj\n"
    )
    xref1_off = len(upd)
    upd += b"xref\n0 1\n0000000000 65535 f \n"
    upd += b"%d 1\n%010d 00000 n \n" % (objnum, shadow_off)
    upd += b"trailer\n<< /Size 99 /Root %d 0 R /Prev %d >>\nstartxref\n%d\n%%%%EOF\n" % (
        root, old_startxref, xref1_off)
    shadowed = bytes(upd)
    assert [b.text() for b in parse_pdf(shadowed)[0].blocks] == ["shadowed text"]

    # update 2: REVERT — new xref points the object back at its original offset
    upd2 = bytearray(shadowed)
    xref2_off = len(upd2)
    upd2 += b"xref\n0 1\n0000000000 65535 f \n"
    upd2 += b"%d 1\n%010d 00000 n \n" % (objnum, orig_offset)
    upd2 += b"trailer\n<< /Size 99 /Root %d 0 R /Prev %d >>\nstartxref\n%d\n%%%%EOF\n" % (
        root, xref1_off, xref2_off)
    reverted = bytes(upd2)
    # scan-only semantics would say "shadowed text"; the xref chain reverts
    assert [b.text() for b in parse_pdf(reverted)[0].blocks] == ["original text"]


def test_xref_stream_file_parses_identically():
    """Pure PDF 1.5: /Type /XRef stream trailer (no classic xref), packed
    objects referenced by type-2 entries."""
    classic = parse_pdf(build_pdf(SPECS))
    x = build_pdf(SPECS, use_xref_stream=True)
    assert b"/Type /XRef" in x and b"\ntrailer\n" not in x
    assert _sig(parse_pdf(x)) == _sig(classic)


def test_xref_stream_governs_liveness():
    """With an xref stream present, a dangling appended duplicate (no xref
    entry) stays dead — same spec semantics as classic chains."""
    import re

    base = build_pdf([lines_page(["original text"], compress=False)],
                     use_xref_stream=True)
    m = None
    for m2 in re.finditer(rb"(\d+) 0 obj\n<< /Length \d+ >>\nstream\n", base):
        end = base.find(b"endstream", m2.end())
        if b"original text" in base[m2.end():end]:
            m = m2
    assert m is not None
    objnum = int(m.group(1))
    new_stream = b"BT /F1 11 Tf 72 700 Td (updated text) Tj ET"
    patched = base + (
        b"\n%d 0 obj\n<< /Length %d >>\nstream\n" % (objnum, len(new_stream))
        + new_stream + b"\nendstream\nendobj\n"
    )
    assert [b.text() for b in parse_pdf(patched)[0].blocks] == ["original text"]


def test_trailer_root_overrides_scan_order_catalog():
    """An incremental update can install a REPLACEMENT catalog under a NEW
    object number, leaving the old catalog object byte-intact — scan order
    would keep serving the old page tree; the newest trailer's /Root names
    the live one."""
    import re

    base = build_pdf([lines_page(["old catalog text"], compress=False)])
    old_startxref = int(re.search(rb"startxref\s+(\d+)", base).group(1))
    font_m = re.search(rb"(\d+) 0 obj\n<< /Type /Font [^>]*?/BaseFont /Helvetica", base)
    assert font_m, "fixture font object not found"
    font_num = int(font_m.group(1))
    maxobj = max(int(m.group(1)) for m in re.finditer(rb"(\d+) 0 obj", base))
    cat, pgs, pg, cont = maxobj + 1, maxobj + 2, maxobj + 3, maxobj + 4
    stream = b"BT /F1 11 Tf 72 700 Td (new catalog text) Tj ET"

    upd = bytearray(base)
    upd += b"\n"
    offs = {}

    def add(num, body):
        offs[num] = len(upd)
        upd.extend(b"%d 0 obj\n" % num + body + b"\nendobj\n")

    add(cat, b"<< /Type /Catalog /Pages %d 0 R >>" % pgs)
    add(pgs, b"<< /Type /Pages /Kids [%d 0 R] /Count 1 >>" % pg)
    add(
        pg,
        b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
        b"/Contents %d 0 R /Resources << /Font << /F1 %d 0 R >> >> >>"
        % (pgs, cont, font_num),
    )
    add(
        cont,
        b"<< /Length %d >>\nstream\n" % len(stream) + stream + b"\nendstream",
    )
    xref_off = len(upd)
    upd += b"xref\n0 1\n0000000000 65535 f \n"
    upd += b"%d 4\n" % cat
    for n in (cat, pgs, pg, cont):
        upd += b"%010d 00000 n \n" % offs[n]
    upd += (
        b"trailer\n<< /Size %d /Root %d 0 R /Prev %d >>\nstartxref\n%d\n%%%%EOF\n"
        % (cat + 5, cat, old_startxref, xref_off)
    )

    pages = parse_pdf(bytes(upd))
    assert len(pages) == 1
    assert [b.text() for b in pages[0].blocks] == ["new catalog text"]
    # the base document alone still serves the old tree
    assert [b.text() for b in parse_pdf(base)[0].blocks] == ["old catalog text"]
