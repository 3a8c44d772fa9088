"""Minimal from-scratch PDF *writer* (stdlib only).

Exists so the from-scratch PDF *parser* (extract/pdf_parser.py) has exact
ground truth: we emit a controlled but spec-faithful subset of PDF 1.4 —
xref table, page tree, /Rotate, Helvetica (StandardEncoding fallback path)
and a /ToUnicode CMap font (CMap decode path), FlateDecode'd content
streams, and BT/ET text blocks using Tf/Td/TD/Tm/T*/Tj/TJ operators.

Fixture shapes mirror what the reference ingests: multi-page books with
repeated header/footer lines (boilerplate rule /root/reference/CLAUDE.md:195-211),
rotated landscape pages routed to a separate path
(/root/reference/src/ingest.py:47-54), and two-column pages exercising
XY-cut reading order.
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass, field
from hashlib import md5 as _md5

PAGE_W, PAGE_H = 612, 792  # US Letter, points


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _info_text(s: str) -> bytes:
    """PDF text-string bytes (§7.9.2.2): PDFDocEncoding (≈Latin-1) when it
    fits, else UTF-16BE with BOM."""
    try:
        raw = s.encode("latin-1")
        # bytes 0x18-0x1F/0x80-0x9F/0xA0 mean something else in
        # PDFDocEncoding (Annex D.2) — those strings must go UTF-16BE
        if any(0x18 <= b <= 0x1F or 0x7F <= b <= 0xA0 for b in raw):
            raise UnicodeEncodeError("latin-1", s, 0, 1, "PDFDoc-divergent")
        return raw
    except UnicodeEncodeError:
        return b"\xfe\xff" + s.encode("utf-16-be")


@dataclass
class TextItem:
    """One positioned string. ``font`` is 'F1' (Helvetica/Standard) or 'F2'
    (custom encoding w/ ToUnicode CMap). ``size`` drives the parser's
    heading heuristic."""

    x: float
    y: float
    text: str
    size: float = 11.0
    font: str = "F1"


@dataclass
class PageSpec:
    items: list[TextItem] = field(default_factory=list)
    rotate: int = 0  # 0 | 90 | 270
    compress: bool = True
    use_tj_array: bool = False  # emit TJ [(..) kern (..)] instead of Tj
    use_tm: bool = False  # position via Tm instead of Td
    form_items: list[TextItem] = field(default_factory=list)  # via /Do XObject
    links: list[str] = field(default_factory=list)  # /Annots URI actions
    # embedded JPEG image XObjects (jpeg_bytes, width, height, ncomp) —
    # /Filter /DCTDecode; resources-only (no Do), so text output and all
    # existing fixtures stay byte-identical when the list is empty
    images: list[tuple[bytes, int, int, int]] = field(default_factory=list)


# F2's single-byte code -> unicode map (forces the CMap decode path; includes
# non-ASCII so identity fallback would be provably wrong).
F2_CMAP: dict[int, str] = {i: chr(i) for i in range(0x20, 0x7F)}
F2_CMAP.update({0x80: "é", 0x81: "Ω", 0x82: "—", 0x83: "≥"})
_F2_REVERSE = {v: k for k, v in F2_CMAP.items()}


def _encode_f2(text: str) -> bytes:
    return bytes(_F2_REVERSE[ch] for ch in text)


# F4 (Type3) byte code -> glyph name via /Encoding /Differences. Letters are
# stored CASE-FLIPPED (code = ord(swapcase)), so a parser that ignores the
# Differences map and falls back to StandardEncoding/latin-1 provably emits
# the wrong case. Code 0x8E maps to /uni2014 (em dash) to exercise the AGL
# uniXXXX algorithm.
_AGL_NAMES = {
    " ": "space", ",": "comma", "-": "hyphen", ".": "period", "!": "exclam",
    "?": "question", ":": "colon", ";": "semicolon", "(": "parenleft",
    ")": "parenright", "'": "quotesingle",
    **{d: n for d, n in zip("0123456789",
       ["zero", "one", "two", "three", "four", "five", "six", "seven",
        "eight", "nine"])},
}
F4_DIFF: dict[int, str] = {0x8E: "uni2014"}
for _c in "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ":
    F4_DIFF[ord(_c.swapcase())] = _c
for _c, _n in _AGL_NAMES.items():
    F4_DIFF[ord(_c)] = _n
_F4_REVERSE = {"—": 0x8E}
_F4_REVERSE.update({c: ord(c.swapcase()) for c in
                    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"})
_F4_REVERSE.update({c: ord(c) for c in _AGL_NAMES})


def _encode_f4(text: str) -> bytes:
    return bytes(_F4_REVERSE[ch] for ch in text)


def _f4_differences() -> bytes:
    """Serialize F4_DIFF as a /Differences array (code runs collapse)."""
    parts: list[str] = []
    prev = None
    for code in sorted(F4_DIFF):
        if prev is None or code != prev + 1:
            parts.append(str(code))
        parts.append("/" + F4_DIFF[code])
        prev = code
    return " ".join(parts).encode("ascii")


def _tounicode_cmap_cid() -> bytes:
    """2-byte Identity ToUnicode CMap for the Type0/Identity-H fixture font
    (F3): code == unicode codepoint over ASCII + the CJK block we use."""
    lines = [
        "/CIDInit /ProcSet findresource begin",
        "12 dict begin",
        "begincmap",
        "/CMapName /F3toUnicode def",
        "/CMapType 2 def",
        "1 begincodespacerange",
        "<0000> <FFFF>",
        "endcodespacerange",
        "2 beginbfrange",
        "<0020> <07FF> <0020>",
        "<4E00> <9FFF> <4E00>",
        "endbfrange",
        "endcmap",
        "end",
        "end",
    ]
    return "\n".join(lines).encode("ascii")


def _tounicode_cmap() -> bytes:
    lines = [
        "/CIDInit /ProcSet findresource begin",
        "12 dict begin",
        "begincmap",
        "/CMapName /F2toUnicode def",
        "/CMapType 2 def",
        "1 begincodespacerange",
        "<00> <FF>",
        "endcodespacerange",
        f"{len(F2_CMAP)} beginbfchar",
    ]
    for code, ch in sorted(F2_CMAP.items()):
        cps = "".join(f"{ord(c):04X}" for c in ch)
        lines.append(f"<{code:02X}> <{cps}>")
    lines += ["endbfchar", "endcmap", "end", "end"]
    return "\n".join(lines).encode("ascii")


def _content_stream(page: PageSpec) -> bytes:
    """Emit the page's text via a mix of positioning operators, so the parser
    must implement Td/TD/Tm/T*/Tj/TJ rather than pattern-match one shape."""
    out: list[str] = []

    def _lit(it: TextItem, text: str) -> str:
        if it.font == "F3":  # Type0/Identity-H: 2-byte hex string
            return None  # handled by _show
        if it.font in ("F2", "F4"):
            raw = _encode_f2(text) if it.font == "F2" else _encode_f4(text)
            return "".join(
                chr(b) if 0x20 <= b <= 0x7E and chr(b) not in "\\()" else f"\\{b:03o}"
                for b in raw
            )
        return _esc(text.encode("latin-1", "replace").decode("latin-1"))

    def _show(it: TextItem, text: str) -> str:
        if it.font == "F3":
            return "<" + "".join(f"{ord(c):04X}" for c in text) + ">"
        return f"({_lit(it, text)})"

    for i, it in enumerate(page.items):
        out.append("BT")
        out.append(f"/{it.font} {it.size:g} Tf")
        if page.use_tm:
            out.append(f"1 0 0 1 {it.x:g} {it.y:g} Tm")
        elif i % 3 == 2:
            out.append(f"{it.x:g} {it.y + 14:g} Td")
            out.append("0 -14 TD")  # TD: move and set leading
            out.append("T*")  # another -14: net y = it.y - 14
            out.append(f"0 14 Td")  # back up to it.y
        else:
            out.append(f"{it.x:g} {it.y:g} Td")
        if page.use_tj_array:
            # split the TEXT (not the escaped literal — escapes must not be
            # cut mid-sequence), escape each part independently
            half = max(1, len(it.text) // 2)
            out.append(
                f"[{_show(it, it.text[:half])} -20 {_show(it, it.text[half:])}] TJ"
            )
        else:
            out.append(f"{_show(it, it.text)} Tj")
        out.append("ET")
    return "\n".join(out).encode("latin-1")


def build_pdf(
    pages: list[PageSpec],
    use_object_streams: bool = False,
    use_xref_stream: bool = False,
    encrypt: str | None = None,
    info_title: str | None = None,
    info_gen: int = 0,
    user_password: bytes = b"",
) -> bytes:
    """Assemble a complete PDF file with a correct xref table.

    use_object_streams=True packs all non-stream objects into a PDF 1.5
    /ObjStm (exercises the parser's compressed-object path).
    use_xref_stream=True (implies object streams) emits a pure PDF 1.5
    file: a /Type /XRef stream trailer with type-1/type-2 entries and NO
    classic xref/trailer.
    encrypt='rc4' (V2/R3/128-bit) or 'aes' (V4/R4 /AESV2) emits a Standard-
    security-handler file with an EMPTY user password (owner pwd 'owner') —
    the common in-the-wild case the parser must open transparently. The AES
    IV is derived deterministically from the object number so fixtures stay
    byte-stable. Classic-xref files only."""
    if encrypt:
        assert not use_object_streams and not use_xref_stream, (
            "encrypted fixtures use the classic-xref layout"
        )
    if use_xref_stream:
        use_object_streams = True
    objects: list[bytes] = []  # 1-indexed bodies, object n = objects[n-1]
    gens: list[int] = []  # generation number per object (parallel to objects)

    def add(body: bytes, gen: int = 0) -> int:
        objects.append(body)
        gens.append(gen)
        return len(objects)

    cmap_stream = _tounicode_cmap()
    cmap_num = add(
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(cmap_stream), cmap_stream)
    )
    f1_num = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    f2_num = add(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom "
        b"/ToUnicode %d 0 R >>" % cmap_num
    )
    cid_cmap_stream = _tounicode_cmap_cid()
    cid_cmap_num = add(
        b"<< /Length %d >>\nstream\n%s\nendstream"
        % (len(cid_cmap_stream), cid_cmap_stream)
    )
    f3_desc_num = add(
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /CJKFixture >>"
    )
    f3_num = add(
        b"<< /Type /Font /Subtype /Type0 /BaseFont /CJKFixture "
        b"/Encoding /Identity-H /DescendantFonts [%d 0 R] "
        b"/ToUnicode %d 0 R >>" % (f3_desc_num, cid_cmap_num)
    )
    # F4: Type3 font — glyph procs + /Differences encoding, NO ToUnicode
    # (decode goes through the AGL glyph-name path)
    glyph_proc = b"0 0 d0"
    f4_proc_num = add(
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(glyph_proc), glyph_proc)
    )
    charprocs = b" ".join(
        b"/%s %d 0 R" % (n.encode("ascii"), f4_proc_num)
        for n in sorted(set(F4_DIFF.values()))
    )
    f4_num = add(
        b"<< /Type /Font /Subtype /Type3 /FontMatrix [0.001 0 0 0.001 0 0] "
        b"/FontBBox [0 0 1000 1000] /CharProcs << %s >> "
        b"/Encoding << /Type /Encoding /Differences [%s] >> >>"
        % (charprocs, _f4_differences())
    )

    content_nums: list[int] = []
    form_nums: list[int | None] = []
    for p in pages:
        data = _content_stream(p)
        if p.form_items:
            fdata = _content_stream(PageSpec(items=p.form_items))
            form_nums.append(
                add(
                    b"<< /Type /XObject /Subtype /Form /BBox [0 0 %d %d] "
                    b"/Length %d >>\nstream\n" % (PAGE_W, PAGE_H, len(fdata))
                    + fdata
                    + b"\nendstream"
                )
            )
            data += b"\n/X1 Do"
        else:
            form_nums.append(None)
        if p.compress:
            comp = zlib.compress(data)
            body = (
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(comp)
                + comp
                + b"\nendstream"
            )
        else:
            body = b"<< /Length %d >>\nstream\n" % len(data) + data + b"\nendstream"
        content_nums.append(add(body))

    # /Link annotations with /URI actions (§12.5.6.5); string-sealing under
    # encryption covers streams + /Info only, so link fixtures stay classic
    # unencrypted files
    annot_nums: list[list[int]] = []
    for p in pages:
        assert not (p.links and encrypt), "link fixtures are unencrypted"
        nums = []
        for i, uri in enumerate(p.links):
            esc = uri.encode("ascii").replace(b"\\", rb"\\").replace(
                b"(", rb"\("
            ).replace(b")", rb"\)")
            nums.append(add(
                b"<< /Type /Annot /Subtype /Link /Rect [%d %d %d %d] "
                b"/Border [0 0 0] /A << /S /URI /URI (%s) >> >>"
                % (36, 700 - 20 * i, 200, 716 - 20 * i, esc)
            ))
        annot_nums.append(nums)

    # image XObjects (/Subtype /Image /Filter /DCTDecode, §8.9.5 + §7.4.8);
    # unencrypted fixtures only, like links
    image_nums: list[list[int]] = []
    for p in pages:
        assert not (p.images and encrypt), "image fixtures are unencrypted"
        nums = []
        for img in p.images:
            # 4-tuple = JPEG (the r5 shape, bytes unchanged); 5-tuple adds
            # a filter tag: "g4" embeds CCITT Group 4 bilevel data
            # (/BitsPerComponent 1, /DecodeParms /K -1, §7.4.6)
            if len(img) == 5:
                data, iw, ih, ncomp, filt = img
            else:
                (data, iw, ih, ncomp), filt = img, "dct"
            if filt == "g4":
                nums.append(add(
                    b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
                    b"/ColorSpace /DeviceGray /BitsPerComponent 1 "
                    b"/Filter /CCITTFaxDecode /DecodeParms "
                    b"<< /K -1 /Columns %d /Rows %d /BlackIs1 false >> "
                    b"/Length %d >>\nstream\n" % (iw, ih, iw, ih, len(data))
                    + data
                    + b"\nendstream"
                ))
            elif filt == "jbig2":
                # embedded JBIG2 segment stream (§7.4.7), generic-region
                # subset from multimodal/jbig2.py:jbig2_embed_encode
                nums.append(add(
                    b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
                    b"/ColorSpace /DeviceGray /BitsPerComponent 1 "
                    b"/Filter /JBIG2Decode "
                    b"/Length %d >>\nstream\n" % (iw, ih, len(data))
                    + data
                    + b"\nendstream"
                ))
            elif filt == "jbig2g":
                # same, but document-scope segments split into a separate
                # /JBIG2Globals stream referenced from /DecodeParms; data
                # is the (globals_bytes, stream_bytes) pair produced by
                # jbig2_embed_encode(split_globals=True)
                gdata, sdata = data
                gnum = add(
                    b"<< /Length %d >>\nstream\n" % len(gdata)
                    + gdata
                    + b"\nendstream"
                )
                nums.append(add(
                    b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
                    b"/ColorSpace /DeviceGray /BitsPerComponent 1 "
                    b"/Filter /JBIG2Decode /DecodeParms "
                    b"<< /JBIG2Globals %d 0 R >> "
                    b"/Length %d >>\nstream\n" % (iw, ih, gnum, len(sdata))
                    + sdata
                    + b"\nendstream"
                ))
            else:
                cs = b"/DeviceRGB" if ncomp == 3 else b"/DeviceGray"
                nums.append(add(
                    b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
                    b"/ColorSpace %s /BitsPerComponent 8 /Filter /DCTDecode "
                    b"/Length %d >>\nstream\n" % (iw, ih, cs, len(data))
                    + data
                    + b"\nendstream"
                ))
        image_nums.append(nums)

    # reserve numbers: pages tree node, then one page object per page
    pages_num = len(objects) + 1 + len(pages)  # page objs first, tree after
    page_nums: list[int] = []
    for p, c, fx, an, ims in zip(
        pages, content_nums, form_nums, annot_nums, image_nums
    ):
        xents = ([b"/X1 %d 0 R" % fx] if fx else []) + [
            b"/Im%d %d 0 R" % (i, n) for i, n in enumerate(ims)
        ]
        xobj = b" /XObject << %s >>" % b" ".join(xents) if xents else b""
        annots = (
            b" /Annots [%s]" % b" ".join(b"%d 0 R" % n for n in an) if an else b""
        )
        body = (
            b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 %d %d] "
            b"/Rotate %d /Resources << /Font << /F1 %d 0 R /F2 %d 0 R "
            b"/F3 %d 0 R /F4 %d 0 R >>%s >>%s "
            b"/Contents %d 0 R >>"
            % (pages_num, PAGE_W, PAGE_H, p.rotate, f1_num, f2_num, f3_num,
               f4_num, xobj, annots, c)
        )
        page_nums.append(add(body))
    kids = b" ".join(b"%d 0 R" % n for n in page_nums)
    assert add(
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, len(pages))
    ) == pages_num
    catalog_num = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_num)

    # optional document-information dictionary; info_gen > 0 exercises the
    # generation-number term of the Algorithm 1 per-object key, and under
    # encryption its /Title string is sealed (string encryption, s7.6.2)
    info_num = None
    if info_title is not None:
        assert not use_object_streams and not use_xref_stream, (
            "info fixtures use the classic-xref layout"
        )
        info_num = add(
            b"<< /Title <%s> /Producer (synth-writer) >>"
            % _info_text(info_title).hex().encode(),
            gen=info_gen,
        )

    if use_object_streams:
        # PDF 1.5 object streams: pack every non-stream object into one
        # compressed /ObjStm container (streams must stay top-level)
        packed_nums = [
            n for n, body in enumerate(objects, start=1)
            if not body.rstrip().endswith(b"endstream")
        ]
        parts: list[bytes] = []
        offs: list[tuple[int, int]] = []
        pos = 0
        for n in packed_nums:
            body = objects[n - 1]
            offs.append((n, pos))
            parts.append(body + b"\n")
            pos += len(body) + 1
        header = b" ".join(b"%d %d" % (n, o) for n, o in offs) + b"\n"
        payload = header + b"".join(parts)
        comp = zlib.compress(payload)
        objstm_body = (
            b"<< /Type /ObjStm /N %d /First %d /Length %d /Filter /FlateDecode >>"
            b"\nstream\n" % (len(packed_nums), len(header), len(comp))
            + comp
            + b"\nendstream"
        )
        objstm_num = add(objstm_body)
        packed = set(packed_nums)
        buf = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
        offsets_map: dict[int, int] = {}
        for i, body in enumerate(objects, start=1):
            if i in packed:
                continue
            offsets_map[i] = len(buf)
            buf += b"%d 0 obj\n" % i + body + b"\nendobj\n"

        if use_xref_stream:
            # /Type /XRef stream trailer: W=[1,4,2]; type 0 = free,
            # type 1 = offset, type 2 = (objstm objnum, index-in-stream)
            xref_num = len(objects) + 1
            xref_off = len(buf)
            size = xref_num + 1
            idx_in_stm = {n: i for i, n in enumerate(packed_nums)}
            rows = bytearray()
            for num in range(size):
                if num == 0:
                    rows += b"\x00" + (0).to_bytes(4, "big") + (0xFFFF).to_bytes(2, "big")
                elif num in idx_in_stm:
                    rows += b"\x02" + objstm_num.to_bytes(4, "big") + idx_in_stm[num].to_bytes(2, "big")
                elif num == xref_num:
                    rows += b"\x01" + xref_off.to_bytes(4, "big") + (0).to_bytes(2, "big")
                else:
                    rows += b"\x01" + offsets_map[num].to_bytes(4, "big") + (0).to_bytes(2, "big")
            xcomp = zlib.compress(bytes(rows))
            buf += (
                b"%d 0 obj\n<< /Type /XRef /Size %d /W [1 4 2] /Root %d 0 R "
                b"/Filter /FlateDecode /Length %d >>\nstream\n"
                % (xref_num, size, catalog_num, len(xcomp))
                + xcomp
                + b"\nendstream\nendobj\n"
            )
            buf += b"startxref\n%d\n%%%%EOF\n" % xref_off
            return bytes(buf)

        xref_off = len(buf)
        # classic trailer alongside (hybrid) — our reader scans objects, but
        # the file stays navigable
        buf += b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (
            len(objects) + 1,
            catalog_num,
            xref_off,
        )
        return bytes(buf)

    # optional Standard-security-handler encryption (empty user password)
    trailer_extra = b""
    if encrypt:
        from ..extract import pdf_crypt

        p = -3904
        id0 = _md5(b"".join(objects)).digest()
        if encrypt in ("aes256", "aes256r5"):  # V5: R6 (ISO 32000-2 §7.6.4) or legacy R5
            aes, r6 = True, True
            rev = 5 if encrypt == "aes256r5" else 6
            file_key = (_md5(id0).digest() + _md5(id0 + b"k").digest())  # 32B, deterministic
            vsalt, ksalt = _md5(id0 + b"v").digest()[:8], _md5(id0 + b"s").digest()[:8]
            ovs, oks = _md5(id0 + b"ov").digest()[:8], _md5(id0 + b"os").digest()[:8]
            if rev == 5:
                # legacy revision 5: single-pass SHA-256, no Algorithm 2.B
                u_entry, ue = pdf_crypt.r5_user_entries(
                    file_key, vsalt, ksalt, pwd=user_password
                )
                o_entry, oe = pdf_crypt.r5_owner_entries(
                    b"owner", file_key, u_entry, ovs, oks
                )
            else:
                u_entry, ue = pdf_crypt.r6_user_entries(
                    file_key, vsalt, ksalt, pwd=user_password
                )
                o_entry, oe = pdf_crypt.r6_owner_entries(b"owner", file_key, u_entry, ovs, oks)
            perms = pdf_crypt.r6_perms(file_key, p)  # Algorithm 13 is revision-shared
            enc_dict = (
                b"<< /Filter /Standard /V 5 /R %d /Length 256 "
                b"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
                b"/StmF /StdCF /StrF /StdCF /P %d "
                b"/U <%s> /UE <%s> /O <%s> /OE <%s> /Perms <%s> >>"
                % (rev, p, u_entry.hex().encode(), ue.hex().encode(),
                   o_entry.hex().encode(), oe.hex().encode(), perms.hex().encode())
            )
        else:
            aes, r6 = encrypt == "aes", False
            r, v, key_len = (4, 4, 16) if aes else (3, 2, 16)
            o_entry = pdf_crypt.compute_owner_hash(b"owner", user_password, r, key_len)
            file_key = pdf_crypt.compute_file_key(
                user_password, o_entry, p, id0, r, key_len
            )
            u_entry = pdf_crypt.compute_user_hash(file_key, id0, r)
            cf = (
                b"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> /StmF /StdCF /StrF /StdCF "
                if aes
                else b""
            )
            enc_dict = (
                b"<< /Filter /Standard /V %d /R %d /Length 128 %s/P %d /O <%s> /U <%s> >>"
                % (v, r, cf, p, o_entry.hex().encode(), u_entry.hex().encode())
            )
        for n, body in enumerate(list(objects), start=1):
            i = body.find(b"\nstream\n")
            if i < 0:
                continue
            head, payload = body[:i], body[i + 8 :]
            if payload.endswith(b"\nendstream"):
                payload = payload[: -len(b"\nendstream")]
            sealed = pdf_crypt.encrypt_bytes(payload, file_key, n, 0, aes, r6)
            head = re.sub(rb"/Length \d+", b"/Length %d" % len(sealed), head, count=1)
            objects[n - 1] = head + b"\nstream\n" + sealed + b"\nendstream"
        if info_num is not None:
            sealed_t = pdf_crypt.encrypt_bytes(
                _info_text(info_title), file_key, info_num, info_gen, aes, r6
            )
            sealed_p = pdf_crypt.encrypt_bytes(
                b"synth-writer", file_key, info_num, info_gen, aes, r6
            )
            objects[info_num - 1] = b"<< /Title <%s> /Producer <%s> >>" % (
                sealed_t.hex().encode(), sealed_p.hex().encode(),
            )
        enc_num = add(enc_dict)
        id_hex = id0.hex().encode()
        trailer_extra = b" /Encrypt %d 0 R /ID [<%s> <%s>]" % (enc_num, id_hex, id_hex)
    if info_num is not None:
        trailer_extra += b" /Info %d %d R" % (info_num, info_gen)

    # serialize with xref
    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(buf))
        buf += b"%d %d obj\n" % (i, gens[i - 1]) + body + b"\nendobj\n"
    xref_off = len(buf)
    buf += b"xref\n0 %d\n" % (len(objects) + 1)
    buf += b"0000000000 65535 f \n"
    for i, off in enumerate(offsets[1:], start=1):
        buf += b"%010d %05d n \n" % (off, gens[i - 1])
    buf += (
        b"trailer\n<< /Size %d /Root %d 0 R%s >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, catalog_num, trailer_extra, xref_off)
    )
    return bytes(buf)


def lines_page(
    lines: list[str],
    header: str | None = None,
    footer: str | None = None,
    rotate: int = 0,
    heading: str | None = None,
    compress: bool = True,
    use_tj_array: bool = False,
    use_tm: bool = False,
    font: str = "F1",
) -> PageSpec:
    """Single-column page: optional header (top), heading (large font),
    body lines top-to-bottom, optional footer (bottom)."""
    items: list[TextItem] = []
    y = PAGE_H - 40
    if header:
        items.append(TextItem(72, y, header, size=9))
        y -= 24
    if heading:
        items.append(TextItem(72, y, heading, size=18, font=font))
        y -= 28
    for ln in lines:
        items.append(TextItem(72, y, ln, size=11, font=font))
        y -= 14
    if footer:
        items.append(TextItem(72, 30, footer, size=9))
    return PageSpec(
        items=items,
        rotate=rotate,
        compress=compress,
        use_tj_array=use_tj_array,
        use_tm=use_tm,
    )


def two_column_page(
    left: list[str], right: list[str], header: str | None = None
) -> PageSpec:
    """Two columns; correct reading order is all-left then all-right (XY-cut)."""
    items: list[TextItem] = []
    if header:
        items.append(TextItem(72, PAGE_H - 40, header, size=9))
    y = PAGE_H - 80
    for ln in left:
        items.append(TextItem(72, y, ln, size=11))
        y -= 14
    y = PAGE_H - 80
    for ln in right:
        items.append(TextItem(330, y, ln, size=11))
        y -= 14
    return PageSpec(items=items)
