"""From-scratch JBIG2 (ITU-T T.88) bilevel codec — both directions — for
the PDF `/JBIG2Decode` filter (ISO 32000-1 §7.4.7), closing the last
scanned-document image filter after /DCTDecode (r5) and /CCITTFaxDecode
(r6): many scanner pipelines emit JBIG2 generic-region pages, and the
reference corpus is books, i.e. scans in the wild
(/root/reference/docs/PRD.md).

Public-spec subset implemented, both encode and decode:

- the MQ arithmetic coder (T.88 Annex E, identical to the JPEG2000 MQ
  coder: the 47-state Qe table, INITDEC/BYTEIN/DECODE and
  INITENC/BYTEOUT/FLUSH software conventions);
- generic region decoding (T.88 §6.2) with GBTEMPLATE 0 at the nominal
  AT-pixel positions A1(+3,−1) A2(−3,−1) A3(+2,−2) A4(−2,−2) — the
  16-bit context is then the contiguous window
  ``(row y−2, x−2..x+2) << 11 | (row y−1, x−3..x+3) << 4 |
  (row y, x−4..x−1)`` — plus TPGDON typical-prediction rows
  (SLTP context 0x9B25, §6.2.5.7);
- the embedded-stream segment organization PDF uses (T.88 Annex
  §7.2 segment headers with no file header): page information (type
  48), immediate (lossless) generic region (types 36/38/39) composited
  onto the page with the OR / REPLACE external combination operators,
  end-of-stripe/page/file (50/49/51) and extension (62) segments, and
  the /JBIG2Globals side stream prepended per ISO 32000-1 §7.4.7.

Out-of-subset segment types (symbol dictionary / text region / halftone
/ refinement, MMR-coded or non-nominal-AT generic regions) raise
ValueError — the tolerant images() path skips such images, mirroring the
policy for unsupported JPEG modes.

Pixel convention: JBIG2 bitmaps use 1 = black (T.88 §4). The PDF filter
output (:func:`jbig2_decode`) inverts to the decoded-sample convention
the rest of the image chain uses (0 = black, matching /CCITTFaxDecode
with default /BlackIs1 false), packed one row per byte-padded scanline.

The discipline mirrors multimodal/jpeg.py and ccitt.py: synth writer +
decoder + pinned query + differential round-trip tests.
"""

from __future__ import annotations

import struct

import numpy as np

# --- T.88 Annex E Table E.1: Qe, NMPS, NLPS, SWITCH -------------------------

_QE = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
)

# TPGDON SLTP pseudo-pixel context for GBTEMPLATE 0 (T.88 §6.2.5.7)
_SLTP_CTX = 0x9B25


class MQDecoder:
    """T.88 Annex E.3 software-convention MQ decoder. Context state is an
    external array (index, mps) so one decoder can serve many context
    models; reads past the end of the data behave as 0xFF bytes (E.3.4),
    which is how the spec terminates the marker-free JBIG2 payload."""

    def __init__(self, data: bytes) -> None:
        self._d = data
        self._bp = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _byte(self, i: int) -> int:
        return self._d[i] if i < len(self._d) else 0xFF

    def _bytein(self) -> None:
        if self._byte(self._bp) == 0xFF:
            if self._byte(self._bp + 1) > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self._bp += 1
                self.c += self._byte(self._bp) << 9
                self.ct = 7
        else:
            self._bp += 1
            self.c += self._byte(self._bp) << 8
            self.ct = 8
        self.c &= 0xFFFFFFFF

    def decode(self, cx_i: np.ndarray, cx_mps: np.ndarray, ctx: int) -> int:
        i = cx_i[ctx]
        mps = cx_mps[ctx]
        qe, nmps, nlps, switch = _QE[i]
        self.a -= qe
        if (self.c >> 16) < qe:
            # LPS exchange path (Figure E.17 lower branch)
            if self.a < qe:
                d = mps
                cx_i[ctx] = nmps
            else:
                d = 1 - mps
                if switch:
                    cx_mps[ctx] = 1 - mps
                cx_i[ctx] = nlps
            self.a = qe
        else:
            self.c = (self.c - (qe << 16)) & 0xFFFFFFFF
            if self.a & 0x8000:
                return int(mps)
            # MPS exchange path
            if self.a < qe:
                d = 1 - mps
                if switch:
                    cx_mps[ctx] = 1 - mps
                cx_i[ctx] = nlps
            else:
                d = mps
                cx_i[ctx] = nmps
        # RENORMD
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return int(d)


class MQEncoder:
    """T.88 Annex E.3 software-convention MQ encoder (INITENC / CODEMPS /
    CODELPS / BYTEOUT with 0xFF bit-stuffing / FLUSH with SETBITS)."""

    def __init__(self) -> None:
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self._out: list[int] = []
        self._b = -1  # pending byte (B register); -1 = none yet

    def _byteout(self) -> None:
        if self._b == 0xFF:
            self._out.append(self._b)
            self._b = (self.c >> 20) & 0xFF
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            if self._b >= 0:
                self._out.append(self._b)
            self._b = (self.c >> 19) & 0xFF
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            self._b += 1  # carry into B
            if self._b == 0x100:
                # carry ripples into already-emitted bytes
                self._b = 0
                j = len(self._out) - 1
                while j >= 0:
                    self._out[j] = (self._out[j] + 1) & 0xFF
                    if self._out[j] != 0:
                        break
                    j -= 1
            if self._b == 0xFF:
                self.c &= 0x7FFFFFF
                self._out.append(self._b)
                self._b = (self.c >> 20) & 0xFF
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                if self._b >= 0:
                    self._out.append(self._b)
                self._b = (self.c >> 19) & 0xFF
                self.c &= 0x7FFFF
                self.ct = 8

    def encode(self, cx_i: np.ndarray, cx_mps: np.ndarray, ctx: int,
               d: int) -> None:
        i = cx_i[ctx]
        mps = cx_mps[ctx]
        qe, nmps, nlps, switch = _QE[i]
        if d == mps:
            # CODEMPS
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            cx_i[ctx] = nmps
        else:
            # CODELPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                cx_mps[ctx] = 1 - mps
            cx_i[ctx] = nlps
        # RENORME
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def flush(self) -> bytes:
        # SETBITS (E.3.8): force as many low 1-bits into C as possible
        # while staying inside the final interval [C, C + A)
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        if self._b >= 0 and self._b != 0xFF:
            self._out.append(self._b)
        out = bytes(self._out)
        # trailing 0xFF bytes are implied by the decoder's past-end rule
        return out.rstrip(b"\xff")


def _new_cx() -> tuple[np.ndarray, np.ndarray]:
    """Fresh GB context state: 2^16 (index, MPS) pairs, all zero
    (T.88 §6.2.5.7: all contexts start in state 0 with MPS = 0)."""
    return (np.zeros(1 << 16, dtype=np.uint8),
            np.zeros(1 << 16, dtype=np.uint8))


_NOMINAL_AT = ((3, -1), (-3, -1), (2, -2), (-2, -2))


def generic_region_decode(
    data: bytes, width: int, height: int, tpgdon: bool = False
) -> np.ndarray:
    """Decode a GBTEMPLATE-0 / nominal-AT generic region (T.88 §6.2.5)
    into an (height, width) uint8 bitmap, 1 = black."""
    bitmap = np.zeros((height, width), dtype=np.uint8)
    dec = MQDecoder(data)
    cx_i, cx_mps = _new_cx()
    zeros = np.zeros(width, dtype=np.uint8)
    ltp = 0
    for y in range(height):
        if tpgdon:
            ltp ^= dec.decode(cx_i, cx_mps, _SLTP_CTX)
            if ltp:
                if y > 0:
                    bitmap[y] = bitmap[y - 1]
                continue
        up2 = bitmap[y - 2] if y >= 2 else zeros
        up1 = bitmap[y - 1] if y >= 1 else zeros
        row = bitmap[y]

        def gp(r: np.ndarray, x: int) -> int:
            return int(r[x]) if 0 <= x < width else 0

        # sliding context windows at x = 0 (leftmost pixel is the MSB)
        w2 = (gp(up2, 0) << 2) | (gp(up2, 1) << 1) | gp(up2, 2)
        w1 = ((gp(up1, 0) << 3) | (gp(up1, 1) << 2) | (gp(up1, 2) << 1)
              | gp(up1, 3))
        w0 = 0
        for x in range(width):
            bit = dec.decode(cx_i, cx_mps, (w2 << 11) | (w1 << 4) | w0)
            row[x] = bit
            w2 = ((w2 << 1) | gp(up2, x + 3)) & 0x1F
            w1 = ((w1 << 1) | gp(up1, x + 4)) & 0x7F
            w0 = ((w0 << 1) | bit) & 0xF
    return bitmap


def generic_region_encode(img: np.ndarray, tpgdon: bool = True) -> bytes:
    """Encode an (H, W) 0/1 bitmap (1 = black) as GBTEMPLATE-0 /
    nominal-AT MQ-coded generic region data — the exact context model of
    :func:`generic_region_decode`, so round trips are bit-exact."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    height, width = img.shape
    enc = MQEncoder()
    cx_i, cx_mps = _new_cx()
    zeros = np.zeros(width, dtype=np.uint8)
    ltp = 0
    for y in range(height):
        if tpgdon:
            prev = img[y - 1] if y > 0 else zeros
            typical = bool((img[y] == prev).all())
            enc.encode(cx_i, cx_mps, _SLTP_CTX, 1 if typical != bool(ltp)
                       else 0)
            ltp = int(typical)
            if ltp:
                continue
        up2 = img[y - 2] if y >= 2 else zeros
        up1 = img[y - 1] if y >= 1 else zeros
        row = img[y]

        def gp(r: np.ndarray, x: int) -> int:
            return int(r[x]) if 0 <= x < width else 0

        w2 = (gp(up2, 0) << 2) | (gp(up2, 1) << 1) | gp(up2, 2)
        w1 = ((gp(up1, 0) << 3) | (gp(up1, 1) << 2) | (gp(up1, 2) << 1)
              | gp(up1, 3))
        w0 = 0
        for x in range(width):
            bit = int(row[x])
            enc.encode(cx_i, cx_mps, (w2 << 11) | (w1 << 4) | w0, bit)
            w2 = ((w2 << 1) | gp(up2, x + 3)) & 0x1F
            w1 = ((w1 << 1) | gp(up1, x + 4)) & 0x7F
            w0 = ((w0 << 1) | bit) & 0xF
    return enc.flush()


# --- embedded-stream segment layer (T.88 §7.2, PDF organization) ------------


def _segment(num: int, seg_type: int, refs: tuple[int, ...], page: int,
             payload: bytes) -> bytes:
    """One segment header + payload. Short-form referred-to count (≤4 refs
    is all this writer emits); 1-byte referred-segment numbers while
    num ≤ 256 holds (T.88 §7.2.5); 1-byte page association."""
    assert len(refs) <= 4 and num <= 256
    head = struct.pack(">IB", num, seg_type & 0x3F)
    head += bytes([len(refs) << 5])
    head += bytes(r & 0xFF for r in refs)
    head += bytes([page & 0xFF])
    head += struct.pack(">I", len(payload))
    return head + payload


def jbig2_embed_encode(
    img: np.ndarray, tpgdon: bool = True, split_globals: bool = False
):
    """Encode a bilevel page (1 = black) as the embedded JBIG2 stream PDF
    expects (§7.4.7: segment sequence, no file header): page info (48) +
    immediate lossless generic region (39) + end of page (49).

    With ``split_globals`` the page-info segment is returned separately as
    a (globals_bytes, stream_bytes) pair — the /JBIG2Globals organization
    where document-scope segments live in a shared side stream."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    page_info = struct.pack(">IIIIBH", w, h, 0, 0, 0x01, 0)
    region_info = struct.pack(">IIIIB", w, h, 0, 0, 0)  # comb op 0 = OR
    gflags = bytes([0x08 if tpgdon else 0x00])  # MMR=0, template 0
    at = struct.pack("8b", 3, -1, -3, -1, 2, -2, -2, -2)
    payload = region_info + gflags + at + generic_region_encode(img, tpgdon)
    seg_page = _segment(1, 48, (), 1, page_info)
    rest = _segment(2, 39, (), 1, payload) + _segment(3, 49, (), 1, b"")
    if split_globals:
        return seg_page, rest
    return seg_page + rest


def _parse_segments(data: bytes, pos: int = 0):
    """Yield (seg_type, page, payload) from an embedded-organization
    segment stream; tolerant of the long referred-to form and 4-byte page
    associations produced by other encoders."""
    n = len(data)
    while pos < n:
        if pos + 11 > n:
            break
        num, flags = struct.unpack_from(">IB", data, pos)
        pos += 5
        seg_type = flags & 0x3F
        page4 = bool(flags & 0x40)
        rts = data[pos]
        count = rts >> 5
        if count == 7:
            count = struct.unpack_from(">I", data, pos)[0] & 0x1FFFFFFF
            pos += 4 + (count + 8) // 8  # long form + retain-bit array
        else:
            pos += 1
        ref_size = 1 if num <= 256 else (2 if num <= 65536 else 4)
        pos += count * ref_size
        page = (struct.unpack_from(">I", data, pos)[0] if page4
                else data[pos])
        pos += 4 if page4 else 1
        (length,) = struct.unpack_from(">I", data, pos)
        pos += 4
        if length == 0xFFFFFFFF:
            raise ValueError("unknown-length JBIG2 segment unsupported")
        payload = data[pos : pos + length]
        pos += length
        yield seg_type, page, payload


def _decode_region_segment(payload: bytes, page: np.ndarray) -> None:
    """Parse a generic-region segment body and composite it onto the page
    bitmap with the external combination operator (T.88 §7.4.1, §8.2)."""
    x_w, x_h, x0, y0, comb = struct.unpack_from(">IIIIB", payload, 0)
    gflags = payload[17]
    if gflags & 0x01:
        raise ValueError("MMR-coded generic region unsupported")
    template = (gflags >> 1) & 0x03
    if template != 0:
        raise ValueError(f"GBTEMPLATE {template} unsupported")
    tpgdon = bool(gflags & 0x08)
    at = struct.unpack_from("8b", payload, 18)
    if tuple(at) != (3, -1, -3, -1, 2, -2, -2, -2):
        raise ValueError("non-nominal AT pixels unsupported")
    region = generic_region_decode(payload[26:], x_w, x_h, tpgdon)
    ph, pw = page.shape
    h = min(x_h, ph - y0)
    w = min(x_w, pw - x0)
    if h <= 0 or w <= 0:
        return
    dst = page[y0 : y0 + h, x0 : x0 + w]
    src = region[:h, :w]
    op = comb & 0x07
    if op == 0:  # OR
        dst |= src
    elif op == 1:  # AND
        dst &= src
    elif op == 2:  # XOR
        dst ^= src
    elif op == 4:  # REPLACE
        dst[:] = src
    else:
        raise ValueError(f"combination operator {op} unsupported")


def jbig2_decode(data: bytes, globals_data: bytes | None = None) -> bytes:
    """PDF /JBIG2Decode filter: decode the embedded segment stream (with
    the optional /JBIG2Globals stream logically prepended, ISO 32000-1
    §7.4.7) and return the page-1 bitmap packed one bit per pixel in
    byte-padded rows, INVERTED to the decoded-sample convention of the
    image chain (0 = black — JBIG2 itself uses 1 = black, T.88 §4)."""
    page: np.ndarray | None = None
    pending: list[bytes] = []
    stream = bytes(globals_data or b"") + bytes(data)
    for seg_type, pageno, payload in _parse_segments(stream):
        if seg_type == 48:  # page information
            w, h = struct.unpack_from(">II", payload, 0)
            if h == 0xFFFFFFFF:
                # unknown height: size from the region extents seen later
                pending_h = 0
                for st2, _pg2, pl2 in _parse_segments(stream):
                    if st2 in (36, 38, 39):
                        rw, rh, rx, ry = struct.unpack_from(">IIII", pl2, 0)
                        pending_h = max(pending_h, ry + rh)
                h = pending_h
            default_pixel = (payload[16] >> 2) & 1
            page = np.full((h, w), default_pixel, dtype=np.uint8)
            for pl in pending:
                _decode_region_segment(pl, page)
            pending.clear()
        elif seg_type in (36, 38, 39):  # generic region (immediate forms)
            if page is None:
                pending.append(payload)
            else:
                _decode_region_segment(payload, page)
        elif seg_type in (49, 50, 51, 62):  # end-of-*, extension
            continue
        else:
            raise ValueError(f"JBIG2 segment type {seg_type} unsupported")
    if page is None:
        raise ValueError("JBIG2 stream has no page")
    packed = np.packbits(page, axis=1)
    return bytes((~packed).astype(np.uint8).tobytes())
