"""From-scratch CCITT Group 4 (ITU-T T.6, MMR) bilevel codec — both
directions — for the PDF `/CCITTFaxDecode` filter (ISO 32000-1 §7.4.6,
K < 0 pure-2D case, the variant scanned-book PDFs actually use;
VERDICT r5 item 4: after /DCTDecode, G4 is the remaining high-frequency
image filter in a real scanned corpus).

Public-spec implementation: the 2-D coding modes (pass / horizontal /
vertical ±3) are T.6 §2.2, the run-length Huffman tables shared with
Group 3 1-D (white/black terminating 0–63, make-up 64–1728, shared
extended make-up 1792–2560) are T.4 §4.1/Tables 2–4. No EOL codes exist
in G4; the stream ends with EOFB (two EOLs) or when /Rows rows are done.

Internal pixel convention: 1 = black (the run-color the spec's tables are
named by). The PDF-facing mapping (/BlackIs1 default false → 0 bits mean
black in DECODED output) happens in :func:`ccittfax_decode`.

Reference analog for placement: the reference corpus is books
(/root/reference/docs/PRD.md) — i.e., scanned pages in the wild; its
LLMSherpa service would meet G4 constantly. The decode discipline mirrors
multimodal/jpeg.py: synth writer + decoder + pinned query + differential
round-trip tests.
"""

from __future__ import annotations

from bisect import bisect_right

import numpy as np

# --- T.4 §4.1 run-length code tables: run -> bit string ---------------------

_WHITE_TERM = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
}
_WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100",
    1024: "011010101", 1088: "011010110", 1152: "011010111",
    1216: "011011000", 1280: "011011001", 1344: "011011010",
    1408: "011011011", 1472: "010011000", 1536: "010011001",
    1600: "010011010", 1664: "011000", 1728: "010011011",
}
_BLACK_TERM = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011",
    5: "0011", 6: "0010", 7: "00011", 8: "000101", 9: "000100",
    10: "0000100", 11: "0000101", 12: "0000111", 13: "00000100",
    14: "00000111", 15: "000011000", 16: "0000010111",
    17: "0000011000", 18: "0000001000", 19: "00001100111",
    20: "00001101000", 21: "00001101100", 22: "00000110111",
    23: "00000101000", 24: "00000010111", 25: "00000011000",
    26: "000011001010", 27: "000011001011", 28: "000011001100",
    29: "000011001101", 30: "000001101000", 31: "000001101001",
    32: "000001101010", 33: "000001101011", 34: "000011010010",
    35: "000011010011", 36: "000011010100", 37: "000011010101",
    38: "000011010110", 39: "000011010111", 40: "000001101100",
    41: "000001101101", 42: "000011011010", 43: "000011011011",
    44: "000001010100", 45: "000001010101", 46: "000001010110",
    47: "000001010111", 48: "000001100100", 49: "000001100101",
    50: "000001010010", 51: "000001010011", 52: "000000100100",
    53: "000000110111", 54: "000000111000", 55: "000000100111",
    56: "000000101000", 57: "000001011000", 58: "000001011001",
    59: "000000101011", 60: "000000101100", 61: "000001011010",
    62: "000001100110", 63: "000001100111",
}
_BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}
# extended make-ups (T.4 Table 4) are shared by both colors
_EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

_MODE_PASS = "0001"
_MODE_HORIZ = "001"
_MODE_V = {0: "1", 1: "011", 2: "000011", 3: "0000011",
           -1: "010", -2: "000010", -3: "0000010"}
_EOFB = "000000000001" * 2

# decode maps: (nbits, value) -> run, per color (terminating + make-up +
# shared extended make-up merged — run magnitude distinguishes them)
def _decode_map(term, makeup):
    out = {}
    for tbl in (term, makeup, _EXT_MAKEUP):
        for run, bits in tbl.items():
            out[(len(bits), int(bits, 2))] = run
    return out


_WHITE_DEC = _decode_map(_WHITE_TERM, _WHITE_MAKEUP)
_BLACK_DEC = _decode_map(_BLACK_TERM, _BLACK_MAKEUP)
_MODE_DEC = {
    (len(b), int(b, 2)): m
    for m, b in [("P", _MODE_PASS), ("H", _MODE_HORIZ)]
    + [(f"V{d:+d}" if d else "V0", bits) for d, bits in _MODE_V.items()]
}
_MAX_MODE_BITS = 7
_MAX_RUN_BITS = 13


class _BitWriter:
    __slots__ = ("buf", "acc", "n")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, bits: str) -> None:
        for c in bits:
            self.acc = (self.acc << 1) | (c == "1")
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.n = 0

    def bytes(self) -> bytes:
        if self.n:
            self.buf.append(self.acc << (8 - self.n))
            self.acc = 0
            self.n = 0
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def bits_left(self) -> int:
        return len(self.data) * 8 - self.pos

    def peek(self, n: int) -> int:
        """Next n bits MSB-first (zero-padded past the end)."""
        v = 0
        for i in range(n):
            p = self.pos + i
            bit = 0
            if p < len(self.data) * 8:
                bit = (self.data[p >> 3] >> (7 - (p & 7))) & 1
            v = (v << 1) | bit
        return v

    def skip(self, n: int) -> None:
        self.pos += n


def _run_bits(run: int, color: int) -> str:
    """MH encoding of one run: make-ups (largest ≤ run, repeated while
    run ≥ 64 — runs beyond 2560 take several) then the terminating code."""
    term = _BLACK_TERM if color else _WHITE_TERM
    makeup = _BLACK_MAKEUP if color else _WHITE_MAKEUP
    out = []
    while run >= 64:
        if run >= 1792:
            mk = min(2560, run - run % 64)
            code = _EXT_MAKEUP[mk]
        else:
            mk = run - run % 64
            code = makeup[mk]
        # a make-up must leave a decodable remainder (the terminating code
        # carries run % 64, so stepping down by full make-ups is exact)
        out.append(code)
        run -= mk
    out.append(term[run])
    return "".join(out)


def _read_run(r: _BitReader, color: int) -> int:
    """Decode one MH run (make-ups accumulate until a terminating code)."""
    table = _BLACK_DEC if color else _WHITE_DEC
    total = 0
    while True:
        for n in range(2, _MAX_RUN_BITS + 1):
            hit = table.get((n, r.peek(n)))
            if hit is not None:
                r.skip(n)
                total += hit
                if hit < 64:
                    return total
                break
        else:
            raise ValueError("bad CCITT run code")


def _changes(row: np.ndarray) -> list[int]:
    """Positions where the color changes, imaginary white pixel before the
    row (T.6 §2.2.1); changing element index parity encodes the color:
    even = white→black transition."""
    prev = np.concatenate(([0], row[:-1]))
    return np.nonzero(row != prev)[0].tolist()


def _b1_b2(ref: list[int], a0: int, color: int, width: int) -> tuple[int, int]:
    """b1 = first changing element of the reference line right of a0 with
    opposite color to a0's color; b2 = the next one after b1. Transitions
    alternate, even index = white→black — exactly the transition a white
    (color 0) a0 needs, so the required index parity IS `color`."""
    i = bisect_right(ref, a0)
    if (i & 1) != color:
        i += 1
    b1 = ref[i] if i < len(ref) else width
    b2 = ref[i + 1] if i + 1 < len(ref) else width
    return b1, b2


def g4_encode(img: np.ndarray) -> bytes:
    """Encode a (h, w) array of {0,1} (1 = black) as a G4/MMR stream with a
    trailing EOFB, bit-padded to a byte."""
    img = np.ascontiguousarray(img).astype(np.uint8)
    h, w = img.shape
    out = _BitWriter()
    ref: list[int] = []  # imaginary all-white reference line
    for y in range(h):
        cur = _changes(img[y])
        a0, color = -1, 0
        while a0 < w:
            b1, b2 = _b1_b2(ref, a0, color, w)
            # a1 = next changing element of the CODING line right of a0 of
            # opposite color to a0 — same parity rule as b1
            i = bisect_right(cur, a0)
            if (i & 1) != color:
                i += 1
            a1 = cur[i] if i < len(cur) else w
            if b2 < a1:
                out.write(_MODE_PASS)
                a0 = b2
            elif abs(a1 - b1) <= 3:
                out.write(_MODE_V[a1 - b1])
                a0 = a1
                color ^= 1
            else:
                j = i + 1
                a2 = cur[j] if j < len(cur) else w
                start = 0 if a0 < 0 else a0
                out.write(_MODE_HORIZ)
                out.write(_run_bits(a1 - start, color))
                out.write(_run_bits(a2 - a1, color ^ 1))
                a0 = a2
        ref = cur
    out.write(_EOFB)
    return out.bytes()


def g4_decode(data: bytes, columns: int, rows: int | None = None) -> np.ndarray:
    """Decode a G4/MMR stream to a (h, columns) array of {0,1} (1 = black).
    Stops after `rows` rows when given, else at EOFB / end of data."""
    r = _BitReader(data)
    w = columns
    ref: list[int] = []
    out_rows: list[np.ndarray] = []
    while rows is None or len(out_rows) < rows:
        if r.bits_left() < 1:
            break
        if r.bits_left() >= 24 and r.peek(24) == int(_EOFB, 2):
            r.skip(24)
            break
        cur: list[int] = []
        a0, color = -1, 0
        while a0 < w:
            mode = None
            for n in range(1, _MAX_MODE_BITS + 1):
                mode = _MODE_DEC.get((n, r.peek(n)))
                if mode is not None:
                    r.skip(n)
                    break
            if mode is None:
                raise ValueError("bad CCITT mode code")
            b1, b2 = _b1_b2(ref, a0, color, w)
            if mode == "P":
                a0 = b2
            elif mode == "H":
                start = 0 if a0 < 0 else a0
                run1 = _read_run(r, color)
                run2 = _read_run(r, color ^ 1)
                a1 = start + run1
                a2 = a1 + run2
                cur.extend((a1, a2))
                a0 = a2
            else:  # vertical
                delta = int(mode[1:]) if mode != "V0" else 0
                a1 = b1 + delta
                cur.append(a1)
                a0 = a1
                color ^= 1
        # render the row from its transitions (entries at `w` are run-ends,
        # not pixel changes), then CANONICALIZE the reference line from the
        # rendered pixels — this keeps decoder-side bookkeeping identical
        # to the encoder's _changes() even if a degenerate horizontal run
        # produced duplicate transition entries
        flips = np.zeros(w + 1, dtype=np.uint8)
        for c in cur:
            if c < w:
                flips[c] ^= 1
        row = np.bitwise_xor.accumulate(flips[:-1]).astype(np.uint8)
        out_rows.append(row)
        ref = _changes(row)
    if not out_rows:
        return np.zeros((0, w), dtype=np.uint8)
    return np.stack(out_rows)


def ccittfax_decode(
    data: bytes,
    columns: int = 1728,
    rows: int | None = None,
    k: int = -1,
    black_is_1: bool = False,
) -> bytes:
    """The PDF `/CCITTFaxDecode` surface (§7.4.6): returns the decoded
    image as packed 1-bit rows, each row padded to a byte boundary —
    exactly what an image XObject with /BitsPerComponent 1 expects. With
    the default /BlackIs1 false, 0 bits are black (the DeviceGray sense),
    so the internal 1=black convention is inverted on output."""
    if k >= 0:
        raise ValueError("only G4 (K < 0) CCITT data is supported")
    bits = g4_decode(data, columns, rows)
    if not black_is_1:
        bits = 1 - bits
    return np.packbits(bits, axis=1).tobytes()


def ccittfax_encode(img: np.ndarray, black_is_1: bool = False) -> bytes:
    """Encode a (h, w) {0,1} array for a PDF /CCITTFaxDecode stream. The
    input uses the DECODED-sample convention that matches black_is_1 (with
    the default false: 0 = black), mirroring ccittfax_decode."""
    img = np.ascontiguousarray(img).astype(np.uint8)
    if not black_is_1:
        img = 1 - img
    return g4_encode(img)
