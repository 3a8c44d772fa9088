"""From-scratch baseline JPEG codec (public spec: ITU-T T.81 / ISO 10918-1,
JFIF 1.02) — stdlib + numpy only.

Why it exists here: a real multimodal training corpus is overwhelmingly
JPEG, and DCTDecode is the one PDF stream filter (ISO 32000-1 §7.4.8) the
extraction stack could not open; this container has no PIL, so the decoder
must be from scratch (VERDICT r4 item 4). Mirrors the PNG discipline in
binary_ops: real encoder (synth fixtures) + real decoder + pinned oracles.

Scope — 8-bit samples:
- baseline sequential DCT (SOF0): grayscale and YCbCr color, 4:4:4 and
  4:2:0 chroma subsampling (sampling factors 1 or 2), restart intervals
  (DRI/RSTn) on both sides,
- PROGRESSIVE DCT (SOF2, r5): full decode — spectral selection,
  successive approximation (DC + AC first/refinement scans, EOBRUN,
  §G.2/G.1.2) with any baseline-legal sampling for DC scans; and a
  progressive ENCODER (1×1 sampling, scan script DC→AC bands 1-5/6-63,
  optional one-level successive approximation, per-scan Huffman tables
  built from the true symbol stream) whose streams carry exactly the
  quantized coefficients of the baseline encoder — the differential
  identity test in test_multimodal decodes both and requires IDENTICAL
  pixels,
- standard Annex K quantization tables scaled by quality (the libjpeg
  50-point pivot formula, itself from the spec's example tables),
- standard Annex K.3.3 Huffman tables on baseline encode; arbitrary DHT
  on decode,
- byte stuffing (0xFF 0x00) per §B.1.1.5.

Decoder rejects lossless/hierarchical/arithmetic-coded streams with
ValueError — poison-tolerant callers route that to `decode_error`.

Everything is deterministic: fixed tables, fixed np.round (ties-to-even)
quantization, float64 matrix IDCT — byte-stable across runs and platforms,
pinned by sha256 digests in tests/test_multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np

# --- 8x8 DCT-II orthonormal basis (float64, deterministic) -----------------

_A = np.zeros((8, 8))
for _u in range(8):
    _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)

# zigzag order (spec Figure 5): index i walks the 8x8 block diagonally
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)
_UNZIGZAG = np.argsort(_ZIGZAG)

# Annex K.1 / K.2 example quantization tables (luminance, chrominance)
_QL = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
    ]
).reshape(8, 8)
_QC = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    ]
).reshape(8, 8)

# Annex K.3.3 standard Huffman tables: (BITS counts per length 1..16, HUFFVAL)
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _canonical_codes(bits, huffval):
    """Spec §C.2: canonical (code, length) per symbol from BITS/HUFFVAL."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _quality_table(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # §B.1.1.5 byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per §F.1.2.3


def _magnitude(v: int) -> tuple[int, int]:
    """(category, amplitude bits): negatives as one's complement (§F.1.2.1)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    bits = v if v > 0 else v + (1 << t) - 1
    return t, bits


def _encode_blocks(bw, blocks, qtab, dc_codes, ac_codes, pred):
    """Encode one component's 8x8 block (already level-shifted): DCT,
    quantize, zigzag, DC-diff + AC run-length Huffman."""
    coef = _A @ blocks @ _A.T
    q = np.round(coef / qtab).astype(np.int32)
    zz = q.reshape(64)[_ZIGZAG]
    diff = int(zz[0]) - pred
    t, bits = _magnitude(diff)
    code, length = dc_codes[t]
    bw.write(code, length)
    if t:
        bw.write(bits, t)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        t, bits = _magnitude(v)
        c, ln = ac_codes[(run << 4) | t]
        bw.write(c, ln)
        bw.write(bits, t)
        run = 0
    if last < 63:
        c, ln = ac_codes[0x00]  # EOB
        bw.write(c, ln)
    return int(zz[0])


def _dqt_segment(tid: int, tab: np.ndarray) -> bytes:
    return (
        b"\xff\xdb"
        + struct.pack(">H", 67)
        + bytes([tid])
        + bytes(int(x) for x in tab.reshape(64)[_ZIGZAG])
    )


def _dht_segment(cls: int, tid: int, table) -> bytes:
    bits, huffval = table
    payload = bytes([cls << 4 | tid]) + bytes(bits) + bytes(huffval)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload


def jpeg_encode(
    img: np.ndarray, quality: int = 75, subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode a (h, w) grayscale or (h, w, 3) RGB uint8 array as baseline
    JFIF. subsample=True emits 4:2:0 (2x2 chroma averaging); color always
    converts RGB→YCbCr (JFIF full-range BT.601). restart_interval > 0 emits
    DRI and RSTn every that many MCUs."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql = _quality_table(_QL, quality)
    qc = _quality_table(_QC, quality)

    if gray:
        comps = [img.astype(np.float64)]
    else:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [y, np.clip(cb, 0, 255), np.clip(cr, 0, 255)]

    if gray:
        sampling = [(1, 1)]
    elif subsample:
        sampling = [(2, 2), (1, 1), (1, 1)]
        for ci in (1, 2):
            c = comps[ci]
            ph = (h + 1) // 2 * 2
            pw = (w + 1) // 2 * 2
            pad = np.pad(c, ((0, ph - h), (0, pw - w)), mode="edge")
            comps[ci] = (
                pad.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            )
    else:
        sampling = [(1, 1)] * 3

    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    padded = []
    for ci, (sh, sv) in enumerate(sampling):
        cw, ch = mcux * 8 * sh, mcuy * 8 * sv
        c = comps[ci]
        padded.append(
            np.pad(
                c, ((0, ch - c.shape[0]), (0, cw - c.shape[1])), mode="edge"
            )
            - 128.0
        )

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += _dqt_segment(0, ql)
    if not gray:
        out += _dqt_segment(1, qc)
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sh, sv = sampling[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht_segment(0, 0, _DC_LUM) + _dht_segment(1, 0, _AC_LUM)
    if not gray:
        out += _dht_segment(0, 1, _DC_CHR) + _dht_segment(1, 1, _AC_CHR)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_codes = [_canonical_codes(*_DC_LUM)] + [_canonical_codes(*_DC_CHR)] * 2
    ac_codes = [_canonical_codes(*_AC_LUM)] + [_canonical_codes(*_AC_CHR)] * 2
    qtabs = [ql] + [qc] * 2
    bw = _BitWriter()
    preds = [0] * ncomp
    rst = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * ncomp
            for ci in range(ncomp):
                sh, sv = sampling[ci]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        block = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_blocks(
                            bw, block, qtabs[ci], dc_codes[ci], ac_codes[ci],
                            preds[ci],
                        )
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ---------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader: unstuffs 0xFF 0x00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        p = self.pos
        if p >= len(d):
            raise ValueError("truncated JPEG entropy data")
        b = d[p]
        if b == 0xFF:
            nxt = d[p + 1] if p + 1 < len(d) else None
            if nxt == 0x00:
                self.pos = p + 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise ValueError("hit RST inside coded unit")
            else:
                raise ValueError("truncated JPEG entropy data")
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_rst(self) -> None:
        """Drop pad bits and consume an RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        p = self.pos
        while p + 1 < len(d) and not (d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7):
            p += 1
        if p + 1 >= len(d):
            raise ValueError("expected RST marker")
        self.pos = p + 2


def _build_decode_table(bits, huffval):
    """(code, length) -> symbol map for bit-serial decode."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad Huffman code")


def _extend(v: int, t: int) -> int:
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def jpeg_decode(payload: bytes) -> np.ndarray:
    """Decode baseline JFIF → (h, w) uint8 grayscale or (h, w, 3) uint8 RGB.
    Supports baseline (SOF0/1: sampling factors 1-2, restart intervals,
    16-bit DQT entries) and PROGRESSIVE (SOF2: spectral selection +
    successive approximation) streams; rejects lossless/hierarchical/
    arithmetic-coded/12-bit streams with ValueError."""
    d = payload
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    try:
        return _parse_segments(d)
    except (struct.error, IndexError) as e:  # truncated segment bytes
        raise ValueError(f"truncated JPEG: {e}") from e


def _parse_segments(d: bytes) -> np.ndarray:
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    restart = 0
    frame = None
    progressive = False
    prog: dict | None = None  # per-component zigzag coefficient arrays
    while pos + 2 <= len(d):
        if d[pos] != 0xFF:
            raise ValueError("marker expected")
        # B.1.1.2: markers may be preceded by any number of 0xFF fill
        # bytes (ADVICE r5 — spec-legal padding desynced the parse)
        while pos + 1 < len(d) and d[pos + 1] == 0xFF:
            pos += 1
        marker = d[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / RSTn are standalone — no length field (ADVICE r5)
            pos += 2
            continue
        if pos + 4 > len(d):
            break
        (seglen,) = struct.unpack(">H", d[pos + 2 : pos + 4])
        seg = d[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tid = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq:
                    vals = np.frombuffer(
                        seg[i : i + 128], dtype=">u2"
                    ).astype(np.int32)
                    i += 128
                else:
                    vals = np.frombuffer(
                        seg[i : i + 64], dtype=np.uint8
                    ).astype(np.int32)
                    i += 64
                qt[tid] = vals[_UNZIGZAG].reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                huffval = list(seg[i + 17 : i + 17 + n])
                huff[(cls, tid)] = _build_decode_table(bits, huffval)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, fh, fw, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, sf, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, sf >> 4, sf & 0x0F, tq))
            frame = (fh, fw, comps)
            progressive = marker == 0xC2
            if progressive:
                prog = _prog_init(frame)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (lossless/arith) unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for ci in range(ns):
                cs, tt = seg[1 + 2 * ci], seg[2 + 2 * ci]
                scan.append((cs, tt >> 4, tt & 0x0F))
            if not progressive:
                return _decode_scan(d, pos, frame, scan, qt, huff, restart)
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            pos = _decode_progressive_scan(
                d, pos, frame, scan, (ss, se, ahal >> 4, ahal & 0x0F),
                huff, restart, prog,
            )
        # else: APPn/COM — skipped
    if progressive and prog is not None and prog["any_scan"]:
        return _prog_reconstruct(frame, prog, qt)
    raise ValueError("no SOS marker")


def _decode_scan(d, pos, frame, scan, qt, huff, restart):
    fh, fw, comps = frame
    byid = {cid: (sh, sv, tq) for cid, sh, sv, tq in comps}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    planes = {}
    for cid, sh, sv, _tq in comps:
        planes[cid] = np.zeros((mcuy * 8 * sv, mcux * 8 * sh))

    br = _BitReader(d, pos)
    preds = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                br.align_to_rst()
                preds = {cid: 0 for cid in preds}
            for cs, td, ta in scan:
                sh, sv, tq = byid[cs]
                dct_tab = huff.get((0, td))
                act_tab = huff.get((1, ta))
                if dct_tab is None or act_tab is None:
                    raise ValueError("missing Huffman table")
                for by in range(sv):
                    for bx in range(sh):
                        zz = np.zeros(64, dtype=np.int32)
                        t = _huff_decode(br, dct_tab)
                        diff = _extend(br.read_bits(t), t) if t else 0
                        preds[cs] += diff
                        zz[0] = preds[cs]
                        kk = 1
                        while kk < 64:
                            rs = _huff_decode(br, act_tab)
                            r, t = rs >> 4, rs & 0x0F
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                kk += 16
                                continue
                            kk += r
                            if kk > 63:
                                raise ValueError("AC index overflow")
                            zz[kk] = _extend(br.read_bits(t), t)
                            kk += 1
                        coef = (zz[_UNZIGZAG].reshape(8, 8) * qt[tq]).astype(
                            np.float64
                        )
                        block = _A.T @ coef @ _A + 128.0
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        planes[cs][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1

    return _assemble_planes(frame, planes, hmax, vmax)


def _assemble_planes(frame, planes, hmax, vmax):
    """(component planes → cropped/upsampled gray or RGB uint8) — shared by
    the baseline and progressive reconstruction paths."""
    fh, fw, comps = frame
    outs = []
    for cid, sh, sv, _tq in comps:
        p = planes[cid]
        if sh != hmax or sv != vmax:  # nearest-neighbour upsample
            p = np.repeat(np.repeat(p, vmax // sv, axis=0), hmax // sh, axis=1)
        outs.append(p[:fh, :fw])
    if len(outs) == 1:
        return np.clip(np.round(outs[0]), 0, 255).astype(np.uint8)
    y, cb, cr = outs
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- progressive (SOF2) decoding -------------------------------------------
# Spec refs: ITU-T T.81 §G.2 (decoder), G.1.2.2 (DC successive
# approximation), G.1.2.3 (AC first/refinement scans with EOBRUN).


def _prog_init(frame) -> dict:
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    coef = {}
    dims = {}
    for cid, sh, sv, _tq in comps:
        bw_pad, bh_pad = mcux * sh, mcuy * sv
        # non-interleaved block dims (§A.2.2): ceil(ceil(dim·s/smax)/8)
        comp_w = -(-fw * sh // hmax)
        comp_h = -(-fh * sv // vmax)
        bw = -(-comp_w // 8)
        bh = -(-comp_h // 8)
        coef[cid] = np.zeros((bh_pad, bw_pad, 64), dtype=np.int32)
        dims[cid] = (bw, bh, bw_pad, bh_pad)
    return {
        "coef": coef, "dims": dims,
        "hmax": hmax, "vmax": vmax, "mcux": mcux, "mcuy": mcuy,
        "any_scan": False,
    }


def _skip_to_marker(d: bytes, pos: int) -> int:
    """Advance past entropy data (incl. stuffed FF00 and RSTn) to the next
    true marker's 0xFF byte."""
    while pos + 1 < len(d):
        if d[pos] == 0xFF and d[pos + 1] != 0x00 and not (
            0xD0 <= d[pos + 1] <= 0xD7
        ):
            return pos
        pos += 1
    return len(d)


def _decode_progressive_scan(d, pos, frame, scan, params, huff, restart, prog):
    ss, se, ah, al = params
    fh, fw, comps = frame
    byid = {cid: (sh, sv, tq) for cid, sh, sv, tq in comps}
    coef = prog["coef"]
    prog["any_scan"] = True
    br = _BitReader(d, pos)
    state = {"eobrun": 0}

    def dc_table(td):
        t = huff.get((0, td))
        if t is None:
            raise ValueError("missing DC Huffman table")
        return t

    def ac_table(ta):
        t = huff.get((1, ta))
        if t is None:
            raise ValueError("missing AC Huffman table")
        return t

    if ss == 0:
        if se != 0:
            raise ValueError("progressive scan mixes DC and AC")
        preds = {cs: 0 for cs, _td, _ta in scan}
        if len(scan) > 1:  # interleaved DC scan, MCU order
            mcu_count = 0
            for my in range(prog["mcuy"]):
                for mx in range(prog["mcux"]):
                    if restart and mcu_count and mcu_count % restart == 0:
                        br.align_to_rst()
                        preds = {cs: 0 for cs in preds}
                    for cs, td, _ta in scan:
                        sh, sv, _tq = byid[cs]
                        for by in range(sv):
                            for bx in range(sh):
                                blk = coef[cs][my * sv + by, mx * sh + bx]
                                _dc_block(br, blk, dc_table(td), preds, cs,
                                          ah, al)
                    mcu_count += 1
        else:
            cs, td, _ta = scan[0]
            bw, bh, _bwp, _bhp = prog["dims"][cs]
            blk_count = 0
            for by in range(bh):
                for bx in range(bw):
                    if restart and blk_count and blk_count % restart == 0:
                        br.align_to_rst()
                        preds = {cs: 0}
                    _dc_block(br, coef[cs][by, bx], dc_table(td), preds, cs,
                              ah, al)
                    blk_count += 1
    else:
        if len(scan) != 1:
            raise ValueError("progressive AC scans are non-interleaved (§G.1)")
        cs, _td, ta = scan[0]
        bw, bh, _bwp, _bhp = prog["dims"][cs]
        tab = ac_table(ta)
        blk_count = 0
        for by in range(bh):
            for bx in range(bw):
                if restart and blk_count and blk_count % restart == 0:
                    br.align_to_rst()
                    state["eobrun"] = 0
                blk = coef[cs][by, bx]
                if ah == 0:
                    _ac_first_block(br, blk, tab, ss, se, al, state)
                else:
                    _ac_refine_block(br, blk, tab, ss, se, al, state)
                blk_count += 1

    return _skip_to_marker(d, br.pos)


def _dc_block(br, blk, tab, preds, cs, ah, al):
    if ah == 0:  # first DC scan: Huffman diff, point-transformed
        t = _huff_decode(br, tab)
        diff = _extend(br.read_bits(t), t) if t else 0
        preds[cs] += diff
        blk[0] = preds[cs] << al
    else:  # refinement: one raw bit per block (G.1.2.2)
        if br.read_bit():
            blk[0] |= 1 << al


def _ac_first_block(br, blk, tab, ss, se, al, state):
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _huff_decode(br, tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            state["eobrun"] = (1 << r) - 1  # EOBn (G.1.2.3)
            if r:
                state["eobrun"] += br.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC index overflow in progressive scan")
        blk[k] = _extend(br.read_bits(s), s) << al
        k += 1


def _ac_refine_block(br, blk, tab, ss, se, al, state):
    """G.1.2.3 AC refinement: correction bits for already-nonzero history
    coefficients, newly-significant ±1<<Al insertions, EOBRUN blocks still
    consume correction bits."""
    p1 = 1 << al
    m1 = -1 << al

    def corr_walk(k):
        """read correction bits for every history coefficient k..se"""
        while k <= se:
            if blk[k] != 0:
                if br.read_bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1

    k = ss
    if state["eobrun"] > 0:  # block fully inside a previous EOBn run
        corr_walk(k)
        state["eobrun"] -= 1
        return
    hit_eob = False
    while k <= se:
        rs = _huff_decode(br, tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r < 15:  # EOBn: covers THIS block (tail walk below, no
                # decrement — the stored count is for FOLLOWING blocks)
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += br.read_bits(r)
                hit_eob = True
                break
            # ZRL: skip 16 zero-HISTORY coefficients
            val = 0
        else:
            if s != 1:
                raise ValueError("bad refinement magnitude")
            val = p1 if br.read_bit() else m1
        while k <= se:
            if blk[k] != 0:  # history coefficient: correction bit
                if br.read_bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
            else:
                if r == 0:
                    if val:
                        blk[k] = val
                    k += 1
                    break
                r -= 1
            k += 1
        else:
            break
        # the for/while dance mirrors libjpeg's decode_mcu_AC_refine
    if hit_eob:
        corr_walk(k)


def _prog_reconstruct(frame, prog, qt):
    fh, fw, comps = frame
    planes = {}
    for cid, sh, sv, tq in comps:
        carr = prog["coef"][cid]
        bh_pad, bw_pad = carr.shape[0], carr.shape[1]
        plane = np.zeros((bh_pad * 8, bw_pad * 8))
        q = qt[tq]
        for by in range(bh_pad):
            for bx in range(bw_pad):
                zz = carr[by, bx]
                c = (zz[_UNZIGZAG].reshape(8, 8) * q).astype(np.float64)
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _A.T @ c @ _A + 128.0
                )
        planes[cid] = plane
    return _assemble_planes(frame, planes, prog["hmax"], prog["vmax"])


# --- progressive (SOF2) encoding -------------------------------------------
# Spectral selection + successive approximation (ITU-T T.81 §G.1), scan
# script: interleaved DC-first (point transform Al), DC refinement, then
# per-component AC band scans (1-5, 6-63) at Al followed by their
# refinement scans. Per-scan Huffman tables are built from the actual
# symbol stream (equal-length canonical codes — valid, decodable, spec-
# legal; the standard Annex K tables lack the EOBn symbols progressive
# scans need). Sampling is 1x1 (gray or 4:4:4): progressive AC scans are
# non-interleaved by spec, and 1x1 keeps DC MCU order == raster order.


def _build_equal_length_table(symbols):
    """Canonical Huffman table over the distinct symbols, all codes the
    same length L = ceil(log2(n+1)) — never assigns the all-ones code."""
    syms = sorted(set(symbols))
    n = len(syms)
    lng = 1
    while (1 << lng) - 1 < n:
        lng += 1
    bits = [0] * 16
    bits[lng - 1] = n
    return bits, syms


class _ScanOps:
    """Buffered scan: records (symbol, extra-bit) ops so the Huffman table
    can be built from the true symbol distribution, then serialized."""

    def __init__(self) -> None:
        self.ops: list[tuple[str, int, int]] = []  # ("sym", s, 0)|("bits", v, n)
        self.symbols: list[int] = []

    def sym(self, s: int) -> None:
        self.ops.append(("sym", s, 0))
        self.symbols.append(s)

    def bits(self, v: int, n: int) -> None:
        if n:
            self.ops.append(("bits", v, n))

    def serialize(self, bw: "_BitWriter", codes) -> None:
        for kind, a, b in self.ops:
            if kind == "sym":
                c, ln = codes[a]
                bw.write(c, ln)
            else:
                bw.write(a, b)


def _quantized_blocks(comps, ql, qc, w, h):
    """Per component: (bh, bw, 64) int32 zigzag coefficient array."""
    out = []
    for ci, plane in enumerate(comps):
        q = ql if ci == 0 else qc
        bh, bwid = -(-h // 8), -(-w // 8)
        pad = np.pad(
            plane, ((0, bh * 8 - h), (0, bwid * 8 - w)), mode="edge"
        ) - 128.0
        arr = np.zeros((bh, bwid, 64), dtype=np.int32)
        for by in range(bh):
            for bx in range(bwid):
                block = pad[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                zz = np.round((_A @ block @ _A.T) / q).astype(np.int32)
                arr[by, bx] = zz.reshape(64)[_ZIGZAG]
        out.append(arr)
    return out


def _enc_dc_first(arrs, al):
    dcops = [_ScanOps() for _ in arrs]
    preds = [0] * len(arrs)
    bh, bwid = arrs[0].shape[0], arrs[0].shape[1]
    for by in range(bh):
        for bx in range(bwid):
            for ci, arr in enumerate(arrs):
                v = int(arr[by, bx, 0]) >> al  # arithmetic shift (G.1.2.1)
                diff = v - preds[ci]
                preds[ci] = v
                t, bits = _magnitude(diff)
                dcops[ci].sym(t)
                dcops[ci].bits(bits, t)
    return dcops


def _enc_ac_scan(arr, ss, se, ah, al):
    """One component's AC scan ops: first scan (ah==0) or refinement."""
    ops = _ScanOps()
    eobrun = 0
    br_bits: list[int] = []

    def emit_eobrun():
        nonlocal eobrun, br_bits
        if eobrun > 0:
            nb = eobrun.bit_length() - 1
            ops.sym(nb << 4)
            ops.bits(eobrun - (1 << nb), nb)
            eobrun = 0
            for b in br_bits:
                ops.bits(b, 1)
            br_bits = []

    bh, bwid = arr.shape[0], arr.shape[1]
    for by in range(bh):
        for bx in range(bwid):
            zz = arr[by, bx]
            if ah == 0:  # first scan at this Al
                r = 0
                for k in range(ss, se + 1):
                    v = int(zz[k])
                    t = (abs(v) >> al) * (1 if v >= 0 else -1)
                    if t == 0:
                        r += 1
                        continue
                    if eobrun:
                        emit_eobrun()
                    while r > 15:
                        ops.sym(0xF0)
                        r -= 16
                    s, bits = _magnitude(t)
                    ops.sym((r << 4) | s)
                    ops.bits(bits, s)
                    r = 0
                if r > 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        emit_eobrun()
            else:  # refinement scan (ah = al+1 conceptually; bits at al)
                r = 0
                # correction bits as (zeros_before_within_run, bit): the
                # decoder consumes a history coefficient's bit during the
                # symbol WALK that crosses it — a ZRL's walk ends after its
                # 16th zero, so bits whose position lies past that span
                # belong to the NEXT symbol, not to this ZRL (the r5 desync
                # bug: flushing everything after the first ZRL)
                pend: list[tuple[int, int]] = []
                for k in range(ss, se + 1):
                    v = int(zz[k])
                    t = abs(v) >> al
                    if t == 0:
                        r += 1
                        continue
                    if t > 1:  # already significant: buffered correction bit
                        pend.append((r, (abs(v) >> al) & 1))
                        continue
                    # newly significant (t == 1)
                    if eobrun:
                        emit_eobrun()
                    while r > 15:
                        ops.sym(0xF0)
                        keep = []
                        for pz, b in pend:
                            if pz < 16:
                                ops.bits(b, 1)
                            else:
                                keep.append((pz - 16, b))
                        pend = keep
                        r -= 16
                    ops.sym((r << 4) | 1)
                    ops.bits(1 if v > 0 else 0, 1)
                    for _pz, b in pend:
                        ops.bits(b, 1)
                    pend = []
                    r = 0
                if r > 0 or pend:
                    eobrun += 1
                    br_bits.extend(b for _pz, b in pend)
                    if eobrun == 0x7FFF or len(br_bits) > 900:
                        emit_eobrun()
    emit_eobrun()
    return ops


def _emit_scan(out, ops_per_table, sos_comps, ss, se, ah, al, cls):
    """DHT(s) for this scan (equal-length tables from the true symbol
    stream) + SOS header + entropy data."""
    codes_by_tid = {}
    for tid, ops in ops_per_table.items():
        bits, syms = _build_equal_length_table(ops.symbols or [0])
        out += _dht_segment(cls, tid, (bits, syms))
        codes_by_tid[tid] = _canonical_codes(bits, syms)
    sos = bytes([len(sos_comps)])
    for cid, tid in sos_comps:
        sos += bytes([cid, (tid << 4) if cls == 0 else tid])
    sos += bytes([ss, se, (ah << 4) | al])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    bw = _BitWriter()
    if len(sos_comps) > 1:  # interleaved DC: ops already in MCU order,
        # but they were buffered per component — interleave by replaying
        # is handled by caller passing a single merged ops; not used here
        raise AssertionError("interleaved emission handled by _emit_dc_scan")
    (_cid, tid0) = sos_comps[0]
    ops_per_table[tid0].serialize(bw, codes_by_tid[tid0])
    bw.flush()
    out += bw.out
    return out


def jpeg_encode_progressive(
    img: np.ndarray, quality: int = 75, successive: bool = True
) -> bytes:
    """Encode (h, w) gray or (h, w, 3) RGB uint8 as PROGRESSIVE JFIF
    (SOF2): spectral selection (DC; AC 1-5; AC 6-63) and, with
    successive=True, one level of successive approximation (Al=1 first
    scans + refinement scans) on both DC and AC. The stream carries
    exactly the same quantized coefficients as jpeg_encode at the same
    quality, so decoding both must give IDENTICAL pixels — pinned in
    test_multimodal."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql = _quality_table(_QL, quality)
    qc = _quality_table(_QC, quality)
    if gray:
        planes = [img.astype(np.float64)]
    else:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            np.clip(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0, 0, 255),
            np.clip(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0, 0, 255),
        ]
    arrs = _quantized_blocks(planes, ql, qc, w, h)
    nc = len(arrs)
    al1 = 1 if successive else 0

    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += _dqt_segment(0, ql)
    if nc > 1:
        out += _dqt_segment(1, qc)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof  # SOF2

    # --- DC first scan (interleaved across components, MCU==block order)
    dcops = _enc_dc_first(arrs, al1)
    tids = [0 if ci == 0 else 1 for ci in range(nc)]
    dc_tables = {}
    for tid in sorted(set(tids)):
        syms = [s for ci in range(nc) if tids[ci] == tid
                for s in dcops[ci].symbols]
        bits, sv = _build_equal_length_table(syms or [0])
        out += _dht_segment(0, tid, (bits, sv))
        dc_tables[tid] = _canonical_codes(bits, sv)
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, tids[ci] << 4])
    sos += bytes([0, 0, (0 << 4) | al1])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    bw = _BitWriter()
    # interleave: replay per-MCU (block) in component order
    per_comp_ops = [iter(o.ops) for o in dcops]
    bh, bwid = arrs[0].shape[0], arrs[0].shape[1]
    for _ in range(bh * bwid):
        for ci in range(nc):
            it = per_comp_ops[ci]
            kind, a, b = next(it)
            assert kind == "sym"
            c, ln = dc_tables[tids[ci]][a]
            bw.write(c, ln)
            if a:  # magnitude bits follow the symbol
                kind2, v2, n2 = next(it)
                bw.write(v2, n2)
    bw.flush()
    out += bw.out

    # --- DC refinement scan (raw bits, no Huffman)
    if successive:
        sos = bytes([nc])
        for ci in range(nc):
            sos += bytes([ci + 1, 0])
        sos += bytes([0, 0, (1 << 4) | 0])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        bw = _BitWriter()
        for by in range(bh):
            for bx in range(bwid):
                for ci in range(nc):
                    bw.write(int(arrs[ci][by, bx, 0]) & 1, 1)
        bw.flush()
        out += bw.out

    # --- AC band scans per component (non-interleaved, spec §G.1)
    for ci in range(nc):
        tid = tids[ci]
        for ss, se in ((1, 5), (6, 63)):
            ops = _enc_ac_scan(arrs[ci], ss, se, 0, al1)
            out = bytearray(
                _emit_scan(bytearray(out), {tid: ops}, [(ci + 1, tid)],
                           ss, se, 0, al1, 1)
            )
    if successive:
        for ci in range(nc):
            tid = tids[ci]
            for ss, se in ((1, 5), (6, 63)):
                ops = _enc_ac_scan(arrs[ci], ss, se, 1, 0)
                out = bytearray(
                    _emit_scan(bytearray(out), {tid: ops}, [(ci + 1, tid)],
                               ss, se, 1, 0, 1)
                )

    out += b"\xff\xd9"
    return bytes(out)
