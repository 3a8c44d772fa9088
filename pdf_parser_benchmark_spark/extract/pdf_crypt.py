"""PDF Standard security handler (public spec: PDF 1.7 / ISO 32000-1 §7.6)
— RC4 (V1/V2, R2/R3) and AES-128-CBC (V4 /AESV2, R4), empty-user-password
flows, plus the symmetric encrypt side used by the synthetic corpus writer.

The reference gets encrypted-PDF handling implicitly from PyMuPDF
(/root/reference/src/ingest.py:50,135 — fitz.open transparently decrypts
empty-user-password files, which are common in the wild); this module is the
from-scratch stdlib equivalent. AES is implemented from FIPS-197 (public);
RC4 from its well-known public description. All key-derivation algorithms
cite the spec algorithm numbers they implement.
"""

from __future__ import annotations

from hashlib import md5

# §7.6.3.3 padding string (Algorithm 2 step a)
PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _padded(pwd: bytes) -> bytes:
    return (pwd + PAD)[:32]


# ---------------------------------------------------------------------------
# RC4
# ---------------------------------------------------------------------------

def rc4(key: bytes, data: bytes) -> bytes:
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = b ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# ---------------------------------------------------------------------------
# AES-128 (FIPS-197), CBC mode, PKCS#7 padding — tables derived, not pasted
# ---------------------------------------------------------------------------

def _build_tables():
    exp = [0] * 510
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        # multiply by generator 3 = x*2 ^ x in GF(2^8)
        x ^= ((x << 1) ^ 0x1B) & 0xFF if x & 0x80 else (x << 1)
    for i in range(255, 510):
        exp[i] = exp[i - 255]
    sbox = []
    for i in range(256):
        q = 0 if i == 0 else exp[255 - log[i]]  # multiplicative inverse
        s = q
        for _ in range(4):  # affine transform
            q = ((q << 1) | (q >> 7)) & 0xFF
            s ^= q
        sbox.append(s ^ 0x63)
    inv = [0] * 256
    for i, v in enumerate(sbox):
        inv[v] = i
    return exp, log, sbox, inv


_EXP, _LOG, _SBOX, _INV_SBOX = _build_tables()


def _gmul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return _EXP[_LOG[a] + _LOG[b]]


def _key_expansion(key: bytes) -> list[list[int]]:
    """128-bit key → 11 round keys of 16 bytes (as flat lists, col-major)."""
    w = [list(key[4 * i : 4 * i + 4]) for i in range(4)]
    rcon = 1
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= rcon
            rcon = ((rcon << 1) ^ 0x1B) & 0xFF if rcon & 0x80 else rcon << 1
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    return [sum(w[4 * r : 4 * r + 4], []) for r in range(11)]


def _shift_rows(s: list[int], inverse: bool = False) -> list[int]:
    out = [0] * 16
    for r in range(4):
        for c in range(4):
            src = (c + r) % 4 if not inverse else (c - r) % 4
            out[r + 4 * c] = s[r + 4 * src]
    return out


def _mix_columns(s: list[int], inverse: bool = False) -> list[int]:
    m = (14, 11, 13, 9) if inverse else (2, 3, 1, 1)
    out = [0] * 16
    for c in range(4):
        col = s[4 * c : 4 * c + 4]
        for r in range(4):
            out[r + 4 * c] = (
                _gmul(m[0], col[r])
                ^ _gmul(m[1], col[(r + 1) % 4])
                ^ _gmul(m[2], col[(r + 2) % 4])
                ^ _gmul(m[3], col[(r + 3) % 4])
            )
    return out


def _aes_encrypt_block(rk: list[list[int]], block: bytes) -> bytes:
    s = [b ^ k for b, k in zip(block, rk[0])]
    for rnd in range(1, 10):
        s = [_SBOX[b] for b in s]
        s = _shift_rows(s)
        s = _mix_columns(s)
        s = [b ^ k for b, k in zip(s, rk[rnd])]
    s = [_SBOX[b] for b in s]
    s = _shift_rows(s)
    return bytes(b ^ k for b, k in zip(s, rk[10]))


def _aes_decrypt_block(rk: list[list[int]], block: bytes) -> bytes:
    s = [b ^ k for b, k in zip(block, rk[10])]
    s = _shift_rows(s, inverse=True)
    s = [_INV_SBOX[b] for b in s]
    for rnd in range(9, 0, -1):
        s = [b ^ k for b, k in zip(s, rk[rnd])]
        s = _mix_columns(s, inverse=True)
        s = _shift_rows(s, inverse=True)
        s = [_INV_SBOX[b] for b in s]
    return bytes(b ^ k for b, k in zip(s, rk[0]))


def aes_cbc_encrypt(key: bytes, data: bytes, iv: bytes) -> bytes:
    """→ iv + ciphertext, PKCS#7-padded (the PDF AESV2 stream layout)."""
    rk = _key_expansion(key)
    padlen = 16 - (len(data) % 16)
    data = data + bytes([padlen]) * padlen
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _aes_encrypt_block(rk, blk)
        out += prev
    return bytes(out)


_NP_TABLES = None


def _np_tables():
    """numpy lookup tables for the vectorized decrypt path (built lazily)."""
    global _NP_TABLES
    if _NP_TABLES is None:
        import numpy as np

        inv_sbox = np.array(_INV_SBOX, dtype=np.uint8)
        gmul = {
            m: np.array([_gmul(m, x) for x in range(256)], dtype=np.uint8)
            for m in (9, 11, 13, 14)
        }
        # inverse ShiftRows as a flat 16-permutation (row r shifts right r)
        perm = np.empty(16, dtype=np.int64)
        for r in range(4):
            for c in range(4):
                perm[r + 4 * c] = r + 4 * ((c - r) % 4)
        _NP_TABLES = (np, inv_sbox, gmul, perm)
    return _NP_TABLES


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """iv-prefixed ciphertext → plaintext with PKCS#7 padding stripped.

    CBC DECRYPTION is block-parallel (p_i = D(c_i) ⊕ c_{i−1}) — the block
    function runs vectorized over ALL blocks with numpy table lookups, then
    one shifted XOR applies the chaining. ~10× the scalar loop; encryption
    stays scalar (CBC chaining is inherently sequential, and the writer
    only runs at fixture-generation time)."""
    if len(data) < 32 or len(data) % 16:
        raise ValueError("bad AES-CBC payload")
    np, inv_sbox, gmul, perm = _np_tables()
    rk = _key_expansion(key)
    buf = np.frombuffer(data, dtype=np.uint8)
    ct = buf[16:].reshape(-1, 16)  # blocks
    prev = buf[:-16].reshape(-1, 16)  # iv + all-but-last blocks (chaining)

    s = ct ^ np.array(rk[10], dtype=np.uint8)
    s = s[:, perm]
    s = inv_sbox[s]
    for rnd in range(9, 0, -1):
        s = s ^ np.array(rk[rnd], dtype=np.uint8)
        # InvMixColumns on the (n, 4, 4) column-major view
        v = s.reshape(-1, 4, 4)  # [block, column, row]
        m = (
            gmul[14][v]
            ^ gmul[11][np.roll(v, -1, axis=2)]
            ^ gmul[13][np.roll(v, -2, axis=2)]
            ^ gmul[9][np.roll(v, -3, axis=2)]
        )
        s = m.reshape(-1, 16)
        s = s[:, perm]
        s = inv_sbox[s]
    plain = (s ^ np.array(rk[0], dtype=np.uint8)) ^ prev
    out = plain.tobytes()
    padlen = out[-1]
    if not 1 <= padlen <= 16:
        raise ValueError("bad PKCS#7 padding")
    return out[:-padlen]


# ---------------------------------------------------------------------------
# Standard security handler key algorithms (§7.6.3)
# ---------------------------------------------------------------------------

def compute_owner_hash(owner_pwd: bytes, user_pwd: bytes, r: int, key_len: int) -> bytes:
    """Algorithm 3: the /O entry."""
    h = md5(_padded(owner_pwd or user_pwd)).digest()
    if r >= 3:
        for _ in range(50):
            h = md5(h).digest()
    rc4_key = h[:key_len]
    o = rc4(rc4_key, _padded(user_pwd))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in rc4_key), o)
    return o


def compute_file_key(
    user_pwd: bytes,
    o: bytes,
    p: int,
    id0: bytes,
    r: int,
    key_len: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the file encryption key from the (empty) user password."""
    buf = _padded(user_pwd) + o[:32] + (p & 0xFFFFFFFF).to_bytes(4, "little") + id0
    if r >= 4 and not encrypt_metadata:
        buf += b"\xff\xff\xff\xff"
    h = md5(buf).digest()
    if r >= 3:
        for _ in range(50):
            h = md5(h[:key_len]).digest()
    return h[:key_len]


def compute_user_hash(file_key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithm 4 (R2) / Algorithm 5 (R≥3): the /U entry."""
    if r == 2:
        return rc4(file_key, PAD)
    h = md5(PAD + id0).digest()
    u = rc4(file_key, h)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in file_key), u)
    return u + b"\x00" * 16


def user_password_matches(u: bytes, file_key: bytes, id0: bytes, r: int) -> bool:
    """Algorithm 6: verify the (empty) user password against /U.
    R≥3 compares only the first 16 bytes (spec: the rest is arbitrary)."""
    expect = compute_user_hash(file_key, id0, r)
    return (u[:16] == expect[:16]) if r >= 3 else (u[:32] == expect[:32])


def object_key(file_key: bytes, num: int, gen: int, aes: bool) -> bytes:
    """Algorithm 1: per-object key (md5 of file key + objnum/gen LE bytes,
    plus the 'sAlT' marker for AESV2)."""
    ext = num.to_bytes(3, "little") + gen.to_bytes(2, "little")
    if aes:
        ext += b"sAlT"
    h = md5(file_key + ext).digest()
    return h[: min(len(file_key) + 5, 16)]


def decrypt_bytes(data: bytes, file_key: bytes, num: int, gen: int, aes: bool) -> bytes:
    k = object_key(file_key, num, gen, aes)
    return aes_cbc_decrypt(k, data) if aes else rc4(k, data)


def encrypt_bytes(
    data: bytes, file_key: bytes, num: int, gen: int, aes: bool
) -> bytes:
    k = object_key(file_key, num, gen, aes)
    if not aes:
        return rc4(k, data)
    iv = md5(b"deterministic-iv:%d" % num).digest()  # writer-side: golden fixtures need byte-stable output
    return aes_cbc_encrypt(k, data, iv)
