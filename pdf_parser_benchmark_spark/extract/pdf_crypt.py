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
# optional fast primitives: AES/RC4 are fixed public algorithms, so when the
# `cryptography` wheel (OpenSSL-backed) is importable the byte-identical fast
# path is used — the from-scratch implementations below stay the reference
# (and the fallback when the wheel is absent), pinned equal by
# tests/test_pdf_encrypt.py. Same import-guard pattern as the PIL/ffmpeg
# boundaries in multimodal/binary_ops.py. R6's Algorithm 2.B KDF encrypts
# thousands of CBC blocks per password check, which made AES-256 R6 documents
# ~60× slower to open than plain ones on the pure-Python block function.
# ---------------------------------------------------------------------------

try:  # pragma: no cover - exercised whenever the wheel is installed
    from cryptography.hazmat.primitives.ciphers import Cipher as _Cipher
    from cryptography.hazmat.primitives.ciphers.algorithms import AES as _AES
    from cryptography.hazmat.primitives.ciphers.modes import CBC as _CBC

    try:  # ≥43 moved RC4 under hazmat.decrepit
        from cryptography.hazmat.decrepit.ciphers.algorithms import ARC4 as _ARC4
    except ImportError:  # pragma: no cover
        from cryptography.hazmat.primitives.ciphers.algorithms import (  # type: ignore
            ARC4 as _ARC4,
        )

    _HAVE_CRYPTOGRAPHY = True
except ImportError:  # pragma: no cover
    _HAVE_CRYPTOGRAPHY = False

# ARC4() validates key bit-lengths; PDF derives 5..16-byte keys, so odd sizes
# (e.g. 6-byte /Length 48) must stay on the from-scratch path
_ARC4_KEY_SIZES = frozenset({5, 7, 8, 10, 16, 20, 24, 32})
_AES_KEY_SIZES = frozenset({16, 24, 32})


# ---------------------------------------------------------------------------
# RC4
# ---------------------------------------------------------------------------

def rc4(key: bytes, data: bytes) -> bytes:
    if _HAVE_CRYPTOGRAPHY and len(key) in _ARC4_KEY_SIZES:
        enc = _Cipher(_ARC4(key), mode=None).encryptor()
        return enc.update(data) + enc.finalize()
    return _rc4_pure(key, data)


def _rc4_pure(key: bytes, data: bytes) -> bytes:
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
    """AES-128 or AES-256 key → 11 / 15 round keys (flat 16-byte lists).
    FIPS-197 key schedule; Nk=8 adds the extra SubWord at i % 8 == 4."""
    nk = len(key) // 4
    assert nk in (4, 8), "AES-128 or AES-256 only"
    rounds = 10 if nk == 4 else 14
    w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (rounds + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= rcon
            rcon = ((rcon << 1) ^ 0x1B) & 0xFF if rcon & 0x80 else rcon << 1
        elif nk == 8 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return [sum(w[4 * r : 4 * r + 4], []) for r in range(rounds + 1)]


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
    rounds = len(rk) - 1
    s = [b ^ k for b, k in zip(block, rk[0])]
    for rnd in range(1, rounds):
        s = [_SBOX[b] for b in s]
        s = _shift_rows(s)
        s = _mix_columns(s)
        s = [b ^ k for b, k in zip(s, rk[rnd])]
    s = [_SBOX[b] for b in s]
    s = _shift_rows(s)
    return bytes(b ^ k for b, k in zip(s, rk[rounds]))


def _aes_decrypt_block(rk: list[list[int]], block: bytes) -> bytes:
    rounds = len(rk) - 1
    s = [b ^ k for b, k in zip(block, rk[rounds])]
    s = _shift_rows(s, inverse=True)
    s = [_INV_SBOX[b] for b in s]
    for rnd in range(rounds - 1, 0, -1):
        s = [b ^ k for b, k in zip(s, rk[rnd])]
        s = _mix_columns(s, inverse=True)
        s = _shift_rows(s, inverse=True)
        s = [_INV_SBOX[b] for b in s]
    return bytes(b ^ k for b, k in zip(s, rk[0]))


# T-table encryption (classic public technique: merge SubBytes+ShiftRows+
# MixColumns into four 256-entry 32-bit lookups) — ~5× the naive rounds;
# used on every encrypt path incl. the R6 hardened hash's inner CBC
def _build_te():
    te0 = []
    for x in range(256):
        s = _SBOX[x]
        g2, g3 = _gmul(2, s), _gmul(3, s)
        te0.append((g2 << 24) | (s << 16) | (s << 8) | g3)
    ror = lambda v, n: ((v >> n) | (v << (32 - n))) & 0xFFFFFFFF
    te1 = [ror(v, 8) for v in te0]
    te2 = [ror(v, 16) for v in te0]
    te3 = [ror(v, 24) for v in te0]
    return te0, te1, te2, te3


_TE0, _TE1, _TE2, _TE3 = _build_te()


def _rk_words(rk: list[list[int]]) -> list[list[int]]:
    return [
        [
            (r[4 * c] << 24) | (r[4 * c + 1] << 16) | (r[4 * c + 2] << 8) | r[4 * c + 3]
            for c in range(4)
        ]
        for r in rk
    ]


def _enc_block_words(rkw: list[list[int]], w0: int, w1: int, w2: int, w3: int):
    t0, t1, t2, t3 = _TE0, _TE1, _TE2, _TE3
    k = rkw[0]
    w0 ^= k[0]; w1 ^= k[1]; w2 ^= k[2]; w3 ^= k[3]  # noqa: E702
    rounds = len(rkw) - 1
    for r in range(1, rounds):
        k = rkw[r]
        n0 = t0[w0 >> 24] ^ t1[(w1 >> 16) & 0xFF] ^ t2[(w2 >> 8) & 0xFF] ^ t3[w3 & 0xFF] ^ k[0]
        n1 = t0[w1 >> 24] ^ t1[(w2 >> 16) & 0xFF] ^ t2[(w3 >> 8) & 0xFF] ^ t3[w0 & 0xFF] ^ k[1]
        n2 = t0[w2 >> 24] ^ t1[(w3 >> 16) & 0xFF] ^ t2[(w0 >> 8) & 0xFF] ^ t3[w1 & 0xFF] ^ k[2]
        n3 = t0[w3 >> 24] ^ t1[(w0 >> 16) & 0xFF] ^ t2[(w1 >> 8) & 0xFF] ^ t3[w2 & 0xFF] ^ k[3]
        w0, w1, w2, w3 = n0, n1, n2, n3
    sb = _SBOX
    k = rkw[rounds]
    o0 = ((sb[w0 >> 24] << 24) | (sb[(w1 >> 16) & 0xFF] << 16) | (sb[(w2 >> 8) & 0xFF] << 8) | sb[w3 & 0xFF]) ^ k[0]
    o1 = ((sb[w1 >> 24] << 24) | (sb[(w2 >> 16) & 0xFF] << 16) | (sb[(w3 >> 8) & 0xFF] << 8) | sb[w0 & 0xFF]) ^ k[1]
    o2 = ((sb[w2 >> 24] << 24) | (sb[(w3 >> 16) & 0xFF] << 16) | (sb[(w0 >> 8) & 0xFF] << 8) | sb[w1 & 0xFF]) ^ k[2]
    o3 = ((sb[w3 >> 24] << 24) | (sb[(w0 >> 16) & 0xFF] << 16) | (sb[(w1 >> 8) & 0xFF] << 8) | sb[w2 & 0xFF]) ^ k[3]
    return o0, o1, o2, o3


def _cbc_encrypt_words(key: bytes, data: bytes, iv: bytes) -> bytes:
    """Chained CBC encrypt (no padding). OpenSSL when available, else the
    32-bit-word T-table block function."""
    if _HAVE_CRYPTOGRAPHY and len(key) in _AES_KEY_SIZES:
        enc = _Cipher(_AES(key), _CBC(iv)).encryptor()
        return enc.update(data) + enc.finalize()
    return _cbc_encrypt_words_pure(key, data, iv)


def _cbc_encrypt_words_pure(key: bytes, data: bytes, iv: bytes) -> bytes:
    """Chained CBC encrypt in 32-bit words, T-table block function."""
    import struct

    rkw = _rk_words(_key_expansion(key))
    v0, v1, v2, v3 = struct.unpack(">4I", iv)
    out = bytearray()
    pack = struct.Struct(">4I").pack
    for i in range(0, len(data), 16):
        p0, p1, p2, p3 = struct.unpack_from(">4I", data, i)
        v0, v1, v2, v3 = _enc_block_words(rkw, p0 ^ v0, p1 ^ v1, p2 ^ v2, p3 ^ v3)
        out += pack(v0, v1, v2, v3)
    return bytes(out)


def aes_cbc_encrypt(key: bytes, data: bytes, iv: bytes) -> bytes:
    """→ iv + ciphertext, PKCS#7-padded (the PDF AESV2 stream layout)."""
    padlen = 16 - (len(data) % 16)
    data = data + bytes([padlen]) * padlen
    return iv + _cbc_encrypt_words(key, data, iv)


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
    OpenSSL-backed when `cryptography` is importable, else the vectorized
    numpy fallback below."""
    if len(data) < 32 or len(data) % 16:
        raise ValueError("bad AES-CBC payload")
    if _HAVE_CRYPTOGRAPHY and len(key) in _AES_KEY_SIZES:
        dec = _Cipher(_AES(key), _CBC(data[:16])).decryptor()
        out = dec.update(data[16:]) + dec.finalize()
        padlen = out[-1]
        if not 1 <= padlen <= 16:
            raise ValueError("bad PKCS#7 padding")
        return out[:-padlen]
    return _aes_cbc_decrypt_pure(key, data)


def _aes_cbc_decrypt_pure(key: bytes, data: bytes) -> bytes:
    """From-scratch decrypt: CBC decryption is block-parallel
    (p_i = D(c_i) ⊕ c_{i−1}) — the block function runs vectorized over ALL
    blocks with numpy table lookups, then one shifted XOR applies the
    chaining. ~10× the scalar loop; encryption stays scalar (CBC chaining
    is inherently sequential)."""
    np, inv_sbox, gmul, perm = _np_tables()
    rk = _key_expansion(key)
    rounds = len(rk) - 1
    buf = np.frombuffer(data, dtype=np.uint8)
    ct = buf[16:].reshape(-1, 16)  # blocks
    prev = buf[:-16].reshape(-1, 16)  # iv + all-but-last blocks (chaining)

    s = ct ^ np.array(rk[rounds], dtype=np.uint8)
    s = s[:, perm]
    s = inv_sbox[s]
    for rnd in range(rounds - 1, 0, -1):
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


def _cbc_encrypt_nopad(key: bytes, data: bytes, iv: bytes) -> bytes:
    """Raw AES-CBC, no padding, no IV prefix (the R6 building block)."""
    assert len(data) % 16 == 0
    return _cbc_encrypt_words(key, data, iv)


def _cbc_decrypt_nopad(key: bytes, data: bytes, iv: bytes) -> bytes:
    assert len(data) % 16 == 0
    if _HAVE_CRYPTOGRAPHY and len(key) in _AES_KEY_SIZES:
        dec = _Cipher(_AES(key), _CBC(iv)).decryptor()
        return dec.update(data) + dec.finalize()
    return _cbc_decrypt_nopad_pure(key, data, iv)


def _cbc_decrypt_nopad_pure(key: bytes, data: bytes, iv: bytes) -> bytes:
    rk = _key_expansion(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(_aes_decrypt_block(rk, blk), prev))
        prev = blk
    return bytes(out)


# ---------------------------------------------------------------------------
# AES-256 revision 6 (PDF 2.0 / ISO 32000-2 §7.6.4; Adobe ext. level 3)
# ---------------------------------------------------------------------------

def hash_2b(pwd: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """Algorithm 2.B: the hardened SHA-2 iterated hash of R6."""
    from hashlib import sha256, sha384, sha512

    k = sha256(pwd + salt + udata).digest()
    i = 0
    while True:
        k1 = (pwd + k + udata) * 64
        e = _cbc_encrypt_nopad(k[:16], k1, k[16:32])
        mod = sum(e[:16]) % 3
        k = (sha256, sha384, sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def r6_user_entries(
    file_key: bytes, vsalt: bytes, ksalt: bytes, pwd: bytes = b""
) -> tuple[bytes, bytes]:
    """Algorithm 8: → (/U 48 bytes, /UE 32 bytes) for the given user pwd."""
    u = hash_2b(pwd, vsalt) + vsalt + ksalt
    intermediate = hash_2b(pwd, ksalt)
    ue = _cbc_encrypt_nopad(intermediate, file_key, b"\x00" * 16)
    return u, ue


def r6_verify_owner_password(pwd: bytes, o: bytes, u: bytes) -> bool:
    """Algorithm 12: hash(owner pwd + validation salt + U[0:48]) == O[0:32]."""
    return hash_2b(pwd, o[32:40], u[:48]) == o[:32]


def r6_retrieve_file_key_owner(pwd: bytes, o: bytes, oe: bytes, u: bytes) -> bytes:
    """Algorithm 9 retrieval: decrypt /OE with the owner key-salt
    intermediate (udata = the 48-byte /U)."""
    intermediate = hash_2b(pwd, o[40:48], u[:48])
    return _cbc_decrypt_nopad(intermediate, oe, b"\x00" * 16)


def r6_owner_entries(
    owner_pwd: bytes, file_key: bytes, u: bytes, vsalt: bytes, ksalt: bytes
) -> tuple[bytes, bytes]:
    """Algorithm 9: → (/O 48 bytes, /OE 32 bytes); udata = the 48-byte /U."""
    o = hash_2b(owner_pwd, vsalt, u[:48]) + vsalt + ksalt
    intermediate = hash_2b(owner_pwd, ksalt, u[:48])
    oe = _cbc_encrypt_nopad(intermediate, file_key, b"\x00" * 16)
    return o, oe


def r6_verify_user_password(pwd: bytes, u: bytes) -> bool:
    """Algorithm 11: hash(pwd + validation salt) == U[0:32]."""
    return hash_2b(pwd, u[32:40]) == u[:32]


def r6_retrieve_file_key(pwd: bytes, u: bytes, ue: bytes) -> bytes:
    """Algorithm 8 retrieval: decrypt /UE with the key-salt intermediate."""
    intermediate = hash_2b(pwd, u[40:48])
    return _cbc_decrypt_nopad(intermediate, ue, b"\x00" * 16)


def r5_user_entries(
    file_key: bytes, vsalt: bytes, ksalt: bytes, pwd: bytes = b""
) -> tuple[bytes, bytes]:
    """Revision 5 (legacy AES-256, Adobe ExtensionLevel 3) /U + /UE:
    plain single-pass SHA-256 — NO Algorithm 2.B."""
    from hashlib import sha256

    u = sha256(pwd + vsalt).digest() + vsalt + ksalt
    intermediate = sha256(pwd + ksalt).digest()
    ue = _cbc_encrypt_nopad(intermediate, file_key, b"\x00" * 16)
    return u, ue


def r5_verify_user_password(pwd: bytes, u: bytes) -> bool:
    """R5 analog of Algorithm 11: sha256(pwd + validation salt) == U[0:32]."""
    from hashlib import sha256

    return sha256(pwd + u[32:40]).digest() == u[:32]


def r5_retrieve_file_key(pwd: bytes, u: bytes, ue: bytes) -> bytes:
    """R5 retrieval: decrypt /UE with sha256(pwd + key salt)."""
    from hashlib import sha256

    intermediate = sha256(pwd + u[40:48]).digest()
    return _cbc_decrypt_nopad(intermediate, ue, b"\x00" * 16)


def r5_owner_entries(
    owner_pwd: bytes, file_key: bytes, u: bytes, vsalt: bytes, ksalt: bytes
) -> tuple[bytes, bytes]:
    """R5 analog of Algorithm 9 (ADVICE r3): /O + /OE with single-pass
    sha256(pwd + salt + U[0:48]) — no Algorithm 2.B hardening."""
    from hashlib import sha256

    o = sha256(owner_pwd + vsalt + u[:48]).digest() + vsalt + ksalt
    intermediate = sha256(owner_pwd + ksalt + u[:48]).digest()
    oe = _cbc_encrypt_nopad(intermediate, file_key, b"\x00" * 16)
    return o, oe


def r5_verify_owner_password(pwd: bytes, o: bytes, u: bytes) -> bool:
    """R5 analog of Algorithm 12: sha256(pwd + vsalt + U[0:48]) == O[0:32]."""
    from hashlib import sha256

    return sha256(pwd + o[32:40] + u[:48]).digest() == o[:32]


def r5_retrieve_file_key_owner(pwd: bytes, o: bytes, oe: bytes, u: bytes) -> bytes:
    """R5 owner retrieval: decrypt /OE with sha256(pwd + ksalt + U[0:48])."""
    from hashlib import sha256

    intermediate = sha256(pwd + o[40:48] + u[:48]).digest()
    return _cbc_decrypt_nopad(intermediate, oe, b"\x00" * 16)


def r6_check_perms(file_key: bytes, perms: bytes) -> bool:
    """Algorithm 13: decrypt /Perms and check the 'adb' marker — validates
    a retrieved file key with ONE AES block instead of a second hardened
    2.B pass (the 2.B cost is PBKDF-like by design; halving the per-open
    cost matters at corpus scale)."""
    blk = _aes_decrypt_block(_key_expansion(file_key), perms[:16])
    return blk[9:12] == b"adb"


def r6_perms(file_key: bytes, p: int, encrypt_metadata: bool = True) -> bytes:
    """Algorithm 10: the /Perms entry (AES-ECB of the perms block)."""
    blk = (
        (p & 0xFFFFFFFF).to_bytes(4, "little")
        + b"\xff\xff\xff\xff"
        + (b"T" if encrypt_metadata else b"F")
        + b"adb"
        + b"seed"  # 4 bytes 'random' — deterministic for byte-stable fixtures
    )
    return _aes_encrypt_block(_key_expansion(file_key), blk)


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


def recover_user_password(owner_pwd: bytes, o: bytes, r: int, key_len: int) -> bytes:
    """Algorithm 7 (R2-R4): decrypt /O with the owner-pass RC4 key to
    recover the padded user password (returned padded; feed to Algorithm 2
    via compute_file_key, which re-pads idempotently)."""
    h = md5(_padded(owner_pwd)).digest()
    if r >= 3:
        for _ in range(50):
            h = md5(h).digest()
    rc4_key = h[:key_len]
    user = o
    if r == 2:
        user = rc4(rc4_key, user)
    else:
        for i in range(19, -1, -1):
            user = rc4(bytes(b ^ i for b in rc4_key), user)
    return user


def object_key(file_key: bytes, num: int, gen: int, aes: bool) -> bytes:
    """Algorithm 1: per-object key (md5 of file key + objnum/gen LE bytes,
    plus the 'sAlT' marker for AESV2)."""
    ext = num.to_bytes(3, "little") + gen.to_bytes(2, "little")
    if aes:
        ext += b"sAlT"
    h = md5(file_key + ext).digest()
    return h[: min(len(file_key) + 5, 16)]


def decrypt_bytes(
    data: bytes, file_key: bytes, num: int, gen: int, aes: bool, r6: bool = False
) -> bytes:
    # R6 (AES-256) uses the FILE key directly — no per-object derivation
    k = file_key if r6 else object_key(file_key, num, gen, aes)
    return aes_cbc_decrypt(k, data) if aes else rc4(k, data)


def encrypt_bytes(
    data: bytes, file_key: bytes, num: int, gen: int, aes: bool, r6: bool = False
) -> bytes:
    k = file_key if r6 else object_key(file_key, num, gen, aes)
    if not aes:
        return rc4(k, data)
    iv = md5(b"deterministic-iv:%d" % num).digest()  # writer-side: golden fixtures need byte-stable output
    return aes_cbc_encrypt(k, data, iv)
