"""PDF standard security handler — RC4 (R2/R3) and AES-128 (V4/R4
/AESV2) — stdlib only.

Retires the "encrypted PDFs are typed errors" limitation for the
common real-world cases: files encrypted with the *standard* handler
and an empty user password (the shape produced by "protect this PDF"
tools — readable by any viewer without a prompt, but encrypted on
disk), in both the legacy RC4 form and the post-2006 AES-128-CBC
crypt-filter form. Algorithms are from the public specifications:
ISO 32000-1 §7.6.3 Algorithms 1-6 (MD5 key derivation over the padded
password, per-object keys, O/U verification entries) and FIPS-197
(AES, with the S-box generated from its algebraic definition and the
cipher pinned by the published appendix vectors).

Files that genuinely need a password (the empty-password key fails the
/U check) raise ``ValueError('password required')`` so the Spark
source surfaces a typed error row; unknown crypt filters (AESV3/
AES-256) raise naming the feature.

Both ciphers are from-scratch pure Python (~MB/s) — fine for the
fixture/test path, and decrypt cost is dwarfed by raster decode in
the pipeline. The fixture corpus plants RC4 files (length-preserving,
cheap at 5000-file scale); AES is exercised by the test suite.
"""

from __future__ import annotations

import hashlib
import struct

#: ISO 32000-1 §7.6.3.3 padding constant.
PAD = bytes.fromhex(
    "28BF4E5E4E758A4164004E56FFFA01082E2E00B6D0683E802F0CA9FE6453697A"
)


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (KSA + PRGA). Symmetric: encrypt == decrypt."""
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, byte in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = byte ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _pad_password(pwd: bytes) -> bytes:
    return (pwd + PAD)[:32]


def file_key(
    owner_entry: bytes,
    permissions: int,
    id1: bytes,
    revision: int,
    key_bytes: int,
    user_password: bytes = b"",
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the file encryption key from the user password."""
    md = hashlib.md5()
    md.update(_pad_password(user_password))
    md.update(owner_entry[:32])
    md.update(struct.pack("<i", permissions))
    md.update(id1)
    if revision >= 4 and not encrypt_metadata:
        md.update(b"\xff\xff\xff\xff")
    key = md.digest()[:key_bytes]
    if revision >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:key_bytes]).digest()[:key_bytes]
    return key


def owner_entry(
    key_bytes: int, revision: int, owner_password: bytes = b"", user_password: bytes = b""
) -> bytes:
    """Algorithm 3: the /O dictionary entry."""
    digest = hashlib.md5(_pad_password(owner_password)).digest()
    if revision >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest).digest()
    okey = digest[:key_bytes]
    o = rc4(okey, _pad_password(user_password))
    if revision >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in okey), o)
    return o


def user_entry(fkey: bytes, id1: bytes, revision: int) -> bytes:
    """Algorithm 4 (R2) / 5 (R3): the /U dictionary entry."""
    if revision == 2:
        return rc4(fkey, PAD)
    h = hashlib.md5(PAD + id1).digest()
    u = rc4(fkey, h)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in fkey), u)
    return u + b"\x00" * 16


def check_user_password(
    fkey: bytes, user_entry_stored: bytes, id1: bytes, revision: int
) -> bool:
    """Algorithm 6: does the derived key open the file?"""
    expect = user_entry(fkey, id1, revision)
    if revision == 2:
        return expect == user_entry_stored[:32]
    return expect[:16] == user_entry_stored[:16]


def object_key(fkey: bytes, num: int, gen: int = 0, aes: bool = False) -> bytes:
    """Algorithm 1: the per-object key. AES (/AESV2) appends the
    ``sAlT`` constant before hashing."""
    md = hashlib.md5(
        fkey
        + struct.pack("<I", num)[:3]
        + struct.pack("<H", gen)[:2]
        + (b"sAlT" if aes else b"")
    ).digest()
    return md[: min(len(fkey) + 5, 16)]


def decrypt_object(fkey: bytes, num: int, data: bytes, gen: int = 0) -> bytes:
    return rc4(object_key(fkey, num, gen), data)


#: encrypt == decrypt for RC4.
encrypt_object = decrypt_object


# ---------------------------------------------------------------------------
# AES-128 (FIPS-197, public standard) — needed for /V 4 /AESV2 files,
# the default "encrypted but readable" shape modern producers emit.
# The S-box is generated from its algebraic definition (GF(2^8)
# inverse + affine transform) rather than transcribed; the canonical
# FIPS-197 appendix-B vector pins the whole cipher in tests.
# ---------------------------------------------------------------------------


def _gf_mul(a: int, b: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        a <<= 1
        if a & 0x100:
            a ^= 0x11B
        b >>= 1
    return r


def _build_sbox() -> tuple[list[int], list[int]]:
    # multiplicative inverse via x^254 (Fermat in GF(2^8))
    def inv(x: int) -> int:
        if x == 0:
            return 0
        r, p, e = 1, x, 254
        while e:
            if e & 1:
                r = _gf_mul(r, p)
            p = _gf_mul(p, p)
            e >>= 1
        return r

    sbox, inv_sbox = [0] * 256, [0] * 256
    for x in range(256):
        y = inv(x)
        s = 0
        for i in range(8):
            bit = (
                (y >> i)
                ^ (y >> ((i + 4) % 8))
                ^ (y >> ((i + 5) % 8))
                ^ (y >> ((i + 6) % 8))
                ^ (y >> ((i + 7) % 8))
                ^ (0x63 >> i)
            ) & 1
            s |= bit << i
        sbox[x] = s
        inv_sbox[s] = x
    return sbox, inv_sbox


_SBOX, _INV_SBOX = _build_sbox()
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]
#: Precomputed GF(2^8) multiplication columns for MixColumns and its
#: inverse — the per-block hot path.
_MUL = {c: [_gf_mul(x, c) for x in range(256)] for c in (2, 3, 9, 11, 13, 14)}


def _expand_key(key: bytes) -> list[list[int]]:
    """AES-128 key schedule -> 11 round keys of 16 bytes each."""
    w = [list(key[i : i + 4]) for i in range(0, 16, 4)]
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // 4 - 1]
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    return [sum(w[4 * r : 4 * r + 4], []) for r in range(11)]


def _aes128_decrypt_block(rk: list[list[int]], block: bytes) -> bytes:
    # state is column-major per FIPS-197: s[r][c] = in[r + 4c]
    s = [[block[r + 4 * c] for c in range(4)] for r in range(4)]

    def add_round_key(k):
        for c in range(4):
            for r in range(4):
                s[r][c] ^= k[r + 4 * c]

    def inv_shift_rows():
        for r in range(1, 4):
            s[r] = s[r][-r:] + s[r][:-r]

    def inv_sub_bytes():
        for r in range(4):
            s[r] = [_INV_SBOX[b] for b in s[r]]

    def inv_mix_columns():
        for c in range(4):
            a = [s[r][c] for r in range(4)]
            s[0][c] = _MUL[14][a[0]] ^ _MUL[11][a[1]] ^ _MUL[13][a[2]] ^ _MUL[9][a[3]]
            s[1][c] = _MUL[9][a[0]] ^ _MUL[14][a[1]] ^ _MUL[11][a[2]] ^ _MUL[13][a[3]]
            s[2][c] = _MUL[13][a[0]] ^ _MUL[9][a[1]] ^ _MUL[14][a[2]] ^ _MUL[11][a[3]]
            s[3][c] = _MUL[11][a[0]] ^ _MUL[13][a[1]] ^ _MUL[9][a[2]] ^ _MUL[14][a[3]]

    add_round_key(rk[10])
    for rnd in range(9, 0, -1):
        inv_shift_rows()
        inv_sub_bytes()
        add_round_key(rk[rnd])
        inv_mix_columns()
    inv_shift_rows()
    inv_sub_bytes()
    add_round_key(rk[0])
    return bytes(s[r][c] for c in range(4) for r in range(4))


def _aes128_encrypt_block(rk: list[list[int]], block: bytes) -> bytes:
    s = [[block[r + 4 * c] for c in range(4)] for r in range(4)]

    def add_round_key(k):
        for c in range(4):
            for r in range(4):
                s[r][c] ^= k[r + 4 * c]

    def sub_bytes():
        for r in range(4):
            s[r] = [_SBOX[b] for b in s[r]]

    def shift_rows():
        for r in range(1, 4):
            s[r] = s[r][r:] + s[r][:r]

    def mix_columns():
        for c in range(4):
            a = [s[r][c] for r in range(4)]
            s[0][c] = _MUL[2][a[0]] ^ _MUL[3][a[1]] ^ a[2] ^ a[3]
            s[1][c] = a[0] ^ _MUL[2][a[1]] ^ _MUL[3][a[2]] ^ a[3]
            s[2][c] = a[0] ^ a[1] ^ _MUL[2][a[2]] ^ _MUL[3][a[3]]
            s[3][c] = _MUL[3][a[0]] ^ a[1] ^ a[2] ^ _MUL[2][a[3]]

    add_round_key(rk[0])
    for rnd in range(1, 10):
        sub_bytes()
        shift_rows()
        mix_columns()
        add_round_key(rk[rnd])
    sub_bytes()
    shift_rows()
    add_round_key(rk[10])
    return bytes(s[r][c] for c in range(4) for r in range(4))


def aes128_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """AESV2 stream layout: 16-byte IV prefix, CBC body, PKCS#5-padded.
    Malformed lengths/padding raise ``ValueError`` (error-as-row)."""
    if len(key) != 16:
        raise ValueError("AESV2 needs a 16-byte key")
    if len(data) < 32 or len(data) % 16:
        raise ValueError("AES-CBC stream has invalid length")
    rk = _expand_key(key)
    iv, body = data[:16], data[16:]
    out = bytearray()
    prev = iv
    for i in range(0, len(body), 16):
        block = body[i : i + 16]
        plain = _aes128_decrypt_block(rk, block)
        out += bytes(a ^ b for a, b in zip(plain, prev))
        prev = block
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytes([pad]) * pad:
        raise ValueError("bad AES-CBC padding (wrong key or corrupt stream)")
    return bytes(out[:-pad])


def aes128_cbc_encrypt(key: bytes, data: bytes, iv: bytes) -> bytes:
    if len(key) != 16 or len(iv) != 16:
        raise ValueError("AESV2 needs 16-byte key and IV")
    rk = _expand_key(key)
    pad = 16 - len(data) % 16
    body = data + bytes([pad]) * pad
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(body), 16):
        block = bytes(a ^ b for a, b in zip(body[i : i + 16], prev))
        prev = _aes128_encrypt_block(rk, block)
        out += prev
    return bytes(out)
