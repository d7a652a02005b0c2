"""PDF standard security handler (RC4, revisions 2 and 3) — stdlib only.

Retires the "encrypted PDFs are typed errors" limitation for the
common real-world case: files encrypted with the *standard* handler
and an empty user password (the shape produced by "protect this PDF"
tools — readable by any viewer without a prompt, but encrypted on
disk). Algorithms are from the public PDF 1.7 specification
(ISO 32000-1 §7.6.3, Algorithms 2-6): MD5 key derivation over the
padded password, per-object RC4 keys, and O/U verification entries.

Files that genuinely need a password (the empty-password key fails the
/U check) raise ``ValueError('password required')`` so the Spark
source surfaces a typed error row. AES (/V 4+) is out of scope and
raises naming the feature.

RC4 here is a from-scratch PRGA/KSA (public algorithm); it is pure
Python and therefore ~MB/s — fine for the fixture/test path, and the
decrypt cost is dwarfed by raster decode in the pipeline.
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
) -> bytes:
    """Algorithm 2: the file encryption key from the user password."""
    md = hashlib.md5()
    md.update(_pad_password(user_password))
    md.update(owner_entry[:32])
    md.update(struct.pack("<i", permissions))
    md.update(id1)
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


def object_key(fkey: bytes, num: int, gen: int = 0) -> bytes:
    """Algorithm 1: the per-object RC4 key."""
    md = hashlib.md5(
        fkey + struct.pack("<I", num)[:3] + struct.pack("<H", gen)[:2]
    ).digest()
    return md[: min(len(fkey) + 5, 16)]


def decrypt_object(fkey: bytes, num: int, data: bytes, gen: int = 0) -> bytes:
    return rc4(object_key(fkey, num, gen), data)


#: encrypt == decrypt for RC4.
encrypt_object = decrypt_object
