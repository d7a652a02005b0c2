"""From-scratch PDF stream-filter codecs: predictors and LZW.

Real-world Flate image XObjects (and most 1.5+ cross-reference
streams) are written with a PNG predictor — ISO 32000-1 §7.4.4.4,
Table 10: ``/DecodeParms << /Predictor 12 /Columns w ... >>`` — and a
long tail of legacy producers emit ``/LZWDecode`` streams (§7.4.4.2).
The reference gets both free through Poppler
(/root/reference/app.py:447-454); this module implements them from
scratch so the Spark-side subset parser accepts those files instead of
emitting typed error rows.

Predictors operate on the DECODED byte stream: TIFF predictor 2 is
horizontal differencing per sample; PNG predictors (10-15) prefix each
``Columns * bpp``-byte row with a PNG filter-type byte (0 None, 1 Sub,
2 Up, 3 Average, 4 Paeth — RFC 2083 §6) applied over the *decoded*
previous row. The declared /Predictor value ≥10 only says "PNG
predictor family"; the per-row byte decides the actual filter, so a
decoder must dispatch per row, not per stream.

LZW here is the PDF/TIFF variant: 8-bit samples, code width 9→12
bits, MSB-first bit packing, code 256 = clear table, 257 = EOD, and
the ``EarlyChange`` wrinkle (default 1: the code width bumps one
entry *early*, at table sizes 511/1023/2047).

Everything is numpy-vectorized where the dependency structure allows
(Sub/Average/Paeth carry a byte-serial dependency inside the row, but
rows are short; Up and TIFF-2 vectorize fully).
"""

from __future__ import annotations

import re

import numpy as np


# ---------------------------------------------------------------------------
# Predictors
# ---------------------------------------------------------------------------


def _bpp(colors: int, bpc: int) -> int:
    """Bytes per complete pixel, min 1 (sub-byte depths predict on
    whole bytes, per the PNG spec's bpp definition)."""
    return max(1, (colors * bpc) // 8)


def _row_bytes(columns: int, colors: int, bpc: int) -> int:
    return (columns * colors * bpc + 7) // 8


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def predictor_decode(
    data: bytes,
    predictor: int,
    columns: int,
    colors: int = 1,
    bpc: int = 8,
) -> bytes:
    """Undo the declared /Predictor over a decompressed stream.

    Predictor 1 is identity, 2 is TIFF horizontal differencing, >=10
    is the PNG family (row-prefixed filter bytes). Truncated input is
    a typed ``ValueError`` (the Spark source turns it into an error
    row), except a PNG-family trailing partial row, which real
    encoders do emit and readers tolerate by dropping it.
    """
    if predictor == 1:
        return data
    if predictor == 2:
        if bpc != 8:
            raise ValueError(
                "TIFF predictor with BitsPerComponent %d is outside the subset" % bpc
            )
        rb = _row_bytes(columns, colors, bpc)
        if len(data) % rb:
            raise ValueError("TIFF-predicted stream is not whole rows")
        a = np.frombuffer(data, dtype=np.uint8).reshape(-1, columns, colors)
        return np.cumsum(a, axis=1, dtype=np.uint8).tobytes()
    if predictor >= 10:
        rb = _row_bytes(columns, colors, bpc)
        bpp = _bpp(colors, bpc)
        stride = rb + 1
        n_rows = len(data) // stride
        if n_rows == 0 and data:
            raise ValueError("PNG-predicted stream shorter than one row")
        raw = np.frombuffer(data[: n_rows * stride], dtype=np.uint8).reshape(
            n_rows, stride
        )
        filters = raw[:, 0]
        rows = raw[:, 1:].astype(np.int16)  # headroom for sums
        prev = np.zeros(rb, dtype=np.int16)
        out = np.empty((n_rows, rb), dtype=np.uint8)
        for r in range(n_rows):
            f, row = int(filters[r]), rows[r]
            if f == 0:
                cur = row & 0xFF
            elif f == 2:  # Up — vectorized, the common /Predictor 12 case
                cur = (row + prev) & 0xFF
            elif f == 1:  # Sub — serial in-row
                cur = row.copy()
                for i in range(bpp, rb):
                    cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
            elif f == 3:  # Average
                cur = row.copy()
                for i in range(rb):
                    left = cur[i - bpp] if i >= bpp else 0
                    cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
            elif f == 4:  # Paeth
                cur = row.copy()
                for i in range(rb):
                    left = int(cur[i - bpp]) if i >= bpp else 0
                    upleft = int(prev[i - bpp]) if i >= bpp else 0
                    cur[i] = (cur[i] + _paeth(left, int(prev[i]), upleft)) & 0xFF
            else:
                raise ValueError("invalid PNG filter type %d in predicted stream" % f)
            out[r] = cur
            prev = cur.astype(np.int16)
        return out.tobytes()
    raise ValueError("unsupported /Predictor %d" % predictor)


def predictor_encode(
    data: bytes,
    predictor: int,
    columns: int,
    colors: int = 1,
    bpc: int = 8,
) -> bytes:
    """Apply a predictor for writing (fixture generation + round-trip
    tests). PNG-family values pick one fixed filter per stream — 10
    None, 11 Sub, 12 Up, 13 Average, 14 Paeth; 15 chooses per row by
    the standard minimum-sum-of-absolute-differences heuristic."""
    if predictor == 1:
        return data
    rb = _row_bytes(columns, colors, bpc)
    if len(data) % rb:
        raise ValueError("stream is not whole rows for predictor encoding")
    if predictor == 2:
        if bpc != 8:
            raise ValueError("TIFF predictor encode needs BitsPerComponent 8")
        a = np.frombuffer(data, dtype=np.uint8).reshape(-1, columns, colors)
        return np.diff(a, axis=1, prepend=np.zeros_like(a[:, :1])).astype(
            np.uint8
        ).tobytes()
    if not 10 <= predictor <= 15:
        raise ValueError("unsupported /Predictor %d" % predictor)
    bpp = _bpp(colors, bpc)
    rows = np.frombuffer(data, dtype=np.uint8).reshape(-1, rb).astype(np.int16)
    prev = np.zeros(rb, dtype=np.int16)
    out = bytearray()

    def filtered(f: int, row: np.ndarray) -> np.ndarray:
        if f == 0:
            return (row & 0xFF).astype(np.uint8)
        if f == 1:
            left = np.zeros_like(row)
            left[bpp:] = row[:-bpp]
            return ((row - left) & 0xFF).astype(np.uint8)
        if f == 2:
            return ((row - prev) & 0xFF).astype(np.uint8)
        if f == 3:
            left = np.zeros_like(row)
            left[bpp:] = row[:-bpp]
            return ((row - ((left + prev) >> 1)) & 0xFF).astype(np.uint8)
        enc = np.empty(rb, dtype=np.uint8)
        for i in range(rb):
            left = int(row[i - bpp]) if i >= bpp else 0
            upleft = int(prev[i - bpp]) if i >= bpp else 0
            enc[i] = (int(row[i]) - _paeth(left, int(prev[i]), upleft)) & 0xFF
        return enc

    for row in rows:
        if predictor == 15:
            cands = [(f, filtered(f, row)) for f in range(5)]
            f, enc = min(
                cands,
                key=lambda fe: int(
                    np.abs(fe[1].astype(np.int8).astype(np.int16)).sum()
                ),
            )
        else:
            f = predictor - 10
            enc = filtered(f, row)
        out.append(f)
        out += enc.tobytes()
        prev = row
    return bytes(out)


# ---------------------------------------------------------------------------
# LZW (ISO 32000-1 §7.4.4.2 — the TIFF variant with EarlyChange)
# ---------------------------------------------------------------------------

_CLEAR, _EOD = 256, 257


def lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """Decode a PDF LZWDecode stream. MSB-first variable-width codes
    (9..12 bits); 256 clears the table, 257 ends the data; with
    ``EarlyChange`` (the default) the width bump happens one table
    entry early. Corrupt code sequences raise ValueError."""
    out = bytearray()
    table: list[bytes] = []

    def reset() -> None:
        table.clear()
        table.extend(bytes([i]) for i in range(256))
        table.extend((b"", b""))  # placeholders for clear/EOD slots

    reset()
    width = 9
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == _EOD:
                return bytes(out)
            if code == _CLEAR:
                reset()
                width, prev = 9, None
                continue
            if prev is None:
                if code >= 256:
                    raise ValueError("LZW stream starts with a table code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
            else:
                raise ValueError("LZW code %d beyond table size %d" % (code, len(table)))
            out += entry
            if prev is not None:
                table.append(prev + entry[:1])
            prev = entry
            if len(table) + early_change >= (1 << width) and width < 12:
                width += 1
    # Spec requires an EOD; tolerate its absence at exact end-of-data
    # like real readers do.
    return bytes(out)


def lzw_encode(data: bytes, early_change: int = 1) -> bytes:
    """Encode bytes as a PDF LZWDecode stream (fixture writer + the
    round-trip half of the codec tests)."""
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(_CLEAR, width)
    w = b""
    for byte in data:
        c = bytes([byte])
        if w + c in table:
            w += c
            continue
        emit(table[w], width)
        table[w + c] = next_code
        next_code += 1
        if next_code + early_change - 1 >= (1 << width):
            if width < 12:
                width += 1
            else:
                emit(_CLEAR, width)
                table = {bytes([i]): i for i in range(256)}
                next_code, width = 258, 9
        w = c
    if w:
        emit(table[w], width)
    emit(_EOD, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# ASCII filters (ISO 32000-1 §7.4.2 / §7.4.3) — the wrapping half of
# real-world filter CHAINS (/Filter [/ASCII85Decode /FlateDecode]).
# ---------------------------------------------------------------------------


def asciihex_decode(data: bytes) -> bytes:
    """ASCIIHexDecode: hex pairs, whitespace ignored, ``>`` is EOD, an
    odd trailing digit behaves as if followed by 0."""
    end = data.find(b">")
    body = data[:end] if end != -1 else data
    hx = re.sub(rb"\s", b"", body)
    if not re.fullmatch(rb"[0-9A-Fa-f]*", hx):
        raise ValueError("invalid character in ASCIIHex stream")
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode())


def asciihex_encode(data: bytes) -> bytes:
    return data.hex().encode() + b">"


def ascii85_decode(data: bytes) -> bytes:
    """ASCII85Decode (the PDF/Adobe base-85 variant): 5 chars
    ``!``..``u`` -> 4 bytes big-endian, ``z`` alone is four zero
    bytes, whitespace ignored, ``~>`` is EOD, a final partial group of
    n chars yields n-1 bytes (pad with ``u``)."""
    end = data.find(b"~>")
    body = re.sub(rb"\s", b"", data[:end] if end != -1 else data)
    out = bytearray()
    group: list[int] = []
    for ch in body:
        if ch == 0x7A:  # 'z'
            if group:
                raise ValueError("'z' inside an ASCII85 group")
            out += b"\x00\x00\x00\x00"
            continue
        if not 0x21 <= ch <= 0x75:
            raise ValueError("invalid character %r in ASCII85 stream" % chr(ch))
        group.append(ch - 0x21)
        if len(group) == 5:
            v = 0
            for g in group:
                v = v * 85 + g
            if v > 0xFFFFFFFF:
                raise ValueError("ASCII85 group overflows 32 bits")
            out += v.to_bytes(4, "big")
            group.clear()
    if group:
        if len(group) == 1:
            raise ValueError("single trailing ASCII85 character")
        n = len(group)
        padded = group + [84] * (5 - n)  # pad with 'u'
        v = 0
        for g in padded:
            v = v * 85 + g
        out += v.to_bytes(4, "big")[: n - 1]
    return bytes(out)


def ascii85_encode(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 4):
        chunk = data[i : i + 4]
        n = len(chunk)
        v = int.from_bytes(chunk + b"\x00" * (4 - n), "big")
        if v == 0 and n == 4:
            out.append(0x7A)  # 'z'
            continue
        digits = []
        for _ in range(5):
            digits.append(v % 85)
            v //= 85
        enc = bytes(0x21 + d for d in reversed(digits))
        out += enc[: n + 1]
    return bytes(out) + b"~>"


# ---------------------------------------------------------------------------
# RunLengthDecode (ISO 32000-1 §7.4.5) — the simple byte-RLE many
# fax/scan exporters and PostScript converters emit for bitonal or
# flat-tint rasters.
# ---------------------------------------------------------------------------


def runlength_decode(data: bytes) -> bytes:
    """Decode a RunLengthDecode stream: a length byte L in 0..127
    copies the next L+1 bytes literally; L in 129..255 repeats the
    next byte 257-L times; 128 is EOD. A stream that ends inside a
    run (or without EOD) raises ValueError."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        length = data[i]
        i += 1
        if length == 128:
            return bytes(out)
        if length < 128:
            end = i + length + 1
            if end > n:
                raise ValueError("RunLength literal run past end of stream")
            out += data[i:end]
            i = end
        else:
            if i >= n:
                raise ValueError("RunLength repeat run missing its byte")
            out += data[i : i + 1] * (257 - length)
            i += 1
    raise ValueError("RunLength stream missing EOD (128)")


def runlength_encode(data: bytes) -> bytes:
    """Encode bytes as a RunLengthDecode stream (fixture writer + the
    round-trip half of the tests): maximal repeat runs for >=3 equal
    bytes, literal runs otherwise, both capped at 128."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 3:
            out.append(257 - (j - i))
            out.append(data[i])
            i = j
            continue
        # literal run: until the next >=3 repeat (or 128-byte cap)
        j = i
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    out.append(128)
    return bytes(out)
