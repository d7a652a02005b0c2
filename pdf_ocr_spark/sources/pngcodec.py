"""Minimal pure-Python PNG codec (stdlib zlib/struct + numpy).

The sandbox has no PIL/poppler, so page images are real PNG bytes
produced and parsed here. Supports 8-bit grayscale (color type 0) and
8-bit RGB (color type 2), all five scanline filters on decode, filter 0
on encode. This stands in for the reference's Poppler rasterizer output
(`page_{i}.png`, /root/reference/app.py:461-473) — the Spark-side
plumbing (binary columns, Arrow batches, kernel signatures) is identical
to what a real rasterizer would feed.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """Encode a HxW uint8 (grayscale) or HxWx3 uint8 (RGB) array."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color_type, h, w = 0, *img.shape
        raw = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type = 2
        h, w = img.shape[:2]
        raw = img
    else:
        raise ValueError(f"unsupported array shape {img.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 per scanline
    scanlines = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), raw.reshape(h, -1)], axis=1
    ).tobytes()
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scanlines, 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter(data: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.uint16)
    for y in range(h):
        ftype = data[pos]
        line = data[pos + 1 : pos + 1 + stride].astype(np.uint16)
        pos += 1 + stride
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode to HxW (grayscale) or HxWx3 (RGB) uint8. Raises ValueError
    on malformed input (the kernel converts that into an error-as-row)."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos, w = 8, None
    idat = bytearray()
    h = color_type = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or color_type not in (0, 2) or interlace != 0:
                raise ValueError(f"unsupported PNG (depth={depth} color={color_type})")
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("no IHDR chunk")
    bpp = 1 if color_type == 0 else 3
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    expected = h * (w * bpp + 1)
    if raw.size != expected:
        raise ValueError(f"truncated PNG data ({raw.size} != {expected})")
    flat = _unfilter(raw, h, w, bpp)
    return flat.reshape(h, w) if color_type == 0 else flat.reshape(h, w, 3)
