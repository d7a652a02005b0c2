"""From-scratch AVI (RIFF) container codec for MJPEG video — stdlib only.

Retires the video-decode stub: an AVI writer for deterministic fixture
synthesis and an independent RIFF chunk walker for the decode path,
with frame pixels going through the from-scratch baseline JPEG codec
(:mod:`pdf_ocr_spark.sources.jpegcodec`). The reference has no video —
this is the training-pipeline multimodal-columns ask, built the same
way as the WAV/JPEG/PNG codecs.

Supported: ``RIFF('AVI ')`` with a ``hdrl`` header list (``avih`` +
``strl``/``strh``/``strf``), a ``movi`` list of ``00dc``/``00db``
frame chunks, and an optional ``idx1`` index (written, ignored on
read — frames are recovered by walking ``movi``, which also handles
index-less files). Non-AVI payloads, missing lists, non-MJPG streams,
and truncated chunks raise ``ValueError`` for error-as-row callers.
"""

from __future__ import annotations

import struct

#: Frames per second written into avih/strh (fixtures are not timed;
#: the value only exercises the header round-trip).
DEFAULT_FPS = 10


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi(
    frames: list[bytes], width: int, height: int, fps: int = DEFAULT_FPS
) -> bytes:
    """Serialize pre-encoded JPEG frames into an MJPEG AVI container."""
    if not frames:
        raise ValueError("no frames")
    us_per_frame = 1_000_000 // fps
    max_bytes = max(len(f) for f in frames)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        us_per_frame,
        max_bytes * fps,
        0,  # padding granularity
        0x10,  # AVIF_HASINDEX
        len(frames),
        0,  # initial frames
        1,  # streams
        max_bytes,
        width,
        height,
        0, 0, 0, 0,  # reserved
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids",
        b"MJPG",
        0, 0, 0,  # flags, priority, language
        0,  # initial frames
        1,  # scale
        fps,  # rate (rate/scale = fps)
        0,  # start
        len(frames),
        max_bytes,
        0xFFFFFFFF,  # quality (default)
        0,  # sample size (varies per frame)
        0, 0, width, height,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # planes
        24,  # bit count
        b"MJPG",
        width * height * 3,
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_body = bytearray(b"movi")
    offsets = []  # offset of each 00dc chunk relative to 'movi' fourcc
    for f in frames:
        offsets.append(len(movi_body))
        movi_body += _chunk(b"00dc", f)
    movi = _chunk(b"LIST", bytes(movi_body))

    idx = bytearray()
    for off, f in zip(offsets, frames):
        idx += struct.pack("<4sIII", b"00dc", 0x10, off, len(f))  # AVIIF_KEYFRAME
    idx1 = _chunk(b"idx1", bytes(idx))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(payload: bytes, start: int, end: int):
    """Yield (fourcc, body_start, size) for each chunk in [start, end)."""
    pos = start
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body_start = pos + 8
        if body_start + size > end:
            raise ValueError(f"truncated chunk {cid!r}")
        yield cid, body_start, size
        pos = body_start + size + (size % 2)


def decode_avi(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Parse an MJPEG AVI payload -> (width, height, jpeg frames).

    Frames come from walking the ``movi`` list (``00dc``/``00db``
    chunks in stream order), not from ``idx1`` — index-less and
    index-bearing files decode identically. Malformed payloads raise
    ``ValueError``.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    end = min(len(payload), 8 + riff_size)

    width = height = None
    handler = None
    frames: list[bytes] = []
    for cid, body_start, size in _walk(payload, 12, end):
        if cid != b"LIST":
            continue  # idx1 and unknown top-level chunks are skipped
        kind = payload[body_start : body_start + 4]
        inner_start, inner_end = body_start + 4, body_start + size
        if kind == b"hdrl":
            for c2, b2, s2 in _walk(payload, inner_start, inner_end):
                if c2 == b"avih" and s2 >= 40:
                    vals = struct.unpack_from("<IIIIIIIIII", payload, b2)
                    width, height = vals[8], vals[9]
                elif c2 == b"LIST" and payload[b2 : b2 + 4] == b"strl":
                    for c3, b3, s3 in _walk(payload, b2 + 4, b2 + s2):
                        if c3 == b"strh" and s3 >= 8:
                            fcc_type = payload[b3 : b3 + 4]
                            if fcc_type == b"vids":
                                handler = payload[b3 + 4 : b3 + 8]
        elif kind == b"movi":
            for c2, b2, s2 in _walk(payload, inner_start, inner_end):
                if c2[2:4] in (b"dc", b"db"):
                    frames.append(payload[b2 : b2 + s2])

    if width is None:
        raise ValueError("missing avih header")
    if handler is not None and handler not in (b"MJPG", b"mjpg", b"\x00\x00\x00\x00"):
        raise ValueError(f"unsupported video handler: {handler!r}")
    if not frames:
        raise ValueError("no frame chunks in movi list")
    return int(width), int(height), frames
