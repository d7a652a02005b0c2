"""From-scratch WAV (RIFF/PCM) codec — stdlib+numpy only.

Retires the audio-decode stub (the container has no libsndfile/ffmpeg,
but RIFF-PCM needs neither): a writer for deterministic fixture
synthesis and an independent chunk-walking parser for the decode path.
The reference has no audio at all — this is the training-pipeline
multimodal-columns ask, built the same way as the JPEG/PNG codecs.

Writer and parser share only the public format constants; the parser is
a real chunk walker (skips unknown chunks such as LIST/INFO, tolerates
trailing padding) rather than an offset mirror of the writer, so a
round-trip actually exercises parsing.

Supported: RIFF/WAVE, ``fmt `` PCM (format code 1), 8-bit unsigned and
16-bit signed little-endian, any channel count. Anything else (IEEE
float, extensible, truncated chunks, bad magic) raises ``ValueError``
so callers can contain it error-as-row.
"""

from __future__ import annotations

import struct

import numpy as np

#: RIFF format code for integer PCM.
WAVE_FORMAT_PCM = 1


def encode_wav(
    samples: np.ndarray,
    sample_rate: int,
    bits: int = 16,
    info: bytes | None = None,
) -> bytes:
    """Serialize centered integer samples to a WAV payload.

    ``samples``: shape (n,) mono or (n, channels); values must fit the
    target width (8-bit: [-128, 127] stored unsigned +128; 16-bit:
    [-32768, 32767] signed LE). ``info`` plants an extra ``LIST``/INFO
    chunk *before* ``data`` — fixture corpora use it to prove the
    parser walks chunks instead of assuming a fixed layout.
    """
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_frames, n_channels = arr.shape
    if bits == 8:
        if arr.min() < -128 or arr.max() > 127:
            raise ValueError("8-bit samples out of range")
        data = (arr.astype(np.int16) + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        if arr.min() < -32768 or arr.max() > 32767:
            raise ValueError("16-bit samples out of range")
        data = arr.astype("<i2").tobytes()
    else:
        raise ValueError(f"unsupported bit depth: {bits}")

    block_align = n_channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH",
        WAVE_FORMAT_PCM,
        n_channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits,
    )
    chunks = [(b"fmt ", fmt)]
    if info is not None:
        chunks.append((b"LIST", b"INFO" + info))
    chunks.append((b"data", data))

    body = bytearray(b"WAVE")
    for cid, payload in chunks:
        body += cid + struct.pack("<I", len(payload)) + payload
        if len(payload) % 2:  # RIFF chunks are word-aligned
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + bytes(body)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse a WAV payload -> (samples int32 centered, sample_rate).

    Mono payloads return shape (n,); multi-channel (n, channels).
    8-bit samples are re-centered (byte - 128) so both widths share the
    signed-integer feature contract. Malformed/unsupported payloads
    raise ``ValueError`` (callers emit error rows, mirroring the
    reference's error-as-data pages, /root/reference/app.py:323-337).
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    end = min(len(payload), 8 + riff_size)

    fmt = None
    data = None
    pos = 12
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body_start = pos + 8
        if body_start + size > end:
            raise ValueError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", payload, body_start)
        elif cid == b"data":
            data = payload[body_start : body_start + size]
        # unknown chunks (LIST, fact, cue, ...) are skipped
        pos = body_start + size + (size % 2)

    if fmt is None:
        raise ValueError("missing fmt chunk")
    if data is None:
        raise ValueError("missing data chunk")
    format_code, n_channels, sample_rate, _byte_rate, _block_align, bits = fmt
    if format_code != WAVE_FORMAT_PCM:
        raise ValueError(f"unsupported format code: {format_code}")
    if n_channels < 1:
        raise ValueError("invalid channel count")

    if bits == 8:
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
    elif bits == 16:
        usable = len(data) - len(data) % 2
        arr = np.frombuffer(data[:usable], dtype="<i2").astype(np.int32)
    else:
        raise ValueError(f"unsupported bit depth: {bits}")

    usable_frames = len(arr) // n_channels
    arr = arr[: usable_frames * n_channels]
    if n_channels > 1:
        arr = arr.reshape(usable_frames, n_channels)
    return arr, int(sample_rate)
