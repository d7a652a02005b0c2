"""Multimodal media operators: typed metadata + decode/feature plumbing.

Media payloads are opaque ``binary`` columns with typed metadata
extracted by Arrow-batched kernels. Every default decode path is real
and from-scratch: PNG (pngcodec), WAV/RIFF-PCM audio (wavcodec), and
MJPEG/AVI video (avicodec + jpegcodec). Other codecs (mp3, h264, ...)
have no backend in this container and surface as typed error rows;
alternative decoders are injectable via ``decode_fn`` (contract
documented per operator), so swapping in ffmpeg/torchaudio is a
one-function change inside the kernel.
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("format", StringType(), True),  # 'png' | 'unknown'
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_bytes", IntegerType(), False),
        StructField("valid", StringType(), False),  # 'ok' | error message
    ]
)


def png_dimensions(payload: bytes) -> tuple[int, int]:
    """Width/height straight from the IHDR chunk (no full decode)."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    w, h = struct.unpack(">II", payload[16:24])
    return int(w), int(h)


def media_metadata(media: DataFrame) -> DataFrame:
    """Typed metadata for every media payload; malformed payloads are
    error-as-row (valid != 'ok'), never exceptions."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, ws, hs, ns, oks = [], [], [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                ns.append(len(b))
                try:
                    w, h = png_dimensions(b)
                    fmts.append("png")
                    ws.append(w)
                    hs.append(h)
                    oks.append("ok")
                except Exception as e:
                    fmts.append("unknown")
                    ws.append(None)
                    hs.append(None)
                    oks.append(f"error: {e}")
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "format": fmts,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "n_bytes": ns,
                    "valid": oks,
                }
            )

    return media.mapInPandas(kernel, schema=MEDIA_META_SCHEMA)


IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mean_intensity", DoubleType(), True),
        StructField("ink_ratio", DoubleType(), True),
        StructField("embedding", ArrayType(FloatType()), True),
    ]
)


def image_features(media: DataFrame, grid: int = 4) -> DataFrame:
    """Decode -> downsample to a grid -> cheap visual embedding
    (per-cell mean intensity). Real end-to-end for PNG payloads."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pdf_ocr_spark.operators.imaging import to_grayscale
        from pdf_ocr_spark.sources.pngcodec import decode_png

        for pdf in batches:
            rows = {k: [] for k in ("width", "height", "mean_intensity", "ink_ratio", "embedding")}
            for payload in pdf["payload"]:
                try:
                    img = to_grayscale(decode_png(bytes(payload)))
                    h, w = img.shape
                    cells = []
                    for gy in range(grid):
                        for gx in range(grid):
                            block = img[
                                gy * h // grid : (gy + 1) * h // grid or 1,
                                gx * w // grid : (gx + 1) * w // grid or 1,
                            ]
                            cells.append(float(block.mean()) / 255.0 if block.size else 0.0)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["mean_intensity"].append(float(img.mean()))
                    rows["ink_ratio"].append(float((img < 128).mean()))
                    rows["embedding"].append(np.array(cells, dtype="float32"))
                except Exception:
                    for k in rows:
                        rows[k].append(None)
            out = pd.DataFrame({"media_ref": pdf["media_ref"]})
            for k, v in rows.items():
                out[k] = pd.Series(v, dtype="object" if k == "embedding" else None)
            yield out

    return media.mapInPandas(kernel, schema=IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("valid", StringType(), False),  # 'ok' | error message
        StructField("sample_rate", IntegerType(), True),
        StructField("n_samples", IntegerType(), True),
        StructField("duration_s", DoubleType(), True),
        StructField("peak", IntegerType(), True),
        StructField("rms", DoubleType(), True),
        StructField("sum_amp", LongType(), True),
        StructField("zero_crossings", IntegerType(), True),
    ]
)

VIDEO_FRAMES_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("frame_no", IntegerType(), False),
        StructField("frame_png", BinaryType(), True),
    ]
)


def _decode_avi_mjpeg(payload: bytes, every_n: int):
    """Default video decode: the from-scratch MJPEG/AVI chunk walker +
    baseline JPEG codec. Contract: yield (frame_no, HxW[x3] uint8) for
    every ``every_n``-th frame. Other containers/codecs can be injected
    via ``decode_fn``; unsupported payloads raise (error-as-row)."""
    from pdf_ocr_spark.sources.avicodec import decode_avi
    from pdf_ocr_spark.sources.jpegcodec import decode_jpeg

    _w, _h, frames = decode_avi(payload)
    for frame_no in range(0, len(frames), max(1, every_n)):
        yield frame_no, decode_jpeg(frames[frame_no])


def audio_features(
    media: DataFrame, decode_fn: Callable | None = None
) -> DataFrame:
    """Audio feature extraction over opaque payloads (0 shuffles).

    Default decode is the from-scratch RIFF/PCM parser
    (:func:`pdf_ocr_spark.sources.wavcodec.decode_wav`); other codecs
    can be injected via ``decode_fn`` (contract: payload -> (samples
    int/float array, rate)). Malformed/unsupported payloads become
    error rows (``valid != 'ok'``), never task failures — the
    reference's error-as-data pages, /root/reference/app.py:323-337.

    Features are computed over centered integer sample values in
    float64; sums of squares of 16-bit audio stay exact in double up to
    ~2^21 samples, so the values are engine-portable bit-for-bit.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pdf_ocr_spark.sources.wavcodec import decode_wav

        decode = decode_fn or decode_wav
        for pdf in batches:
            rows = {
                k: []
                for k in (
                    "valid", "sample_rate", "n_samples", "duration_s",
                    "peak", "rms", "sum_amp", "zero_crossings",
                )
            }
            for payload in pdf["payload"]:
                try:
                    samples, rate = decode(bytes(payload) if payload is not None else b"")
                    s = np.asarray(samples, dtype=np.float64)
                    if s.ndim > 1:  # downmix for features; fixtures are mono
                        s = s.mean(axis=1)
                    if not len(s):
                        raise ValueError("empty audio stream")
                    neg = s < 0
                    rows["valid"].append("ok")
                    rows["sample_rate"].append(rate)
                    rows["n_samples"].append(len(s))
                    rows["duration_s"].append(len(s) / rate)
                    rows["peak"].append(int(np.abs(s).max()))
                    rows["rms"].append(float(np.sqrt((s * s).mean())))
                    rows["sum_amp"].append(int(round(s.sum())))
                    rows["zero_crossings"].append(int((neg[1:] != neg[:-1]).sum()))
                except Exception as e:
                    rows["valid"].append(f"error: {e}")
                    for k in rows:
                        if k != "valid":
                            rows[k].append(None)
            out = pd.DataFrame({"media_ref": pdf["media_ref"]})
            for k, v in rows.items():
                dtype = {"sample_rate": "Int32", "n_samples": "Int32", "peak": "Int32",
                         "zero_crossings": "Int32", "sum_amp": "Int64"}.get(k)
                out[k] = pd.array(v, dtype=dtype) if dtype else v
            yield out

    return media.mapInPandas(kernel, schema=AUDIO_FEATURES_SCHEMA)


def video_frame_sample(
    media: DataFrame, every_n: int = 10, decode_fn: Callable | None = None
) -> DataFrame:
    """1 input row -> N frame rows (UDTF-shaped fan-out, 0 shuffles).
    Frames are re-encoded PNG so downstream ops (OCR, features)
    compose. Default decode is the from-scratch MJPEG/AVI path
    (:func:`_decode_avi_mjpeg`); undecodable payloads become one
    ``frame_no = -1`` error row, never task failures."""
    decode = decode_fn or _decode_avi_mjpeg

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdf_ocr_spark.sources.pngcodec import encode_png

        for pdf in batches:
            refs, nos, frames = [], [], []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                try:
                    for frame_no, frame in decode(bytes(payload), every_n):
                        refs.append(ref)
                        nos.append(frame_no)
                        frames.append(encode_png(frame))
                except Exception:
                    refs.append(ref)
                    nos.append(-1)
                    frames.append(None)
            yield pd.DataFrame({"media_ref": refs, "frame_no": nos, "frame_png": frames})

    return media.mapInPandas(kernel, schema=VIDEO_FRAMES_SCHEMA)


MEDIA_SPANS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("offset", IntegerType(), False),
        StructField("kind", StringType(), False),
        StructField("content", StringType(), False),
    ]
)


def extract_media_spans(spans: DataFrame) -> DataFrame:
    """Kind-dispatched extraction over interleaved span rows — the
    input_hint shape with every media kind handled in ONE Arrow stage
    (0 shuffles): ``(doc_id, offset, kind, text, payload)`` ->
    ``(doc_id, offset, kind, content)`` where

    * ``text``  -> the span text as-is,
    * ``image`` -> OCR-decoded page text (PNG payload),
    * ``audio`` -> ``audio {n}@{rate}`` from the WAV stream header+data,
    * ``video`` -> ``video {frames}f {w}x{h}`` from the AVI container,
    * any undecodable payload -> ``error: ...`` (error-as-row, the
      reference's page-failure containment, app.py:323-337).

    This is the engine-side dispatch table the reference implements
    for OCR engines (app.py:243-323), generalized across modalities.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdf_ocr_spark.operators.imaging import ocr_decode, to_grayscale
        from pdf_ocr_spark.sources.avicodec import decode_avi
        from pdf_ocr_spark.sources.pngcodec import decode_png
        from pdf_ocr_spark.sources.wavcodec import decode_wav

        for pdf in batches:
            contents = []
            for kind, text, payload in zip(pdf["kind"], pdf["text"], pdf["payload"]):
                try:
                    if kind == "text":
                        contents.append(text or "")
                    elif kind == "image":
                        decoded, _conf = ocr_decode(
                            to_grayscale(decode_png(bytes(payload)))
                        )
                        contents.append(decoded)
                    elif kind == "audio":
                        samples, rate = decode_wav(bytes(payload))
                        contents.append(f"audio {len(samples)}@{rate}")
                    elif kind == "video":
                        w, h, frames = decode_avi(bytes(payload))
                        contents.append(f"video {len(frames)}f {w}x{h}")
                    else:
                        raise ValueError(f"unknown span kind {kind!r}")
                except Exception as e:
                    contents.append(f"error: {e}")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "offset": pdf["offset"],
                    "kind": pdf["kind"],
                    "content": contents,
                }
            )

    return spans.mapInPandas(kernel, schema=MEDIA_SPANS_SCHEMA)


FRAME_FEATURES_SCHEMA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("frame_no", IntegerType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("left_luma", IntegerType(), True),
        StructField("right_luma", IntegerType(), True),
        StructField("sum_luma", LongType(), True),
    ]
)


def frame_features(frames: DataFrame) -> DataFrame:
    """Per-frame pixel statistics over :func:`video_frame_sample`
    output (PNG frame payloads): dimensions, the mean of each half
    plane (integers on the fixture corpus — flat half-planes), and the
    exact integer pixel sum. Error rows (``frame_no = -1``, null
    payload) pass through with null features."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from pdf_ocr_spark.operators.imaging import to_grayscale
        from pdf_ocr_spark.sources.pngcodec import decode_png

        for pdf in batches:
            rows = {k: [] for k in ("width", "height", "left_luma", "right_luma", "sum_luma")}
            for payload in pdf["frame_png"]:
                try:
                    img = to_grayscale(decode_png(bytes(payload)))
                    h, w = img.shape
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["left_luma"].append(int(img[:, : w // 2].mean()))
                    rows["right_luma"].append(int(img[:, w // 2 :].mean()))
                    rows["sum_luma"].append(int(img.sum(dtype=np.int64)))
                except Exception:
                    for k in rows:
                        rows[k].append(None)
            out = pd.DataFrame(
                {"media_ref": pdf["media_ref"], "frame_no": pdf["frame_no"]}
            )
            for k, v in rows.items():
                out[k] = pd.array(v, dtype="Int64" if k == "sum_luma" else "Int32")
            yield out

    return frames.mapInPandas(kernel, schema=FRAME_FEATURES_SCHEMA)
