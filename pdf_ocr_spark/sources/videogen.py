"""Deterministic synthetic MJPEG/AVI corpus with SQL-exact frame oracle.

Every frame is grayscale with two flat half-planes whose values derive
from integer arithmetic over ``doc_id`` and the frame index. Flat
8x8-aligned blocks survive baseline JPEG at quality 100 bit-exactly
(DC quantizer 1, all AC zero — pinned by tests/test_video.py), so the
decoded pixel statistics are reconstructible in pure DuckDB SQL: the
``video_frame_sample`` oracle never touches container or JPEG bytes,
and a match certifies AVI writer + chunk walker + JPEG round-trip +
frame-feature kernel together (the audiogen playbook applied to video).

Derivation contract (mirrored by the oracle SQL in entrypoints.py):

* corrupt   = ``doc_id % 47 == 5`` (junk payload -> one error row,
  ``frame_no = -1``)
* n_frames  = ``5 + doc_id % 6``          (5..10)
* width     = ``48 + (doc_id % 5) * 16``  (half-width stays 8-aligned)
* height    = ``32 + (doc_id % 4) * 8``
* frame f:  left half value  ``(doc_id * 7 + f * 31) % 256``,
            right half value ``(doc_id * 11 + f * 13) % 256``
* sampled frames (``every_n = 2``): f in {0, 2, 4, ...} < n_frames
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_ocr_spark.sources.avicodec import encode_avi
from pdf_ocr_spark.sources.jpegcodec import encode_jpeg

#: doc_id % 47 == CORRUPT_RESIDUE -> junk payload (error-as-row path).
CORRUPT_RESIDUE = 5
CORRUPT_PAYLOAD = b"RIFFnot-an-avi-container!!"

#: JPEG quality for fixture frames — 100 keeps flat blocks bit-exact.
FRAME_QUALITY = 100


def video_params(doc_id: int) -> dict:
    d = int(doc_id)
    return {
        "corrupt": d % 47 == CORRUPT_RESIDUE,
        "n_frames": 5 + d % 6,
        "width": 48 + (d % 5) * 16,
        "height": 32 + (d % 4) * 8,
    }


def frame_values(doc_id: int, frame_no: int) -> tuple[int, int]:
    d, f = int(doc_id), int(frame_no)
    return (d * 7 + f * 31) % 256, (d * 11 + f * 13) % 256


def frame_array(doc_id: int, frame_no: int) -> np.ndarray:
    p = video_params(doc_id)
    left, right = frame_values(doc_id, frame_no)
    img = np.empty((p["height"], p["width"]), dtype=np.uint8)
    img[:, : p["width"] // 2] = left
    img[:, p["width"] // 2 :] = right
    return img


def avi_payload_for(doc_id: int) -> bytes:
    p = video_params(doc_id)
    if p["corrupt"]:
        return CORRUPT_PAYLOAD
    frames = [
        encode_jpeg(frame_array(doc_id, f), quality=FRAME_QUALITY)
        for f in range(p["n_frames"])
    ]
    return encode_avi(frames, p["width"], p["height"])


def media_ref_for(doc_id: int) -> str:
    return f"avi://{int(doc_id)}"


def avi_corpus(documents: DataFrame) -> DataFrame:
    """(media_ref, payload) rows, one MJPEG AVI per ``documents`` row —
    synthesized on executors from ``doc_id`` alone. JPEG encoding is an
    expensive narrow projection, so the few-splits parallelism guard
    applies (measured: the sf0.1 bench query ran on ~2 of 32 cores
    without it; no-op at scale where inputs carry thousands of
    splits)."""
    from pdf_ocr_spark.operators.dedup import _ensure_parallelism

    documents = _ensure_parallelism(documents.select("doc_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, payloads = [], []
            for d in pdf["doc_id"]:
                refs.append(media_ref_for(int(d)))
                payloads.append(avi_payload_for(int(d)))
            yield pd.DataFrame({"media_ref": refs, "payload": payloads})

    return documents.select(F.col("doc_id")).mapInPandas(
        gen, schema="media_ref string, payload binary"
    )
