"""Deterministic synthetic audio corpus: modular-sawtooth WAV payloads.

Every waveform parameter is plain arithmetic over the ``documents``
row's integer ``doc_id`` — no RNG — so the expected features of each
payload (peak, RMS, mean, zero crossings, duration) are reconstructible
in pure DuckDB SQL by regenerating the very same sample sequence with
``generate_series`` and aggregating it. That makes the ``audio_features``
oracle exact AND independent: the SQL side never touches WAV bytes, so
a match certifies the writer, the chunk-walking parser, and the feature
kernel together (the webgen.py playbook applied to audio).

Derivation contract (mirrored by the oracle SQL in entrypoints.py):

* corrupt  = ``doc_id % 50 == 3``  (payload is junk -> error row)
* bits     = 8 if ``doc_id % 3 == 0`` else 16
* rate     = ``8000 + (doc_id % 4) * 2000``
* n        = ``1600 + (doc_id % 5) * 400`` samples, mono
* m (odd)  = ``129 + (doc_id % 7) * 18`` (8-bit) /
  ``2001 + (doc_id % 7) * 500`` (16-bit)
* a, b     = ``7 + doc_id % 11``, ``doc_id % 97``
* sample_i = ``((i*a + b) % m) - (m-1)//2``  (fits both widths)
* an extra LIST/INFO chunk precedes ``data`` when ``doc_id % 4 == 0``
  (proves the parser walks chunks rather than assuming a layout)

Sums of squares stay < 2^53 (max |s| 2500, n <= 3200), so avg/sqrt are
exact doubles on both engines — no cross-engine float noise.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_ocr_spark.sources.wavcodec import encode_wav

#: doc_id % 50 == CORRUPT_RESIDUE -> junk payload (error-as-row path).
CORRUPT_RESIDUE = 3
CORRUPT_PAYLOAD = b"RIFFjunk-not-a-wave-payload"


def audio_params(doc_id: int) -> dict:
    """The per-document waveform parameters (the derivation contract)."""
    d = int(doc_id)
    bits = 8 if d % 3 == 0 else 16
    m = 129 + (d % 7) * 18 if bits == 8 else 2001 + (d % 7) * 500
    return {
        "corrupt": d % 50 == CORRUPT_RESIDUE,
        "bits": bits,
        "rate": 8000 + (d % 4) * 2000,
        "n": 1600 + (d % 5) * 400,
        "m": m,
        "a": 7 + d % 11,
        "b": d % 97,
        "with_info": d % 4 == 0,
    }


def audio_samples(doc_id: int) -> np.ndarray:
    """The exact centered-int sample sequence for a document."""
    p = audio_params(doc_id)
    i = np.arange(p["n"], dtype=np.int64)
    return ((i * p["a"] + p["b"]) % p["m"]) - (p["m"] - 1) // 2


def audio_payload_for(doc_id: int) -> bytes:
    """WAV bytes (or the corrupt fixture) for a document."""
    p = audio_params(doc_id)
    if p["corrupt"]:
        return CORRUPT_PAYLOAD
    info = f"ISFT{doc_id}".encode() if p["with_info"] else None
    return encode_wav(audio_samples(doc_id), p["rate"], bits=p["bits"], info=info)


def media_ref_for(doc_id: int) -> str:
    return f"wav://{int(doc_id)}"


def wav_corpus(documents: DataFrame) -> DataFrame:
    """(media_ref, payload) rows, one WAV per ``documents`` row —
    synthesized on executors from ``doc_id`` alone. Payload synthesis
    is an expensive narrow projection, so the few-splits parallelism
    guard applies (no-op at scale, where inputs carry thousands of
    splits)."""
    from pdf_ocr_spark.operators.dedup import _ensure_parallelism

    documents = _ensure_parallelism(documents.select("doc_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, payloads = [], []
            for d in pdf["doc_id"]:
                refs.append(media_ref_for(int(d)))
                payloads.append(audio_payload_for(int(d)))
            yield pd.DataFrame({"media_ref": refs, "payload": payloads})

    return documents.select(F.col("doc_id")).mapInPandas(
        gen, schema="media_ref string, payload binary"
    )
