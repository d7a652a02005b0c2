"""The OCR decode operator — Arrow-batched ``mapInPandas`` kernel.

Distributed equivalent of the reference's per-page worker
``process_image`` (/root/reference/app.py:226-345), with the same
observable semantics:

* engine dispatch on a config value; unsupported engine -> error row
* preprocess flag -> enhancement chain before decode
* empty primary decode -> alternative-settings retry
* every failure is **data, not an exception**: the page row survives
  with a bracketed error message, exactly like the reference's
  ``return i, "[Error ...]"`` paths. The kernel never throws.

From Spark's perspective there is no per-row Python — batches arrive as
Arrow RecordBatches and the kernel loops inside the batch, importing
heavy deps lazily once per python worker (the reference's lazy-import
pattern, /root/reference/app.py:270,298).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from pdf_ocr_spark.config import ExtractionConfig

OCR_OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("offset", IntegerType(), False),
        StructField("media_ref", StringType(), True),
        StructField("text", StringType(), True),
        StructField("confidence", DoubleType(), True),
        StructField("error", BooleanType(), False),
    ]
)

SUPPORTED_ENGINES = ("glyph", "tesseract", "easyocr", "pyocr")


def _decode_one(payload, media_ref: str, offset: int, config: ExtractionConfig):
    """Decode one page. Returns (text, confidence, is_error)."""
    # Lazy imports: once per python worker, not per task from Spark's view
    from pdf_ocr_spark.operators.imaging import (
        derotate_image,
        enhance_image,
        ocr_decode,
    )
    from pdf_ocr_spark.sources.pngcodec import decode_png

    if config.ocr_engine not in SUPPORTED_ENGINES:
        return f"[Error: Unsupported OCR engine: {config.ocr_engine}]", 0.0, True
    if payload is None:
        # reference: FileNotFoundError -> error-as-row (app.py:332-334)
        return (
            f"[Error: File not found: {media_ref}. Ensure the file exists and is accessible.]",
            0.0,
            True,
        )
    try:
        img = decode_png(bytes(payload))
        if config.preprocess:
            img = enhance_image(img)
        if config.derotate:
            img = derotate_image(img)
        if config.ocr_engine == "glyph":
            text, conf = ocr_decode(img)
        elif config.ocr_engine == "tesseract":
            from pdf_ocr_spark.operators.engines import tesseract_decode

            try:
                import pytesseract  # not present in this container

                backend = pytesseract.image_to_string
            except Exception as e:  # matches app.py:264-266 error shape
                return f"[Error with Tesseract OCR: {e}]", 0.0, True
            # full reference contract: config string (--oem 1 --psm 3,
            # --dpi 300 for pure English) + empty-result psm-6 retry
            text, is_err = tesseract_decode(img, config.language, backend)
            if is_err:
                return text, 0.0, True
            conf = 1.0
        elif config.ocr_engine == "easyocr":
            from pdf_ocr_spark.operators.engines import easyocr_decode

            text, is_err = easyocr_decode(img, config.language)
            if is_err:  # incl. "[Error with EasyOCR: <import error>]"
                return text, 0.0, True
            conf = 1.0
        else:  # pyocr
            from pdf_ocr_spark.operators.engines import pyocr_decode

            text, is_err = pyocr_decode(img, config.language)
            if is_err:
                return text, 0.0, True
            conf = 1.0
        return text, conf, False
    except Exception as e:
        # general per-page failure path (app.py:335-337); offset+1 mirrors
        # the reference's 1-based page numbering in messages
        return f"[Error processing page {offset + 1}: {e}]", 0.0, True


def ocr_pages(pages: DataFrame, config: ExtractionConfig | None = None) -> DataFrame:
    """Decode image-span pages: (doc_id, offset, media_ref, payload) ->
    (doc_id, offset, media_ref, text, confidence, error).

    Raw decode only — text normalization (M2+M5) is applied afterwards
    as column expressions, and only to non-error rows (the reference's
    error strings bypass sanitize/fix via early return).
    """
    cfg = config or ExtractionConfig()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, confs, errs = [], [], []
            # Optional upstream parse errors (e.g. the PDF source's typed
            # "/DCTDecode unsupported" rows) take precedence over the
            # generic missing-payload message, so the user-facing error
            # row names the actual cause.
            parse_errs = (
                pdf["parse_error"] if "parse_error" in pdf.columns else [None] * len(pdf)
            )
            for payload, ref, off, pe in zip(
                pdf["payload"], pdf["media_ref"], pdf["offset"], parse_errs
            ):
                if payload is None and pe is not None and not pd.isna(pe):
                    t, c, e = f"[Error: {pe}]", 0.0, True
                else:
                    t, c, e = _decode_one(payload, ref, int(off), cfg)
                texts.append(t)
                confs.append(c)
                errs.append(e)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "offset": pdf["offset"],
                    "media_ref": pdf["media_ref"],
                    "text": texts,
                    "confidence": confs,
                    "error": errs,
                }
            )

    return pages.mapInPandas(kernel, schema=OCR_OUTPUT_SCHEMA)
