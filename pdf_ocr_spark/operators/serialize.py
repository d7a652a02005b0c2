"""Multi-format document serialization operator (sinks S5/S6/S7).

Adds per-document output columns (txt/md/html) computed from the span
array. Pure projection — serialization rides in the same stage as
normalization, no extra shuffle. The docx container (S8) is out of the
span-equality contract (binary zip with timestamps); its *content*
equals the txt page sequence, which is what we emit.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_ocr_spark.functions.serialize import html_doc_col, markdown_doc_col, txt_doc_col

FORMATS = ("txt", "md", "html")


def _text_pages(spans_col):
    """Project a document's text-bearing spans to (offset, text) structs.

    After the OCR kernel every span carries text; ``kind='image'`` spans
    that were never decoded serialize as their (empty) text, matching the
    reference's behavior for pages whose OCR produced ''.
    """
    return F.transform(
        spans_col,
        lambda s: F.struct(s["offset"].alias("offset"), s["text"].alias("text")),
    )


def serialize_documents(
    documents: DataFrame,
    formats: Iterable[str] = FORMATS,
    title_col: str | None = None,
) -> DataFrame:
    """Add one output column per requested format.

    ``title_col`` feeds the HTML <title>/<h1>; defaults to the doc_id
    (the reference uses the uploaded base filename,
    /root/reference/app.py:556-558).
    """
    pages = _text_pages(F.col("spans"))
    title = F.col(title_col) if title_col else F.col("doc_id")
    out = documents
    for fmt in formats:
        if fmt == "txt":
            out = out.withColumn("txt", txt_doc_col(pages))
        elif fmt == "md":
            out = out.withColumn("md", markdown_doc_col(pages))
        elif fmt == "html":
            out = out.withColumn("html", html_doc_col(pages, title))
        elif fmt == "docx":
            from pdf_ocr_spark.operators.docx import docx_udf

            out = out.withColumn("docx", docx_udf()(pages))
        elif fmt == "json":
            from pdf_ocr_spark.operators.hocr import json_doc_col

            out = out.withColumn("json", json_doc_col(F.col("doc_id"), F.col("spans")))
        else:
            raise ValueError(f"Unsupported output format: {fmt}")
    return out
