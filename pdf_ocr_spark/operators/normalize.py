"""Text-span normalization — the M2+M5 per-page kernel as column ops.

The reference runs ``sanitize_text`` then ``fix_common_ocr_errors`` on
every OCR'd page (/root/reference/app.py:326-329). Here the same chain
is a Catalyst projection; the array-native form touches no shuffle and
no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_ocr_spark.functions.text import normalize_text_col


def normalize_documents(documents: DataFrame) -> DataFrame:
    """Array-native: normalize the text of every 'text' span in place,
    preserving kind/media_ref/offset. Image spans pass through untouched
    (their text is produced later by the OCR kernel). Zero shuffle."""
    normalized = F.transform(
        F.col("spans"),
        lambda s: F.struct(
            s["kind"].alias("kind"),
            F.when(s["kind"] == "text", normalize_text_col(s["text"]))
            .otherwise(s["text"])
            .alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )
    return documents.withColumn("spans", normalized)


def normalize_pages(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """Exploded form: normalize the text column of per-span rows where
    kind == 'text'."""
    return pages.withColumn(
        text_col,
        F.when(F.col("kind") == "text", normalize_text_col(F.col(text_col))).otherwise(
            F.col(text_col)
        ),
    )
