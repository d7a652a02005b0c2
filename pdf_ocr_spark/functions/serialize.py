"""Document serializers as pure Spark column expressions.

Each takes an (unsorted) ``array<struct<offset:int, text:string>>``
column of a document's normalized text pages and returns the serialized
output string, byte-equal to :mod:`pdf_ocr_spark.oracle.serializers`
(and therefore to the reference's on-disk txt/md/html files).

Everything is ``array_sort`` + ``transform`` + ``array_join`` — no UDF,
no shuffle: serialization happens inside the same projection as
normalization.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pdf_ocr_spark.functions.text import html_escape_col, strip_col
from pdf_ocr_spark.oracle.serializers import HTML_STYLE, TXT_PAGE_SEPARATOR


def _sorted_texts(pages: Column) -> Column:
    """Sort page structs by offset (struct sort compares leading field
    first — the canonical Spark 'ordered collect', SURVEY §2.3 A2) and
    project the text."""
    return F.transform(F.array_sort(pages), lambda p: p["text"])


def txt_doc_col(pages: Column) -> Column:
    """S5: pages in offset order, joined with the page-break separator
    (between pages, never trailing). Spec: /root/reference/app.py:546-552.
    """
    return F.array_join(_sorted_texts(pages), TXT_PAGE_SEPARATOR)


def _md_page_body(text: Column) -> Column:
    # Each paragraph (blank-line separated) stripped + trailing blank
    # line. split() keeps leading/trailing empties (limit=-1), matching
    # str.split.
    paras = F.split(text, r"\n\n")
    return F.array_join(F.transform(paras, lambda p: F.concat(strip_col(p), F.lit("\n\n"))), "")


def markdown_doc_col(pages: Column) -> Column:
    """S6: markdown serialization; ``---`` + blank line between pages.
    Spec: /root/reference/app.py:372-383."""
    return F.array_join(F.transform(_sorted_texts(pages), _md_page_body), "---\n\n")


def _html_page_body(text: Column) -> Column:
    paras = F.split(text, r"\n\n")
    return F.array_join(
        F.transform(
            paras,
            lambda p: F.concat(F.lit("<p>"), strip_col(html_escape_col(p)), F.lit("</p>\n")),
        ),
        "",
    )


def html_doc_col(pages: Column, title: Column) -> Column:
    """S7: full HTML document. Title is interpolated unescaped, exactly
    as the reference does. Spec: /root/reference/app.py:385-411."""
    header = F.concat(
        F.lit("<!DOCTYPE html>\n<html lang=\"en\">\n<head>\n    <meta charset=\"UTF-8\">\n    <title>"),
        title,
        F.lit("</title>\n" + HTML_STYLE + "</head>\n<body>\n<h1>"),
        title,
        F.lit("</h1>\n"),
    )
    body = F.array_join(F.transform(_sorted_texts(pages), _html_page_body), '<hr class="page-break">\n')
    return F.concat(header, body, F.lit("</body>\n</html>\n"))
