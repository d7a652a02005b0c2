"""DOCX sink (S8): container validity + the reference's contiguous-
index paragraph/page-break sequence."""

from __future__ import annotations

import io
import re
import zipfile

from pyspark.sql import Row

from pdf_ocr_spark import DOCUMENTS_SCHEMA
from pdf_ocr_spark.operators.docx import docx_bytes, document_xml
from pdf_ocr_spark.operators.serialize import serialize_documents


def _paras(xml: str) -> list[str]:
    """Extract the (text|PAGEBREAK) sequence from document.xml."""
    out = []
    for m in re.finditer(r"<w:p>(.*?)</w:p>", xml):
        body = m.group(1)
        if 'w:br w:type="page"' in body:
            out.append("PAGEBREAK")
        else:
            t = re.search(r"<w:t[^>]*>(.*?)</w:t>", body)
            out.append(t.group(1) if t else "")
    return out


def test_docx_sequence_contiguous():
    pages = {0: "first", 1: "second", 2: "third"}
    xml = document_xml(pages, 3)
    assert _paras(xml) == ["first", "PAGEBREAK", "second", "PAGEBREAK", "third"]


def test_docx_missing_index_skipped_but_breaks_kept():
    # reference quirk: iterates range(n); missing page i emits neither
    # paragraph nor its break (both inside `if i in results`... the
    # break belongs to the present page) — here page 1 failed/absent
    pages = {0: "first", 2: "third"}
    xml = document_xml(pages, 3)
    assert _paras(xml) == ["first", "PAGEBREAK", "third"]


def test_docx_escaping_and_zip_valid():
    data = docx_bytes({0: "a < b & c"})
    z = zipfile.ZipFile(io.BytesIO(data))
    assert set(z.namelist()) == {"[Content_Types].xml", "_rels/.rels", "word/document.xml"}
    xml = z.read("word/document.xml").decode()
    assert "a &lt; b &amp; c" in xml


def test_docx_deterministic():
    assert docx_bytes({0: "x", 1: "y"}) == docx_bytes({0: "x", 1: "y"})


def test_docx_column(spark):
    rows = [
        Row(
            doc_id="d1",
            spans=[
                Row(kind="text", text="hello", media_ref="", offset=0),
                Row(kind="text", text="world", media_ref="", offset=1),
            ],
        )
    ]
    df = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    out = serialize_documents(df, formats=("docx",)).collect()[0]
    xml = zipfile.ZipFile(io.BytesIO(bytes(out["docx"]))).read("word/document.xml").decode()
    assert _paras(xml) == ["hello", "PAGEBREAK", "world"]
