"""Minimal DOCX sink (S8) — a valid .docx built with stdlib zipfile.

The reference's docx path (/root/reference/app.py:494-496,539-545)
differs from its txt path in one observable way: it iterates
``for i in range(len(image_paths))`` and emits only ``if i in results``
— a contiguous 0..n-1 index scan (txt uses ``sorted(results.keys())``).
One paragraph per page, a page break after every page except the last
*index* (``i < len(image_paths) - 1``).

Byte-equality of the zip container is out of scope (timestamps,
compressor); the tested contract is the document.xml paragraph/break
sequence, which this serializer reproduces exactly.
"""

from __future__ import annotations

import io
import zipfile
from xml.sax.saxutils import escape

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" '
    'ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>"
)

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" '
    'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
    'Target="word/document.xml"/>'
    "</Relationships>"
)

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"


def document_xml(pages: dict[int, str], n_pages: int) -> str:
    """The reference's S8 body rule: contiguous index scan, paragraph
    per present page, page break after all but the last index."""
    body: list[str] = []
    for i in range(n_pages):
        if i not in pages:
            continue
        body.append(f"<w:p><w:r><w:t xml:space=\"preserve\">{escape(pages[i])}</w:t></w:r></w:p>")
        if i < n_pages - 1:
            body.append('<w:p><w:r><w:br w:type="page"/></w:r></w:p>')
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W}"><w:body>' + "".join(body) + "</w:body></w:document>"
    )


def docx_bytes(pages: dict[int, str], n_pages: int | None = None) -> bytes:
    """Serialize a page map to .docx bytes (deterministic: fixed
    timestamps, fixed member order)."""
    if n_pages is None:
        n_pages = (max(pages) + 1) if pages else 0
    buf = io.BytesIO()
    fixed = (1980, 1, 1, 0, 0, 0)
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for name, data in (
            ("[Content_Types].xml", _CONTENT_TYPES),
            ("_rels/.rels", _RELS),
            ("word/document.xml", document_xml(pages, n_pages)),
        ):
            zi = zipfile.ZipInfo(name, date_time=fixed)
            zi.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(zi, data)
    return buf.getvalue()


def docx_udf():
    """Arrow-batched serializer: spans array -> docx binary column.

    (Lives in a helper module without ``from __future__ import
    annotations`` — pandas_udf infers its eval type from *evaluated*
    type hints.)
    """
    from pdf_ocr_spark.operators._docx_udf import make_docx_udf

    return make_docx_udf(docx_bytes)
