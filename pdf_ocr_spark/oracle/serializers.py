"""Document serializers — executable spec of the reference's sinks.

Each takes the page map ``{page_index: text}`` (the reference's
``results`` dict, ``/root/reference/app.py:502``) and returns the full
output as a string, byte-equal to what the reference writes to disk.
"""

from __future__ import annotations

from pdf_ocr_spark.oracle.textfuncs import html_escape

TXT_PAGE_SEPARATOR = "\n\n--- Page Break ---\n\n"


def serialize_txt(pages: dict[int, str]) -> str:
    """S5: pages in sorted-index order, separator between consecutive
    pages (never after the last). Spec: ``/root/reference/app.py:546-552``.
    """
    keys = sorted(pages)
    return TXT_PAGE_SEPARATOR.join(pages[i] for i in keys)


def serialize_markdown(pages: dict[int, str]) -> str:
    """S6: per page, split on blank lines; each paragraph stripped and
    followed by a blank line; ``---`` + blank line between pages (never
    after the last). Spec: ``/root/reference/app.py:372-383``.
    """
    out: list[str] = []
    keys = sorted(pages)
    for n, i in enumerate(keys):
        for para in pages[i].split("\n\n"):
            out.append(para.strip() + "\n\n")
        if n < len(keys) - 1:
            out.append("---\n\n")
    return "".join(out)


HTML_STYLE = (
    "    <style>body { font-family: sans-serif; line-height: 1.6; } "
    ".page-break { page-break-after: always; }</style>\n"
)


def serialize_html(pages: dict[int, str], title: str = "Converted Document") -> str:
    """S7: fixed HTML scaffold; per paragraph a ``<p>`` with ``&``/``<``/
    ``>`` escaped then stripped; ``<hr class="page-break">`` between
    pages. The title is interpolated unescaped, as the reference does.
    Spec: ``/root/reference/app.py:385-411``.
    """
    out: list[str] = [
        "<!DOCTYPE html>\n",
        '<html lang="en">\n',
        "<head>\n",
        '    <meta charset="UTF-8">\n',
        f"    <title>{title}</title>\n",
        HTML_STYLE,
        "</head>\n",
        "<body>\n",
        f"<h1>{title}</h1>\n",
    ]
    keys = sorted(pages)
    for n, i in enumerate(keys):
        for para in pages[i].split("\n\n"):
            out.append(f"<p>{html_escape(para).strip()}</p>\n")
        if n < len(keys) - 1:
            out.append('<hr class="page-break">\n')
    out.append("</body>\n")
    out.append("</html>\n")
    return "".join(out)
