"""External OCR engine contracts — the reference's exact dispatch
semantics as pure, injectable functions.

The engines themselves (tesseract binary, easyocr models, pyocr) are
not present in this container, but their *result-assembly contracts*
are observable behavior a user switching engines relies on, so they
are implemented and golden-tested here with injected backends (the
reference's own test strategy: mocked ``pytesseract.image_to_string``,
/root/reference/test_app.py:265-302). The Arrow kernel in
:mod:`pdf_ocr_spark.operators.ocr` calls these with the real backend
when importable and falls back to typed error rows when not.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pdf_ocr_spark.oracle.textfuncs import map_language_codes


def tesseract_config(language: str, retry: bool = False) -> str:
    """The reference's tesseract config string
    (/root/reference/app.py:246-249,259-262): ``--oem 1 --psm 3`` with
    ``--dpi 300`` appended only for pure-English runs (``'eng' in
    language and '+' not in language`` — the substring check is the
    reference's, so e.g. 'eng_best' also gets it); the empty-result
    retry switches to ``--psm 6`` and drops the dpi hint."""
    if retry:
        return f"--oem 1 --psm 6 -l {language}"
    config = f"--oem 1 --psm 3 -l {language}"
    if "eng" in language and "+" not in language:
        config += " --dpi 300"
    return config


def tesseract_decode(
    img,
    language: str,
    image_to_string: Callable[..., str],
) -> tuple[str, bool]:
    """Tesseract branch contract (/root/reference/app.py:243-266):
    primary decode with :func:`tesseract_config`; a result that strips
    empty retries once with the psm-6 config; backend exceptions
    become the reference's exact bracketed error string. Returns
    (text, is_error)."""
    try:
        text = image_to_string(img, config=tesseract_config(language))
        if not text.strip():
            text = image_to_string(img, config=tesseract_config(language, retry=True))
        return text, False
    except Exception as e:
        return f"[Error with Tesseract OCR: {e}]", True


def easyocr_assemble(result: Sequence[str] | None) -> str:
    """easyocr result assembly (/root/reference/app.py:290-291):
    ``readtext(detail=0, paragraph=True)`` paragraphs joined with a
    newline; a falsy result is the empty string."""
    return "\n".join(result) if result else ""


def easyocr_decode(
    img,
    language: str,
    reader_factory: Callable[[list[str]], object] | None = None,
) -> tuple[str, bool]:
    """easyocr branch contract (/root/reference/app.py:268-294):
    '+'-separated ISO-3 codes map to easyocr's 2-letter codes (unknown
    codes pass through), one Reader over ALL requested languages,
    ``readtext(detail=0, paragraph=True)`` joined with newlines.
    ``reader_factory`` injects the backend (tests; real deployments
    leave it None and the import supplies it). Returns
    (text, is_error)."""
    try:
        if reader_factory is None:
            import easyocr  # not present in this container

            reader_factory = easyocr.Reader
        reader = reader_factory(map_language_codes(language))
        result = reader.readtext(img, detail=0, paragraph=True)
        return easyocr_assemble(result), False
    except Exception as e:
        return f"[Error with EasyOCR: {e}]", True


def pyocr_decode(
    img,
    language: str,
    tools: Sequence[object] | None = None,
) -> tuple[str, bool]:
    """pyocr branch contract (/root/reference/app.py:296-320): first
    available tool wins; an empty tool list is the reference's exact
    no-tool error string; the tool is called with a TextBuilder.
    ``tools`` injects the backend for tests. Returns (text, is_error)."""
    try:
        if tools is None:
            import pyocr  # not present in this container

            tools = pyocr.get_available_tools()
        if len(tools) == 0:
            return (
                "[Error: No OCR tool found for PyOCR. Install Tesseract or Cuneiform.]",
                True,
            )
        tool = tools[0]
        try:
            import pyocr.builders

            builder = pyocr.builders.TextBuilder()
        except Exception:
            builder = None  # injected tools may not need the real builder
        return tool.image_to_string(img, lang=language, builder=builder), False
    except Exception as e:
        return f"[Error with PyOCR: {e}]", True
