"""Spark Column expressions for the reference's scalar text kernels.

All JVM-side built-ins (``replace``/``regexp_replace``/``transform``):
Catalyst folds the whole chain into one whole-stage-codegen projection,
so normalization is UDF-free, shuffle-free, and vectorizes at 100 TB.
Semantics are pinned to :mod:`pdf_ocr_spark.oracle.textfuncs` by tests.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pdf_ocr_spark.oracle.textfuncs import LANGUAGE_CODE_MAP, OCR_REPLACEMENTS

#: Java-regex class for the C0 controls stripped by sanitize_text (M2) —
#: everything below 0x20 except \t \n \r.
_CONTROL_CLASS = r"[\x00-\x08\x0B\x0C\x0E-\x1F]"


def sanitize_text_col(c: Column) -> Column:
    """M2 ``sanitize_text``: strip control chars; NULL/'' -> ''.
    Spec: /root/reference/app.py:198-202."""
    return F.coalesce(F.regexp_replace(c, _CONTROL_CLASS, ""), F.lit(""))


def fix_ocr_errors_col(c: Column) -> Column:
    """M5 ``fix_common_ocr_errors`` as a chain of built-in replaces.

    Sequential full-string passes in the spec order (each ``F.replace``
    is a single left-to-right non-overlapping pass — identical to
    ``str.replace``), then lone-newline -> space via Java-regex
    lookaround, then >=3-newline runs -> exactly two.  NULL and ''
    pass through unchanged (NULL propagates; '' is a fixpoint).
    Spec: /root/reference/app.py:347-370.
    """
    for wrong, right in OCR_REPLACEMENTS:
        c = F.replace(c, F.lit(wrong), F.lit(right))
    c = F.regexp_replace(c, r"(?<!\n)\n(?!\n)", " ")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    return c


def normalize_text_col(c: Column) -> Column:
    """Full per-page normalization: sanitize then fix (the chain at
    /root/reference/app.py:326-329). Always non-NULL."""
    return fix_ocr_errors_col(sanitize_text_col(c))


#: Exactly Python's ``str.strip()`` whitespace set (str.isspace()):
#: ASCII \s plus the C1 separators \x1c-\x1f, NEL, NBSP, and the
#: Unicode Zs/line/paragraph separators. Java's \s alone misses the
#: \x1c-\x1f range (found by hypothesis against the oracle).
_PY_WHITESPACE_CLASS = (
    "[\\s\\x1C-\\x1F\\x85\\xA0\\u1680\\u2000-\\u200A\\u2028\\u2029\\u202F\\u205F\\u3000]"
)


def strip_col(c: Column) -> Column:
    """Python ``str.strip()`` semantics as a column expression."""
    return F.regexp_replace(c, f"^{_PY_WHITESPACE_CLASS}+|{_PY_WHITESPACE_CLASS}+$", "")


def html_escape_col(c: Column) -> Column:
    """M9: escape ``&`` then ``<`` then ``>`` (order matters).
    Spec: /root/reference/app.py:404."""
    c = F.replace(c, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    c = F.replace(c, F.lit(">"), F.lit("&gt;"))
    return c


def secure_clean_filename_col(c: Column) -> Column:
    """M1 ``secure_clean_filename`` for ASCII inputs, as pure column ops.

    Path separators -> spaces, whitespace runs -> '_', strip chars
    outside ``[A-Za-z0-9_.-]``, trim leading/trailing ``.``/``_``.
    (The NFKD unicode fold of werkzeug has no Spark built-in; the
    full-fidelity version lives in the pandas kernel — for ASCII the two
    agree, see tests.) Spec: /root/reference/app.py:69-74.
    """
    c = F.replace(c, F.lit("/"), F.lit(" "))
    c = F.replace(c, F.lit("\\"), F.lit(" "))
    c = F.array_join(F.split(strip_col(c), r"\s+"), "_")
    c = F.regexp_replace(c, r"[^A-Za-z0-9_.\-]", "")
    return F.regexp_replace(c, r"^[._]+|[._]+$", "")


def allowed_file_col(c: Column) -> Column:
    """S2 extension gate: has a dot and a case-insensitively allowed
    extension. Spec: /root/reference/app.py:63-67."""
    ext = F.lower(F.substring_index(c, ".", -1))
    return c.isNotNull() & F.contains(c, F.lit(".")) & ext.isin("pdf")


def lang_map_col(c: Column) -> Column:
    """M6: split a '+'-joined language spec, map each 3-letter code to
    its 2-letter form, unknown codes pass through. Returns array<string>.
    Spec: /root/reference/app.py:272-284."""
    pairs = [x for kv in LANGUAGE_CODE_MAP.items() for x in kv]
    mapping = F.create_map(*[F.lit(x) for x in pairs])
    return F.transform(F.split(c, r"\+"), lambda x: F.coalesce(mapping[x], x))


def select_dpi_col(quality: Column) -> Column:
    """M8: 600 iff quality == 'high' else 300.
    Spec: /root/reference/app.py:432-435."""
    return F.when(quality == "high", F.lit(600)).otherwise(F.lit(300))
