"""Golden vectors for the scalar kernels (FIXTURES.md F2, ported from the
reference's own tests) — checked against BOTH the pure-Python oracle and
the Spark column expressions, which must agree byte-for-byte."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pdf_ocr_spark import functions as X
from pdf_ocr_spark import oracle

# (input, expected) — sources: /root/reference/test_app.py:90-110,380-392
SANITIZE_VECTORS = [
    ("Hello\x00World", "HelloWorld"),
    ("\x00\x01\x02", ""),
    ("Tab\there", "Tab\there"),
    ("nl\nkept\rkept", "nl\nkept\rkept"),
    ("\x0b\x0c stripped", " stripped"),
    (None, ""),
    ("", ""),
]

FIX_VECTORS = [
    ("l1 rn cl vv , . ; : ! ? 0 1 5", "h m d w,.;:!? O I S"),
    ("Hel1o", "Heho"),  # 'l1'->'h' wins over '1'->'I'
    ("Line1\nLine2", "LineI Line2"),
    ("Para1\n\n\n\nPara2", "ParaI\n\nPara2"),
    ("a\n\nb", "a\n\nb"),
    ("\nleading", " leading"),
    ("trailing\n", "trailing "),
    ("cl1", "ch"),  # sequential: 'cl'->'d'? no — 'l1'->'h' fires first
    ("price: 105", "price: IOS"),
    ("", ""),
    (None, None),
]

FILENAME_VECTORS = [
    ("../../etc/passwd.pdf", "etc_passwd.pdf"),
    ("üñîçødé.pdf", "unicde.pdf"),
    ("my file (1).pdf", "my_file_1.pdf"),
    ("..hidden..", "hidden"),
    ("normal-name_v2.pdf", "normal-name_v2.pdf"),
]

HTML_VECTORS = [
    ("Test with <html> & entities", "Test with &lt;html&gt; &amp; entities"),
    ("a&amp;b", "a&amp;amp;b"),  # & escapes first, exactly once per pass
    ("", ""),
]


def _spark_eval(spark, col, values):
    df = spark.createDataFrame([Row(v=v) for v in values], "v string")
    return [r["out"] for r in df.select(col(F.col("v")).alias("out")).collect()]


def test_sanitize_oracle():
    for inp, want in SANITIZE_VECTORS:
        assert oracle.sanitize_text(inp) == want, repr(inp)


def test_fix_oracle():
    for inp, want in FIX_VECTORS:
        assert oracle.fix_common_ocr_errors(inp) == want, repr(inp)


def test_filename_oracle():
    for inp, want in FILENAME_VECTORS:
        assert oracle.secure_clean_filename(inp) == want, repr(inp)


def test_html_escape_oracle():
    for inp, want in HTML_VECTORS:
        assert oracle.html_escape(inp) == want, repr(inp)


def test_allowed_file_oracle():
    assert oracle.allowed_file("doc.pdf")
    assert oracle.allowed_file("DOC.PDF")
    assert not oracle.allowed_file("doc.txt")
    assert not oracle.allowed_file("pdf")
    assert not oracle.allowed_file(None)
    assert not oracle.allowed_file("")


def test_lang_map_oracle():
    assert oracle.map_language_codes("eng") == ["en"]
    assert oracle.map_language_codes("eng+fra") == ["en", "fr"]
    assert oracle.map_language_codes("xyz") == ["xyz"]
    assert oracle.map_language_codes("chi_sim+jpn") == ["ch_sim", "ja"]


def test_dpi_oracle():
    assert oracle.select_dpi("high") == 600
    assert oracle.select_dpi("standard") == 300
    assert oracle.select_dpi("anything") == 300


def test_sanitize_spark_matches_oracle(spark):
    inputs = [v for v, _ in SANITIZE_VECTORS]
    got = _spark_eval(spark, X.sanitize_text_col, inputs)
    assert got == [oracle.sanitize_text(v) for v in inputs]


def test_fix_spark_matches_oracle(spark):
    inputs = [v for v, _ in FIX_VECTORS]
    got = _spark_eval(spark, X.fix_ocr_errors_col, inputs)
    assert got == [oracle.fix_common_ocr_errors(v) for v in inputs]


def test_filename_spark_matches_oracle_ascii(spark):
    # Column version is pinned to ASCII inputs (no NFKD built-in).
    inputs = [v for v, _ in FILENAME_VECTORS if v.isascii()]
    got = _spark_eval(spark, X.secure_clean_filename_col, inputs)
    assert got == [oracle.secure_clean_filename(v) for v in inputs]


def test_html_escape_spark_matches_oracle(spark):
    inputs = [v for v, _ in HTML_VECTORS]
    got = _spark_eval(spark, X.html_escape_col, inputs)
    assert got == [oracle.html_escape(v) for v in inputs]


@pytest.mark.parametrize(
    "fname,want",
    [("doc.pdf", True), ("DOC.PDF", True), ("doc.txt", False), ("pdf", False)],
)
def test_allowed_file_spark(spark, fname, want):
    assert _spark_eval(spark, X.allowed_file_col, [fname]) == [want]


def test_lang_map_spark(spark):
    inputs = ["eng", "eng+fra", "xyz", "chi_sim+jpn"]
    got = _spark_eval(spark, X.lang_map_col, inputs)
    assert got == [oracle.map_language_codes(v) for v in inputs]


def test_randomized_normalize_agreement(spark):
    """Property check: Spark chain == Python oracle on adversarial strings
    built from the replacement alphabet + newlines + controls."""
    import random

    rng = random.Random(42)
    alphabet = list("l1rncvw05 ,.;:!?ab") + ["\n", "\t", "\x00", "\x07", "\x0b", "\r"]
    inputs = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60))) for _ in range(300)]
    got = _spark_eval(spark, X.normalize_text_col, inputs)
    want = [oracle.fix_common_ocr_errors(oracle.sanitize_text(v)) or "" for v in inputs]
    assert got == want
