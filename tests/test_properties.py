"""Hypothesis property tests: the Spark column chains agree with the
pure-Python oracle on arbitrary (adversarial) inputs — batched so each
example is one Spark job over many strings."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from pdf_ocr_spark import functions as X
from pdf_ocr_spark import oracle

# text alphabet biased toward the replacement chain + controls + newlines
_alpha = st.sampled_from(
    list("l1rncvw05abcXYZ ,.;:!?\t\r") + ["\n", "\x00", "\x07", "\x0b", "\x1f", "é", "日"]
)
_texts = st.lists(st.text(alphabet=_alpha, max_size=80), min_size=1, max_size=25)


@settings(max_examples=25, deadline=None)
@given(_texts)
def test_normalize_matches_oracle(spark, texts):
    df = spark.createDataFrame([Row(v=t) for t in texts], "v string")
    got = [r["o"] for r in df.select(X.normalize_text_col(F.col("v")).alias("o")).collect()]
    want = [oracle.fix_common_ocr_errors(oracle.sanitize_text(t)) or "" for t in texts]
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.text(alphabet=_alpha, max_size=60)),
        min_size=0,
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
def test_serializers_match_oracle(spark, pages_list):
    pages = dict(pages_list)
    spans = [Row(offset=i, text=t) for i, t in pages.items()]
    df = spark.createDataFrame(
        [Row(pages=spans)], "pages array<struct<offset:int, text:string>>"
    )
    row = df.select(
        X.txt_doc_col(F.col("pages")).alias("txt"),
        X.markdown_doc_col(F.col("pages")).alias("md"),
        X.html_doc_col(F.col("pages"), F.lit("T")).alias("html"),
    ).collect()[0]
    assert row["txt"] == oracle.serialize_txt(pages)
    assert row["md"] == oracle.serialize_markdown(pages)
    assert row["html"] == oracle.serialize_html(pages, title="T")


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=20))
def test_unicode_filename_udf_matches_oracle(spark, names):
    from pdf_ocr_spark.functions._text_udf import secure_clean_filename_udf

    df = spark.createDataFrame([Row(v=n) for n in names], "v string")
    got = [r["o"] for r in df.select(secure_clean_filename_udf(F.col("v")).alias("o")).collect()]
    assert got == [oracle.secure_clean_filename(n) for n in names]
