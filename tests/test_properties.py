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


def test_codec_error_contract_fuzz():
    """Every from-scratch decoder (WAV, AVI, JPEG baseline+progressive,
    PDF plain/RC4/AES) must raise ValueError — never IndexError/
    KeyError/struct.error — on truncated, byte-flipped, spliced, or
    noise inputs: the error-as-row containment the Spark sources rely
    on. Seeded, ~1100 mutations."""
    import random

    import numpy as np

    from pdf_ocr_spark.sources.avicodec import decode_avi, encode_avi
    from pdf_ocr_spark.sources.glyphs import render_text_image
    from pdf_ocr_spark.sources.jpegcodec import decode_jpeg, encode_jpeg
    from pdf_ocr_spark.sources.pdfcodec import decode_pdf, encode_pdf
    from pdf_ocr_spark.sources.wavcodec import decode_wav, encode_wav

    rng = random.Random(42)
    page = render_text_image("FUZZ")
    cases = [
        (encode_wav(np.arange(-100, 100, dtype=np.int64), 8000), decode_wav),
        (encode_avi([encode_jpeg(np.full((16, 16), 99, np.uint8))], 16, 16), decode_avi),
        (encode_jpeg(page, 90), decode_jpeg),
        (encode_jpeg(page, 90, progressive=True), decode_jpeg),
        (encode_pdf([page], compress=True, object_streams=True), decode_pdf),
        (encode_pdf([page], encrypt=True), decode_pdf),
        (encode_pdf([page], encrypt=True, cipher="aes"), decode_pdf),
    ]
    for seed, dec in cases:
        for trial in range(160):
            data = bytearray(seed)
            mode = trial % 4
            if mode == 0:
                data = data[: rng.randrange(1, len(data))]
            elif mode == 1:
                for _ in range(rng.randrange(1, 8)):
                    data[rng.randrange(len(data))] = rng.randrange(256)
            elif mode == 2:
                at = rng.randrange(len(data))
                data[at:at] = bytes(
                    rng.randrange(256) for _ in range(rng.randrange(1, 40))
                )
            else:
                data = bytearray(seed[:12]) + bytearray(
                    rng.randrange(256) for _ in range(rng.randrange(10, 300))
                )
            try:
                dec(bytes(data))
            except ValueError:
                pass  # the contract
