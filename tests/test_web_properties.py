"""Property-based tests (hypothesis) for the round-3 codecs: HTML
boilerplate-strip round-trip, WARC container round-trip, JPEG decode
robustness. Driver-side pure-python — no SparkSession needed."""

import numpy as np
from hypothesis import given, settings, strategies as st

from pdf_ocr_spark.operators.webextract import links_of, main_spans_of
from pdf_ocr_spark.sources.jpegcodec import decode_jpeg, encode_jpeg
from pdf_ocr_spark.sources.warcsource import parse_warc, write_warc
from pdf_ocr_spark.sources.webgen import (
    html_for_doc,
    planted_links,
    planted_paragraphs,
)

# tokens over a hostile alphabet: html-specials, punctuation, unicode
_token = st.text(
    alphabet="ab<>&\"'/=;:!?.,()[]{}#%é中—", min_size=1, max_size=8
).filter(lambda t: t.strip())
_texts = st.lists(_token, min_size=0, max_size=80).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(doc_id=st.integers(min_value=0, max_value=10**9), text=_texts,
       lang=st.sampled_from(["en", "de", "fr", ""]))
def test_html_roundtrip_recovers_planted_content(doc_id, text, lang):
    html = html_for_doc(doc_id, text, lang)
    spans = main_spans_of(html)
    paras = planted_paragraphs(text)
    exp = [("heading", f"Document {doc_id}", None)]
    for i, p in enumerate(paras, 1):
        exp.append(("text", p, None))
        if i % 3 == 0:
            exp.append(("image", None, f"img://{doc_id}/{i}"))
    assert spans == exp
    assert links_of(html) == planted_links(doc_id)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abc0123456789-", min_size=1, max_size=12),
            st.text(alphabet="ab:/.-", min_size=1, max_size=20),
            st.text(min_size=0, max_size=200),  # arbitrary unicode payload
        ),
        min_size=0,
        max_size=6,
    ),
    st.booleans(),
)
def test_warc_roundtrip_arbitrary_payloads(recs, compress):
    data = write_warc(recs, compress=compress)
    out = parse_warc(data) if recs else parse_warc(data)
    assert [(r["record_id"], r["payload"]) for r in out] == [
        (rid, payload) for rid, _, payload in recs
    ]


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    quality=st.integers(min_value=50, max_value=100),
    rgb=st.booleans(),
    ss=st.sampled_from(["444", "422", "420"]),
)
def test_jpeg_decode_total_on_any_encode(h, w, seed, quality, rgb, ss):
    rng = np.random.RandomState(seed)
    shape = (h, w, 3) if rgb else (h, w)
    img = rng.randint(0, 256, shape).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality, subsampling=ss))
    assert out.shape == img.shape and out.dtype == np.uint8


@settings(max_examples=30, deadline=None)
@given(cut=st.integers(min_value=0, max_value=400), seed=st.integers(0, 1000))
def test_jpeg_truncation_always_typed_error_or_success(cut, seed):
    rng = np.random.RandomState(seed)
    data = encode_jpeg(rng.randint(0, 256, (16, 16)).astype(np.uint8), 90)
    cut = min(cut, len(data))
    try:
        decode_jpeg(data[:cut])
    except ValueError:
        pass  # the only permitted failure mode
