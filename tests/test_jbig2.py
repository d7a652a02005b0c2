"""JBIG2 (ITU-T T.88) subset codec: MQ arithmetic coder, GBTEMPLATE-0
generic regions (TPGDON / plain / MMR), embedded segment layer, and the
PDF /JBIG2Decode integration.

The reference accepts JBIG2-compressed scanned PDFs implicitly through
Poppler (/root/reference/app.py:447-482); there are no third-party JBIG2
files in this container, so — like the CCITT coder — conformance is
pinned by exhaustive encoder/decoder round-trips over structured and
adversarial bitmaps plus the published standard constants (the 47-state
Qe table, the 0x9B25 TPGDON context)."""

import numpy as np
import pytest

from pdf_ocr_spark.sources import jbig2codec, pdfcodec
from pdf_ocr_spark.sources.glyphs import render_text_image
from pdf_ocr_spark.operators.imaging import ocr_decode


def test_mq_table_is_the_published_constant():
    assert len(jbig2codec.MQ_TABLE) == 47
    assert jbig2codec.MQ_TABLE[0] == (0x5601, 1, 1, 1)
    assert jbig2codec.MQ_TABLE[46] == (0x5601, 46, 46, 0)
    # every NMPS/NLPS transition stays inside the table
    for qe, nmps, nlps, switch in jbig2codec.MQ_TABLE:
        assert 0 < qe <= 0x5601 and 0 <= nmps < 47 and 0 <= nlps < 47


def test_mq_coder_round_trips_biased_streams():
    import random

    rng = random.Random(11)
    for trial in range(60):
        n = rng.randrange(1, 2500)
        nctx = rng.choice([1, 3, 8])
        p = rng.choice([0.5, 0.95, 0.999, 0.02])
        seq = [(1 if rng.random() < p else 0, rng.randrange(nctx)) for _ in range(n)]
        enc = jbig2codec.MQEncoder()
        st = [0] * nctx
        for b, c in seq:
            enc.encode(st, c, b)
        data = enc.flush()
        dec = jbig2codec.MQDecoder(data)
        st2 = [0] * nctx
        assert [dec.decode(st2, c) for _, c in seq] == [b for b, _ in seq], trial


def test_mq_decoder_tolerates_marker_and_truncation():
    """E.3.4: past the data end (or at a >0x8F marker pair) the decoder
    feeds 1-bits instead of crashing — decode must not raise even on
    an empty stream."""
    dec = jbig2codec.MQDecoder(b"")
    st = [0]
    for _ in range(64):
        assert dec.decode(st, 0) in (0, 1)


@pytest.mark.parametrize("mode", ["tpgd", "arith", "mmr"])
def test_embedded_round_trips(mode):
    page = render_text_image("JBIG2 GENERIC REGION ROUND TRIP")
    bits = (page < 128).astype(np.uint8)
    data = jbig2codec.encode_embedded(bits, mode=mode)
    out = jbig2codec.decode_embedded(data)
    assert out.shape == bits.shape and np.array_equal(out, bits)


@pytest.mark.parametrize("mode", ["tpgd", "arith", "mmr"])
def test_adversarial_bitmaps_round_trip(mode):
    cases = [
        np.zeros((1, 1), np.uint8),
        np.zeros((40, 30), np.uint8),
        np.ones((3, 700), np.uint8),
        (np.random.RandomState(0).rand(40, 60) < 0.5).astype(np.uint8),
        np.eye(17, dtype=np.uint8),
        np.tile([[1, 0]], (5, 31))[:, :61].astype(np.uint8),  # odd width
    ]
    for bm in cases:
        got = jbig2codec.decode_embedded(jbig2codec.encode_embedded(bm, mode=mode))
        assert np.array_equal(got, bm), bm.shape


def test_tpgdon_helps_on_banded_pages():
    """TPGDON exists to skip rows identical to their predecessor —
    a page of repeated rows must code smaller with it than without."""
    bm = np.tile((np.arange(80) % 7 < 3).astype(np.uint8), (60, 1))
    with_tp = jbig2codec.encode_embedded(bm, mode="tpgd")
    without = jbig2codec.encode_embedded(bm, mode="arith")
    assert len(with_tp) < len(without)


def test_segment_layer_typed_errors():
    with pytest.raises(ValueError, match="symbol dictionary"):
        # a segment header declaring type 0 (symbol dictionary)
        hdr = (0).to_bytes(4, "big") + bytes([0]) + b"\x00" + bytes([1]) + (0).to_bytes(4, "big")
        jbig2codec.decode_embedded(hdr)
    with pytest.raises(ValueError, match="truncated JBIG2 segment header"):
        jbig2codec.decode_embedded(b"\x00\x01\x02")
    with pytest.raises(ValueError, match="no page or region"):
        jbig2codec.decode_embedded(b"")
    with pytest.raises(ValueError, match="unknown-length"):
        hdr = (0).to_bytes(4, "big") + bytes([38]) + b"\x00" + bytes([1]) + b"\xff\xff\xff\xff"
        jbig2codec.decode_embedded(hdr)
    # corrupt region payload inside a valid header: typed, not IndexError
    bad = b"\x00" * 10
    hdr = (0).to_bytes(4, "big") + bytes([38]) + b"\x00" + bytes([1]) + len(bad).to_bytes(4, "big") + bad
    with pytest.raises(ValueError, match="truncated JBIG2 region"):
        jbig2codec.decode_embedded(hdr)


@pytest.mark.parametrize("mode", ["tpgd", "mmr"])
def test_jbig2_pdf_roundtrip_and_ocr(mode):
    """Scanned-PDF chain with /JBIG2Decode rasters: parse -> MQ/MMR
    decode -> OCR recovers the exact text (bitonal, so the round trip
    is exact)."""
    text = "JBIG2 PDF SCAN 321"
    page = render_text_image(text)
    data = pdfcodec.encode_pdf([page], jbig2=True, jbig2_mode=mode)
    assert b"/JBIG2Decode" in data and b"/BitsPerComponent 1" in data
    imgs = pdfcodec.decode_pdf(data)
    assert imgs[0].shape == page.shape
    assert np.array_equal(imgs[0], np.where(page < 128, 0, 255).astype(np.uint8))
    got, conf = ocr_decode(imgs[0])
    assert got == text and conf == 1.0


def test_jbig2_pdf_with_objstm_encrypt_and_chain():
    """JBIG2 composes with the other writer features: object streams,
    RC4 encryption, and an ASCII85 wrapping chain."""
    page = render_text_image("COMPOSED JBIG2")
    for kw in (
        dict(object_streams=True),
        dict(encrypt=True),
        dict(ascii85=True),
        dict(object_streams=True, encrypt=True, cipher="aes256"),
    ):
        data = pdfcodec.encode_pdf([page, page], jbig2=True, **kw)
        imgs = pdfcodec.decode_pdf(data)
        assert len(imgs) == 2
        assert np.array_equal(
            imgs[0], np.where(page < 128, 0, 255).astype(np.uint8)
        ), kw
