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


@pytest.mark.parametrize("mode", ["tpgd", "arith", "mmr", "text"])
def test_embedded_round_trips(mode):
    page = render_text_image("JBIG2 GENERIC REGION ROUND TRIP")
    bits = (page < 128).astype(np.uint8)
    data = jbig2codec.encode_embedded(bits, mode=mode)
    out = jbig2codec.decode_embedded(data)
    assert out.shape == bits.shape and np.array_equal(out, bits)


@pytest.mark.parametrize("mode", ["tpgd", "arith", "mmr", "text"])
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
    with pytest.raises(ValueError, match="truncated JBIG2 symbol dictionary"):
        # an empty type-0 (symbol dictionary) payload: typed, not IndexError
        hdr = (0).to_bytes(4, "big") + bytes([0]) + b"\x00" + bytes([1]) + (0).to_bytes(4, "big")
        jbig2codec.decode_embedded(hdr)
    with pytest.raises(ValueError, match="halftone"):
        hdr = (0).to_bytes(4, "big") + bytes([22]) + b"\x00" + bytes([1]) + (0).to_bytes(4, "big")
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


@pytest.mark.parametrize("mode", ["tpgd", "mmr", "text", "textg"])
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


# ---------------------------------------------------------------------------
# Symbol dictionary + text region (T.88 §6.5/§6.4, Annex A)
# ---------------------------------------------------------------------------


def test_iax_integer_round_trip_over_all_classes():
    """Every magnitude class boundary of the Annex-A IAx code, both
    signs, plus OOB markers, through one shared MQ stream."""
    vals = [0, 1, 3, 4, 19, 20, 51, 52, 307, 308, 4403, 4404, 5_000_000]
    vals = vals + [-v for v in vals if v] + [None, None, 7, None]
    enc = jbig2codec.MQEncoder()
    cx = jbig2codec.new_int_ctx()
    for v in vals:
        jbig2codec.encode_int(enc, cx, v)
    dec = jbig2codec.MQDecoder(enc.flush())
    cx2 = jbig2codec.new_int_ctx()
    assert [jbig2codec.decode_int(dec, cx2) for _ in vals] == vals


def test_iaid_round_trip_various_code_lengths():
    for symcodelen, ids in [(1, [0, 1, 1, 0]), (3, [0, 5, 7, 2]), (9, [0, 511, 300])]:
        enc = jbig2codec.MQEncoder()
        cx = [0] * (1 << (symcodelen + 1))
        for i in ids:
            jbig2codec.encode_iaid(enc, cx, symcodelen, i)
        dec = jbig2codec.MQDecoder(enc.flush())
        cx2 = [0] * (1 << (symcodelen + 1))
        assert [jbig2codec.decode_iaid(dec, cx2, symcodelen) for _ in ids] == ids


def test_symbol_dict_round_trip_orders_by_height_class():
    rng = np.random.RandomState(5)
    symbols = [
        (rng.rand(h, w) < 0.4).astype(np.uint8) | np.eye(h, w, dtype=np.uint8)
        for h, w in [(7, 5), (3, 9), (7, 2), (3, 3), (12, 12), (3, 9)]
    ]
    sd = jbig2codec.encode_symbol_dict(symbols)
    exported = jbig2codec.decode_symbol_dict(sd)
    order = jbig2codec._sorted_symbol_order(symbols)
    assert [tuple(s.shape) for s in exported] == [
        tuple(symbols[i].shape) for i in order
    ]
    for sid, orig in enumerate(order):
        assert np.array_equal(exported[sid], symbols[orig])


def test_symbolize_is_lossless_and_dedupes():
    page = (render_text_image("AABBA ABAB\nBABA AABB") < 128).astype(np.uint8)
    symbols, placements = jbig2codec._symbolize(page)
    # exact dedup: only the distinct glyph shapes (A, B) survive
    assert len(symbols) < len(placements)
    rebuilt = np.zeros_like(page)
    for y0, x0, si in placements:
        h, w = symbols[si].shape
        rebuilt[y0 : y0 + h, x0 : x0 + w] |= symbols[si]
    assert np.array_equal(rebuilt, page)


def test_text_region_all_refcorners_decode():
    """The writer emits TOPLEFT, but wild files use all four corners:
    rewrite the flags and check each decodes to the same page (the
    encoder's S/T deltas are corner-independent for same-height
    strips of equal-height symbols)."""
    sym = np.ones((4, 3), np.uint8)
    symbols = [sym]
    placements = [(2, 1, 0), (2, 10, 0), (8, 5, 0)]
    tr = jbig2codec.encode_text_region(placements, symbols, 20, 14)
    x, y, base = jbig2codec.decode_text_region(tr, symbols)
    expect = np.zeros((14, 20), np.uint8)
    for y0, x0, _ in placements:
        expect[y0 : y0 + 4, x0 : x0 + 3] = 1
    assert np.array_equal(base, expect)
    # flags live at bytes 17-18 of the region body; REFCORNER bits 4-5
    flags = int.from_bytes(tr[17:19], "big")
    for corner in (0, 2, 3):
        nf = (flags & ~(3 << 4)) | (corner << 4)
        tr2 = tr[:17] + nf.to_bytes(2, "big") + tr[19:]
        _, _, out = jbig2codec.decode_text_region(tr2, symbols)
        # corner changes shift placement: just decode without error and
        # preserve total ink per instance
        assert out.sum() <= expect.sum() and out.sum() > 0


def test_text_region_typed_errors():
    sym = np.ones((2, 2), np.uint8)
    tr = jbig2codec.encode_text_region([(0, 0, 0)], [sym], 5, 5)
    # SBHUFF flag
    flags = int.from_bytes(tr[17:19], "big")
    bad = tr[:17] + (flags | 1).to_bytes(2, "big") + tr[19:]
    with pytest.raises(ValueError, match="Huffman"):
        jbig2codec.decode_text_region(bad, [sym])
    # refinement flag
    bad = tr[:17] + (flags | 2).to_bytes(2, "big") + tr[19:]
    with pytest.raises(ValueError, match="refined"):
        jbig2codec.decode_text_region(bad, [sym])
    # transposed flag
    bad = tr[:17] + (flags | (1 << 6)).to_bytes(2, "big") + tr[19:]
    with pytest.raises(ValueError, match="transposed"):
        jbig2codec.decode_text_region(bad, [sym])
    # no symbols
    with pytest.raises(ValueError, match="no referred symbols"):
        jbig2codec.decode_text_region(tr, [])
    # truncated
    with pytest.raises(ValueError, match="truncated"):
        jbig2codec.decode_text_region(tr[:10], [sym])


def test_symbol_dict_typed_errors():
    sd = jbig2codec.encode_symbol_dict([np.ones((2, 2), np.uint8)])
    # SDHUFF flag set
    bad = (int.from_bytes(sd[0:2], "big") | 1).to_bytes(2, "big") + sd[2:]
    with pytest.raises(ValueError, match="Huffman"):
        jbig2codec.decode_symbol_dict(bad)
    # REFAGG flag set
    bad = (int.from_bytes(sd[0:2], "big") | 2).to_bytes(2, "big") + sd[2:]
    with pytest.raises(ValueError, match="refinement"):
        jbig2codec.decode_symbol_dict(bad)
    # garbage arithmetic payload: typed, never an unbounded loop
    bad = sd[:18] + (1000).to_bytes(4, "big") + (1000).to_bytes(4, "big") + b"\x00\x01"
    with pytest.raises(ValueError):
        jbig2codec.decode_symbol_dict(bad)


def test_embedded_globals_split_round_trip():
    page = (render_text_image("GLOBALS DICT PAGE") < 128).astype(np.uint8)
    glob, pd = jbig2codec.encode_embedded_split(page)
    assert glob  # dictionary really lives in the side stream
    out = jbig2codec.decode_embedded(pd, glob)
    assert np.array_equal(out, page)
    with pytest.raises(ValueError, match="missing segment"):
        jbig2codec.decode_embedded(pd)  # without the globals


def test_embedded_text_blank_page_falls_back():
    blank = np.zeros((6, 8), np.uint8)
    data = jbig2codec.encode_embedded(blank, mode="text")
    assert np.array_equal(jbig2codec.decode_embedded(data), blank)
    glob, pd = jbig2codec.encode_embedded_split(blank)
    assert glob == b""
    assert np.array_equal(jbig2codec.decode_embedded(pd), blank)


def test_symbol_coding_beats_generic_on_glyph_pages():
    """The reason producers emit this organization: repeated glyphs
    code once. A text page must be smaller symbol-coded than as a
    TPGDON generic region."""
    page = (
        render_text_image("THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG\n" * 4)
        < 128
    ).astype(np.uint8)
    sym = jbig2codec.encode_embedded(page, mode="text")
    gen = jbig2codec.encode_embedded(page, mode="tpgd")
    assert len(sym) < len(gen)


def test_jbig2_globals_pdf_objstm_encrypt_compose():
    """textg globals stream composes with ObjStm + AES: the globals
    object stays top-level and decrypts under its own object number."""
    page = render_text_image("GLOBALS COMPOSED")
    data = pdfcodec.encode_pdf(
        [page, page],
        jbig2=True,
        jbig2_mode="textg",
        object_streams=True,
        encrypt=True,
        cipher="aes",
    )
    assert b"/JBIG2Globals" in data
    imgs = pdfcodec.decode_pdf(data)
    assert len(imgs) == 2
    assert np.array_equal(imgs[0], np.where(page < 128, 0, 255).astype(np.uint8))
