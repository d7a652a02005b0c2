"""CCITT Group 4 (ITU-T T.6 MMR) codec: mode coding, run tables, and
the /CCITTFaxDecode wiring through the subset PDF parser.

The reference decodes fax-compressed scans through Poppler
(/root/reference/app.py:447-454); scanner firmware emits /K -1 Group 4
almost universally for bitonal pages, so this is the dominant wild
scanned-PDF raster shape."""

from __future__ import annotations

import numpy as np
import pytest

from pdf_ocr_spark.sources import ccittcodec as cc
from pdf_ocr_spark.sources import pdfcodec

RNG = np.random.default_rng(9)


@pytest.mark.parametrize(
    "img",
    [
        np.zeros((5, 40), dtype=np.uint8),
        np.ones((5, 40), dtype=np.uint8),
        (RNG.random((30, 73)) < 0.3).astype(np.uint8),
        np.eye(20, 20, dtype=np.uint8),
        (RNG.random((1, 1)) < 0.5).astype(np.uint8),
    ],
    ids=["all-white", "all-black", "speckle", "diagonal", "1x1"],
)
def test_g4_round_trip(img):
    enc = cc.g4_encode(img)
    assert (cc.g4_decode(enc, img.shape[1], img.shape[0]) == img).all()


def test_g4_round_trip_stress():
    for _ in range(40):
        h = int(RNG.integers(1, 25))
        w = int(RNG.integers(1, 130))
        img = (RNG.random((h, w)) < RNG.random()).astype(np.uint8)
        enc = cc.g4_encode(img)
        assert (cc.g4_decode(enc, w, h) == img).all()


def test_g4_makeup_runs():
    """Rows wider than 2560 force extended makeup codes both colors."""
    img = np.zeros((3, 6000), dtype=np.uint8)
    img[1, 100:5900] = 1
    enc = cc.g4_encode(img)
    assert (cc.g4_decode(enc, 6000, 3) == img).all()


def test_g4_table_spot_checks():
    """Pin a handful of ITU-T T.4 table entries as published — a
    symmetric transcription typo would round-trip internally but
    break interop."""
    assert cc._WHITE_TERM[0] == "00110101"
    assert cc._WHITE_TERM[63] == "00110100"
    assert cc._WHITE_MAKEUP[64] == "11011"
    assert cc._WHITE_MAKEUP[1728] == "010011011"
    assert cc._BLACK_TERM[1] == "010"
    assert cc._BLACK_TERM[2] == "11"
    assert cc._BLACK_MAKEUP[64] == "0000001111"
    assert cc._EXT_MAKEUP[2560] == "000000011111"
    # mode codes (T.6): V0=1, VR1=011, VL1=010, H=001, P=0001
    assert cc._MODE_V[0] == "1" and cc._MODE_V[1] == "011"
    assert cc._MODE_H == "001" and cc._MODE_P == "0001"


def test_g4_compresses_text():
    from pdf_ocr_spark.sources.glyphs import render_text_image

    img = (render_text_image("the quick brown fox jumps over it") < 128).astype(
        np.uint8
    )
    enc = cc.g4_encode(img)
    assert len(enc) < img.size // 8  # beats even raw 1-bit packing
    assert (cc.g4_decode(enc, img.shape[1], img.shape[0]) == img).all()


def test_g4_error_contract():
    with pytest.raises(ValueError, match="mode code"):
        cc.g4_decode(b"\x00\x00\x00\x00\x00\x00\x00", 64, 2)
    img = np.eye(8, 8, dtype=np.uint8)
    enc = cc.g4_encode(img)
    with pytest.raises(ValueError):
        cc.g4_decode(enc[: len(enc) // 2] + b"\x00", 8, 8)  # truncated/corrupt


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(ccitt=True),
        dict(ccitt=True, object_streams=True),
        dict(ccitt=True, encrypt=True),
        dict(ccitt=True, encrypt=True, cipher="aes256"),
    ],
)
def test_ccitt_pdf_round_trip(kwargs):
    from pdf_ocr_spark.sources.glyphs import render_text_image

    pg1 = render_text_image("fax page one content here")
    pg2 = render_text_image("and a second page of text")
    data = pdfcodec.encode_pdf([pg1, pg2], **kwargs)
    assert b"/CCITTFaxDecode" in data or kwargs.get("encrypt") or kwargs.get(
        "object_streams"
    )
    got = pdfcodec.decode_pdf(data)
    assert len(got) == 2
    assert (got[0] == pg1).all() and (got[1] == pg2).all()


def test_ccitt_mode_mismatch_is_typed_error():
    """A G4 (/K -1) stream relabeled /K 0 decodes as 1-D MH garbage —
    must fail with a typed CCITT error, not crash or mis-decode
    silently. (K=0 itself is SUPPORTED since round 5 — see
    test_ccitt_k_modes_pdf_round_trip.)"""
    from pdf_ocr_spark.sources.glyphs import render_text_image

    data = pdfcodec.encode_pdf([render_text_image("x")], ccitt=True)
    broken = data.replace(b"/K -1", b"/K 0 ")
    with pytest.raises(ValueError, match="CCITT"):
        pdfcodec.decode_pdf(broken)


@pytest.mark.parametrize("k", [0, 1, 2, 4])
def test_g3_round_trip(k):
    """Group 3 (round 5): K=0 pure 1-D MH rows; K>0 EOL+tag-delimited
    mixed 1-D/2-D rows."""
    for img in [
        np.zeros((4, 30), dtype=np.uint8),
        np.ones((4, 30), dtype=np.uint8),
        (RNG.random((25, 61)) < 0.35).astype(np.uint8),
        np.eye(16, 16, dtype=np.uint8),
    ]:
        enc = cc.g3_encode(img, k=k)
        assert (cc.g3_decode(enc, img.shape[1], img.shape[0], k=k) == img).all()


def test_g3_k0_tolerates_leading_eol():
    """/EndOfLine producers prefix rows with EOLs; the K=0 decoder
    must accept a leading EOL (fill zeros + terminator) before data
    while plain (PDF-default) streams decode unchanged."""
    img = (RNG.random((6, 40)) < 0.4).astype(np.uint8)
    plain = cc.g3_encode(img, k=0)
    assert (cc.g3_decode(plain, 40, 6, k=0) == img).all()
    combined = cc._BitWriter()
    combined.write(cc._EOL)
    combined.write("".join(f"{b:08b}" for b in plain))
    # the padded tail bits belong to the final byte boundary; rows are
    # consumed by code structure, so the shifted stream decodes too
    assert (cc.g3_decode(combined.tobytes(), 40, 6, k=0) == img).all()


def test_g3_k_positive_missing_eol_is_typed_error():
    img = np.eye(5, 5, dtype=np.uint8)
    enc = cc.g3_encode(img, k=2)
    # strip the leading EOL: decoder must name the problem
    with pytest.raises(ValueError, match="EOL"):
        cc.g3_decode(b"\xff" + enc, 5, 5, k=2)


@pytest.mark.parametrize("k", [-1, 0, 2])
def test_ccitt_k_modes_pdf_round_trip(k):
    from pdf_ocr_spark.sources.glyphs import render_text_image

    pg = render_text_image("fax mode coverage page")
    data = pdfcodec.encode_pdf([pg], ccitt=True, ccitt_k=k)
    assert f"/K {k}".encode() in data
    got = pdfcodec.decode_pdf(data)
    assert (got[0] == pg).all()
