"""PDF stream-filter codecs: predictors (TIFF 2, PNG 10-15) and LZW.

The reference accepts predictor-Flate and LZW streams implicitly via
Poppler (/root/reference/app.py:447-454); these pin the from-scratch
implementations in pdf_ocr_spark/sources/pdffilters.py and their
wiring through the subset PDF parser.
"""

from __future__ import annotations

import numpy as np
import pytest

from pdf_ocr_spark.sources import pdfcodec, pdffilters

RNG = np.random.default_rng(3)
GRAY = RNG.integers(0, 256, (23, 31), dtype=np.uint8)
RGB = RNG.integers(0, 256, (16, 9, 3), dtype=np.uint8)


@pytest.mark.parametrize("pred", [1, 2, 10, 11, 12, 13, 14, 15])
@pytest.mark.parametrize("img,colors", [(GRAY, 1), (RGB, 3)])
def test_predictor_round_trip(pred, img, colors):
    raw = img.tobytes()
    enc = pdffilters.predictor_encode(raw, pred, columns=img.shape[1], colors=colors)
    dec = pdffilters.predictor_decode(enc, pred, columns=img.shape[1], colors=colors)
    assert dec == raw
    if pred >= 10:  # PNG family really adds one filter byte per row
        assert len(enc) == len(raw) + img.shape[0]


def test_predictor_12_actually_helps_compression():
    """The point of Up-filtering: smooth rasters compress far better —
    guards against an identity-function 'predictor'."""
    import zlib

    smooth = (np.add.outer(np.arange(64), np.arange(64)) % 256).astype(np.uint8)
    raw = smooth.tobytes()
    filtered = pdffilters.predictor_encode(raw, 12, columns=64)
    assert len(zlib.compress(filtered)) < len(zlib.compress(raw)) / 2


def test_predictor_error_contract():
    with pytest.raises(ValueError, match="whole rows"):
        pdffilters.predictor_decode(b"\x00" * 7, 2, columns=4)
    with pytest.raises(ValueError, match="filter type"):
        pdffilters.predictor_decode(b"\x09" + b"\x00" * 4, 12, columns=4)
    with pytest.raises(ValueError, match="Predictor 7"):
        pdffilters.predictor_decode(b"\x00" * 4, 7, columns=4)
    # trailing partial PNG row is dropped, not fatal (real files do this)
    two_rows = pdffilters.predictor_encode(b"\x01\x02\x03\x04", 12, columns=2)
    assert pdffilters.predictor_decode(two_rows + b"\x00", 12, columns=2) == b"\x01\x02\x03\x04"


def test_lzw_msb_packing_vector():
    """Hand-derived 9-bit MSB-first packing for b'AAAAAA': codes
    CLEAR(256), 65, 258, 259, EOD(257) -> 80 10 60 50 38 08."""
    assert pdffilters.lzw_encode(b"AAAAAA").hex() == "801060503808"
    assert pdffilters.lzw_decode(bytes.fromhex("801060503808")) == b"AAAAAA"


@pytest.mark.parametrize("early", [0, 1])
def test_lzw_round_trips(early):
    smooth = (np.add.outer(np.arange(23), np.arange(31)) % 256).astype(np.uint8)
    payloads = [
        b"",
        b"A" * 10000,
        smooth.tobytes() * 20,
        RNG.integers(0, 256, 50000, dtype=np.uint8).tobytes(),  # fills the table
        bytes(range(256)) * 64,
    ]
    for p in payloads:
        assert pdffilters.lzw_decode(pdffilters.lzw_encode(p, early), early) == p


def test_lzw_error_contract():
    with pytest.raises(ValueError, match="table code"):
        # 9-bit code 300 right after implicit start
        pdffilters.lzw_decode(bytes([0b10010110, 0]))
    with pytest.raises(ValueError, match="beyond table"):
        # CLEAR then literal 65 then code 300 (only 258 exists)
        bits = "100000000" + "001000001" + "100101100"
        bits += "0" * (-len(bits) % 8)  # right-pad: the stream is MSB-first
        data = int(bits, 2).to_bytes(len(bits) // 8, "big")
        pdffilters.lzw_decode(data)


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(compress=True, predictor=12),
        dict(compress=True, predictor=2),
        dict(compress=True, predictor=15),
        dict(lzw=True),
        dict(lzw=True, predictor=12),
        dict(compress=True, predictor=12, object_streams=True),
        dict(compress=True, predictor=12, encrypt=True),
    ],
)
def test_pdf_round_trip_with_filters(kwargs):
    data = pdfcodec.encode_pdf([GRAY, RGB], **kwargs)
    got = pdfcodec.decode_pdf(data)
    assert len(got) == 2
    assert (got[0] == GRAY).all() and (got[1] == RGB).all()


def test_unknown_filter_still_typed_error():
    # /Crypt stays outside the subset; a mislabeled stream must
    # produce a typed error NAMING the filter. (JBIG2Decode and
    # JPXDecode graduated out of this test when their codecs landed.)
    data = pdfcodec.encode_pdf([GRAY], compress=True)
    broken = data.replace(b"/Filter /FlateDecode", b"/Filter /CryptDecode")
    with pytest.raises(ValueError, match="CryptDecode"):
        pdfcodec.decode_pdf(broken)
    # zlib bytes parsed as JBIG2 segments / a JP2 container: still a
    # typed ValueError, never an IndexError escape
    for name in (b"/JBIG2Decode", b"/JPXDecode "):
        broken2 = data.replace(b"/Filter /FlateDecode", b"/Filter " + name.strip())
        with pytest.raises(ValueError):
            pdfcodec.decode_pdf(broken2)


def test_ascii_filters_round_trip_and_stdlib_cross_check():
    """ASCIIHex + ASCII85 (ISO 32000-1 §7.4.2/7.4.3) — ASCII85 is
    cross-validated against stdlib base64's Adobe-85 implementation in
    both directions."""
    import base64
    import os

    for p in (b"", b"x", b"hello world", b"\x00" * 9, os.urandom(777)):
        assert pdffilters.ascii85_decode(pdffilters.ascii85_encode(p)) == p
        assert pdffilters.asciihex_decode(pdffilters.asciihex_encode(p)) == p
        std = base64.a85encode(p, adobe=True)
        assert pdffilters.ascii85_decode(std[2:]) == p
        assert base64.a85decode(pdffilters.ascii85_encode(p)[:-2]) == p
    assert pdffilters.ascii85_decode(b"z~>") == b"\x00\x00\x00\x00"
    assert pdffilters.asciihex_decode(b"4 86\n56c>") == b"Hel"
    with pytest.raises(ValueError, match="invalid character"):
        pdffilters.ascii85_decode(b"vvvvv~>")
    with pytest.raises(ValueError, match="'z' inside"):
        pdffilters.ascii85_decode(b"!!z~>")
    with pytest.raises(ValueError, match="invalid character"):
        pdffilters.asciihex_decode(b"4x>")


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(compress=True, ascii85=True),
        dict(rle=True),
        dict(rle=True, ascii85=True),
        dict(compress=True, predictor=12, ascii85=True),
        dict(lzw=True, predictor=12, ascii85=True),
        dict(ccitt=True, ascii85=True),
        dict(compress=True, ascii85=True, object_streams=True),
        dict(compress=True, ascii85=True, encrypt=True),
    ],
)
def test_pdf_filter_chain_round_trip(kwargs):
    """Filter CHAINS ([/ASCII85Decode /X] with aligned /DecodeParms
    arrays) — the legacy-tool wrapping shape — decode end to end,
    including chains ending in the CCITT raster filter."""
    from pdf_ocr_spark.sources.glyphs import render_text_image

    pages = (
        [render_text_image("chain of filters")] if kwargs.get("ccitt") else [GRAY, RGB]
    )
    data = pdfcodec.encode_pdf(pages, **kwargs)
    got = pdfcodec.decode_pdf(data)
    assert len(got) == len(pages)
    assert all((a == b).all() for a, b in zip(got, pages))


def test_runlength_vectors_and_round_trips():
    """ISO 32000-1 §7.4.5: literal runs (L+1 bytes), repeat runs
    (257-L copies), 128 = EOD; truncation raises."""
    import os

    assert pdffilters.runlength_decode(b"\x02abc\x80") == b"abc"
    assert pdffilters.runlength_decode(b"\xfeZ\x80") == b"ZZZ"
    assert pdffilters.runlength_decode(b"\x00a\x81b\x80") == b"a" + b"b" * 128
    for p in (b"", b"x", b"aaaabbbbccdd", b"\x00" * 300, os.urandom(513), b"ab" * 200):
        assert pdffilters.runlength_decode(pdffilters.runlength_encode(p)) == p
    with pytest.raises(ValueError, match="literal run past end"):
        pdffilters.runlength_decode(b"\x05ab")
    with pytest.raises(ValueError, match="missing its byte"):
        pdffilters.runlength_decode(b"\xfe")
    with pytest.raises(ValueError, match="missing EOD"):
        pdffilters.runlength_decode(b"\x00a")


def test_runlength_helps_on_flat_rasters():
    """The encoder must actually RLE-compress runs (identity guard,
    mirroring the predictor-12 test): a flat raster shrinks ~63x
    (2-byte repeat runs capped at 128 copies)."""
    flat = b"\xff" * 4096
    enc = pdffilters.runlength_encode(flat)
    assert len(enc) < len(flat) // 50
