"""Sample-depth (/BitsPerComponent 1/2/4/16) and /Decode-array tests.

The reference decodes whatever Poppler hands it, which includes the
high-bit-depth scanner exports and inverted-sample (/Decode [1 0])
fax/PostScript shapes (reference: /root/reference/app.py:447-454 via
pdf2image/Poppler). Here those are from-scratch paths in
pdfcodec._pack_samples/_unpack_samples/_apply_decode_array; the corpus
writer rotates 16/4/1-bit and inverted rasters so the driver's exact
oracle certifies them end to end (pdfsource.DEPTH_RESIDUES).
"""

import numpy as np
import pytest

from pdf_ocr_spark.sources import pdfcodec
from pdf_ocr_spark.sources.pdfcodec import (
    _pack_samples,
    _unpack_samples,
)

RNG = np.random.RandomState(42)
BITONAL = (RNG.randint(0, 2, (19, 31)) * 255).astype(np.uint8)
GRAY8 = RNG.randint(0, 256, (19, 31)).astype(np.uint8)
RGB8 = RNG.randint(0, 256, (11, 7, 3)).astype(np.uint8)


# ---------------------------------------------------------------------------
# pack/unpack kernel
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("bpc", [1, 2, 4, 8, 16])
def test_pack_unpack_round_trip_gray(bpc):
    img = BITONAL if bpc < 8 else GRAY8
    raw = _pack_samples(img, bpc)
    out = _unpack_samples(raw, img.shape[1], img.shape[0], 1, bpc)
    assert (out == img).all()


def test_pack_16_is_big_endian_widened():
    img = np.array([[1, 255]], dtype=np.uint8)
    raw = _pack_samples(img, 16)
    # v * 257 big-endian: 1 -> 0x0101, 255 -> 0xFFFF
    assert raw == bytes([0x01, 0x01, 0xFF, 0xFF])


def test_pack_subbyte_rows_are_byte_padded():
    # 3 one-bit samples per row -> 1 byte per row, MSB-first
    img = np.array([[255, 0, 255], [0, 255, 0]], dtype=np.uint8)
    raw = _pack_samples(img, 1)
    assert raw == bytes([0b10100000, 0b01000000])
    out = _unpack_samples(raw, 3, 2, 1, 1)
    assert (out == img).all()


def test_pack_subbyte_rejects_unquantized():
    with pytest.raises(ValueError, match="multiples of 17"):
        _pack_samples(GRAY8, 4)


def test_unpack_rejects_wrong_length():
    with pytest.raises(ValueError, match="expected"):
        _unpack_samples(b"\x00" * 10, 31, 19, 1, 16)


def test_quantized_gray_round_trips_at_2_and_4_bits():
    img4 = (RNG.randint(0, 16, (9, 13)) * 17).astype(np.uint8)
    img2 = (RNG.randint(0, 4, (9, 13)) * 85).astype(np.uint8)
    for bpc, img in [(4, img4), (2, img2)]:
        out = _unpack_samples(
            _pack_samples(img, bpc), img.shape[1], img.shape[0], 1, bpc
        )
        assert (out == img).all()


# ---------------------------------------------------------------------------
# end-to-end PDF round trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("bpc", [1, 2, 4, 16])
@pytest.mark.parametrize("invert", [False, True])
def test_pdf_round_trip_depth(bpc, invert):
    img = BITONAL if bpc < 8 else GRAY8
    data = pdfcodec.encode_pdf([img], sample_bpc=bpc, decode_invert=invert)
    out = pdfcodec.decode_pdf(data)[0]
    assert (out == img).all()
    assert (b"/BitsPerComponent %d" % bpc) in data
    assert (b"/Decode [1 0]" in data) == invert


@pytest.mark.parametrize(
    "kwargs",
    [
        {"compress": True},
        {"compress": True, "predictor": 12},
        {"compress": True, "predictor": 15},
        {"lzw": True},
        {"lzw": True, "predictor": 12},
        {"compress": True, "ascii85": True},
        {"compress": True, "object_streams": True},
        {"compress": True, "encrypt": True},
    ],
)
def test_pdf_round_trip_16bit_through_filters(kwargs):
    data = pdfcodec.encode_pdf([GRAY8], sample_bpc=16, **kwargs)
    assert (pdfcodec.decode_pdf(data)[0] == GRAY8).all()


def test_pdf_round_trip_16bit_rgb_inverted_flate_predictor():
    data = pdfcodec.encode_pdf(
        [RGB8], sample_bpc=16, decode_invert=True, compress=True, predictor=12
    )
    assert b"/Decode [1 0 1 0 1 0]" in data
    assert (pdfcodec.decode_pdf(data)[0] == RGB8).all()


def test_pdf_round_trip_1bit_flate_predictor():
    # sub-byte + predictor: PNG family predicts on whole padded bytes
    data = pdfcodec.encode_pdf(
        [BITONAL], sample_bpc=1, compress=True, predictor=12
    )
    assert (pdfcodec.decode_pdf(data)[0] == BITONAL).all()


def test_depth_rejected_on_raster_filter_paths():
    for kw in (
        {"dct": True},
        {"ccitt": True},
        {"jbig2": True},
        {"rle": True},
    ):
        with pytest.raises(ValueError, match="raw/Flate/LZW"):
            pdfcodec.encode_pdf([BITONAL], sample_bpc=16, **kw)
        with pytest.raises(ValueError, match="raw/Flate/LZW"):
            pdfcodec.encode_pdf([BITONAL], decode_invert=True, **kw)


def test_bad_bpc_rejected():
    with pytest.raises(ValueError, match="sample_bpc"):
        pdfcodec.encode_pdf([GRAY8], sample_bpc=12)


# ---------------------------------------------------------------------------
# /Decode array parsing edge cases
# ---------------------------------------------------------------------------


def test_decode_array_fractional_range_is_typed_error():
    data = pdfcodec.encode_pdf([GRAY8], decode_invert=True)
    broken = data.replace(b"/Decode [1 0]", b"/Decode [0 0.5]")
    with pytest.raises(ValueError, match="/Decode"):
        pdfcodec.decode_pdf(broken)


def test_decode_array_wrong_arity_is_typed_error():
    data = pdfcodec.encode_pdf([GRAY8], decode_invert=True)
    broken = data.replace(b"/Decode [1 0]", b"/Decode [1 0 1 0]")
    with pytest.raises(ValueError, match="entries"):
        pdfcodec.decode_pdf(broken)


def test_decode_identity_array_is_noop():
    data = pdfcodec.encode_pdf([GRAY8], decode_invert=True)
    # flip the declaration without flipping the stored samples: the
    # decoder must now return the inverted raster
    flipped = data.replace(b"/Decode [1 0]", b"/Decode [0 1]")
    assert (pdfcodec.decode_pdf(flipped)[0] == 255 - GRAY8).all()


def test_decode_array_on_ccitt_inverts():
    data = pdfcodec.encode_pdf([BITONAL], ccitt=True)
    assert b"/Decode [" not in data
    marker = b"/BitsPerComponent 1 "
    assert marker in data
    inv = data.replace(marker, marker + b"/Decode [1 0] ")
    assert (pdfcodec.decode_pdf(inv)[0] == 255 - BITONAL).all()


def test_decode_array_on_jbig2_inverts():
    data = pdfcodec.encode_pdf([BITONAL], jbig2=True)
    marker = b"/BitsPerComponent 1 "
    assert marker in data
    inv = data.replace(marker, marker + b"/Decode [1 0] ")
    assert (pdfcodec.decode_pdf(inv)[0] == 255 - BITONAL).all()
