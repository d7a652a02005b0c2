"""Tests for the from-scratch baseline JPEG codec and its /DCTDecode
integration with the PDF subset codec."""

import numpy as np
import pytest

from pdf_ocr_spark.operators.imaging import ocr_decode
from pdf_ocr_spark.sources.glyphs import render_text_image
from pdf_ocr_spark.sources.jpegcodec import decode_jpeg, encode_jpeg
from pdf_ocr_spark.sources.pdfcodec import decode_pdf, encode_pdf, page_count


def test_gray_roundtrip_bounded_error():
    x = np.linspace(0, 255, 48)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, 90))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 8


def test_rgb_roundtrip_bounded_error():
    rng = np.random.RandomState(5)
    # piecewise-flat color regions (scan-like), dims not multiples of 8
    img = np.zeros((29, 43, 3), np.uint8)
    img[:] = (220, 210, 190)
    img[5:20, 7:30] = (40, 40, 60)
    out = decode_jpeg(encode_jpeg(img, 92))
    assert out.shape == img.shape
    # interior of flat regions must be close; edges may ring
    assert np.abs(out[10:15, 12:25].astype(int) - img[10:15, 12:25].astype(int)).max() <= 12
    del rng


def test_binarization_survives_jpeg():
    """The OCR contract: q>=85 JPEG noise never crosses the 128
    binarization threshold on glyph pages."""
    page = render_text_image("SPARK ENGINE BATCH 42")
    out = decode_jpeg(encode_jpeg(page, 88))
    assert ((out > 128) == (page > 128)).all()


def test_decoder_is_byte_stable_and_stuffing_safe():
    rng = np.random.RandomState(9)
    img = (rng.rand(24, 24) > 0.5).astype(np.uint8) * 255  # lots of 0xFF-ish bytes
    data = encode_jpeg(img, 95)
    assert encode_jpeg(img, 95) == data
    out = decode_jpeg(data)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 40  # harsh content, bounded


def test_typed_errors_name_the_feature():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    data = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    sof_at = bytes(data).find(b"\xff\xc0")
    data[sof_at + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg(bytes(data))


def test_dct_pdf_roundtrip_and_ocr():
    """Full chain: render -> JPEG -> /DCTDecode XObject -> parse ->
    decode -> OCR recovers the exact text (gray and RGB, classic and
    object-stream layouts)."""
    text = "HELLO WORLD OCR TEST PAGE 123"
    gray = render_text_image(text)
    rgb = np.stack([gray, gray, gray], axis=-1)
    for page in (gray, rgb):
        for objstm in (False, True):
            data = encode_pdf([page], dct=True, dct_quality=90, object_streams=objstm)
            assert b"/DCTDecode" in data
            assert page_count(data) == 1
            imgs = decode_pdf(data)
            assert imgs[0].shape == page.shape
            decoded_gray = (
                imgs[0]
                if imgs[0].ndim == 2
                else np.clip(
                    np.rint(
                        0.299 * imgs[0][..., 0]
                        + 0.587 * imgs[0][..., 1]
                        + 0.114 * imgs[0][..., 2]
                    ),
                    0,
                    255,
                ).astype(np.uint8)
            )
            got, conf = ocr_decode(decoded_gray)
            assert got == text
            assert conf == 1.0


def test_dct_dims_mismatch_is_typed_error():
    page = np.zeros((16, 16), np.uint8)
    data = bytearray(encode_pdf([page], dct=True))
    at = bytes(data).find(b"/Width 16")
    data[at : at + len(b"/Width 16")] = b"/Width 99"
    with pytest.raises(ValueError, match="declares"):
        decode_pdf(bytes(data))


def test_subsampled_chroma_roundtrip():
    """4:2:2 and 4:2:0 — the sampling real-world scanners emit — decode
    through the generalized MCU walk; luma stays sharp, chroma is
    box-mean downsampled so flat regions stay close."""
    img = np.zeros((37, 53, 3), np.uint8)
    img[:] = (180, 160, 140)
    img[8:25, 10:40] = (30, 80, 200)
    for ss in ("422", "420"):
        out = decode_jpeg(encode_jpeg(img, 90, subsampling=ss))
        assert out.shape == img.shape
        interior = np.abs(
            out[12:20, 15:35].astype(int) - img[12:20, 15:35].astype(int)
        ).max()
        assert interior <= 20, (ss, interior)


def test_sampling_factor_above_two_is_typed_error():
    data = bytearray(encode_jpeg(np.zeros((8, 8, 3), np.uint8), subsampling="420"))
    sof_at = bytes(data).find(b"\xff\xc0")
    # component 1's h/v byte sits at SOF payload offset 6+1
    data[sof_at + 4 + 6 + 1] = 0x33
    with pytest.raises(ValueError, match="sampling factor"):
        decode_jpeg(bytes(data))


def test_restart_markers_roundtrip():
    """DRI/RSTn (scanner error-resilience layout): decoding a
    restart-interval stream must equal the marker-free decode exactly —
    predictors reset and byte-alignment handled per segment."""
    x = np.linspace(0, 255, 64)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    plain = decode_jpeg(encode_jpeg(img, 90))
    for ri in (1, 2, 5):
        data = encode_jpeg(img, 90, restart_interval=ri)
        assert b"\xff\xdd" in data  # DRI present
        assert (decode_jpeg(data) == plain).all()
    rgb = np.dstack([img] * 3)
    base = decode_jpeg(encode_jpeg(rgb, 90, subsampling="420"))
    out = decode_jpeg(encode_jpeg(rgb, 90, subsampling="420", restart_interval=3))
    assert (out == base).all()


def test_truncated_and_fill_byte_streams():
    """Structural damage must always surface as ValueError (the PDF
    source catches exactly that), and legal 0xFF fill bytes before
    markers (ISO 10918-1 B.1.1.2) must parse."""
    img = np.zeros((8, 8), np.uint8)
    data = encode_jpeg(img, 90)
    # truncations at every early byte boundary: ValueError, never IndexError
    for cut in (3, 10, 21, len(data) // 2, len(data) - 3):
        with pytest.raises(ValueError):
            decode_jpeg(data[:cut])
    # fill bytes before a marker are legal padding
    at = data.find(b"\xff\xdb")
    padded = data[:at] + b"\xff\xff" + data[at:]
    assert (decode_jpeg(padded) == decode_jpeg(data)).all()


def test_interop_decodes_real_third_party_jpegs():
    """Decode JPEGs produced by real external encoders (files shipped
    with system packages — CPython's test suite, Rust docs). Skipped
    where absent. Plausibility: a photo decodes SMOOTH (mean horizontal
    gradient far below the ~85 of random noise a desynced Huffman
    stream would produce), and shapes/dtypes are sane."""
    import os

    candidates = [
        "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/test/test_email/data/python.jpg",
        "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/site-packages/IPython/core/tests/2x2.jpg",
        "/root/.rustup/toolchains/stable-x86_64-unknown-linux-gnu/share/doc/rust/html/embedded-book/assets/verify.jpeg",
    ]
    present = [p for p in candidates if os.path.exists(p)]
    if not present:
        pytest.skip("no third-party JPEGs on this system")
    for p in present:
        img = decode_jpeg(open(p, "rb").read())
        assert img.dtype == np.uint8 and img.size > 0
        if min(img.shape[:2]) >= 100:  # photo-sized: check smoothness
            grad = np.abs(np.diff(img.astype(int), axis=1)).mean()
            assert grad < 30, grad
