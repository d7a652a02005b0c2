"""JPEG 2000 (ITU-T T.800) subset codec: 5/3 DWT, RCT, tag trees,
EBCOT tier-1, tier-2 packets, codestream/JP2 container, and the PDF
/JPXDecode integration.

The reference accepts JPEG 2000 scanned PDFs implicitly through
Poppler (/root/reference/app.py:447-482); no third-party .jp2 files
ship in this container, so — like the CCITT/JBIG2 coders —
conformance is pinned by exhaustive lossless round-trips over
structured and adversarial images plus published-constant checks (the
shared MQ coder is vector-tested in test_jbig2.py)."""

import numpy as np
import pytest

from pdf_ocr_spark.sources import jpxcodec, pdfcodec
from pdf_ocr_spark.sources.glyphs import render_text_image
from pdf_ocr_spark.operators.imaging import ocr_decode

RNG = np.random.RandomState(7)


# ---------------------------------------------------------------------------
# DWT / RCT kernels
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "shape", [(1, 1), (1, 7), (7, 1), (2, 2), (8, 8), (37, 53), (64, 100)]
)
@pytest.mark.parametrize("levels", [0, 1, 3, 5])
def test_dwt53_round_trip(shape, levels):
    a = RNG.randint(-300, 300, shape).astype(np.int64)
    ll, bands = jpxcodec.dwt53_forward(a, levels)
    assert np.array_equal(jpxcodec.dwt53_inverse(ll, bands), a)


def test_dwt53_subband_dims_follow_ceil_floor_split():
    a = RNG.randint(0, 255, (37, 53))
    ll, ((hl, lh, hh),) = jpxcodec.dwt53_forward(a, 1)
    assert ll.shape == (19, 27) and hl.shape == (19, 26)
    assert lh.shape == (18, 27) and hh.shape == (18, 26)


def test_rct_round_trip_full_range():
    rgb = RNG.randint(0, 256, (16, 11, 3)).astype(np.int64)
    assert np.array_equal(jpxcodec.rct_inverse(*jpxcodec.rct_forward(rgb)), rgb)


# ---------------------------------------------------------------------------
# EBCOT tier-1
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("band", ["LL", "HL", "LH", "HH"])
def test_t1_block_round_trips(band):
    cases = [
        np.array([[1]]),
        np.array([[-1]]),
        RNG.randint(-5, 6, (7, 5)),
        RNG.randint(-300, 300, (16, 16)),
        (RNG.rand(33, 29) < 0.05).astype(np.int64) * RNG.randint(-1000, 1000, (33, 29)),
        RNG.randint(-(2 ** 14), 2 ** 14, (64, 64)),
        np.full((6, 11), -7),
    ]
    for c in cases:
        c = np.asarray(c, dtype=np.int64)
        data, npass, nbps = jpxcodec.t1_encode_block(c, band)
        out = jpxcodec.t1_decode_block(
            data, c.shape[1], c.shape[0], band, npass, nbps
        )
        assert np.array_equal(out, c)


def test_t1_zero_block_not_included():
    data, npass, nbps = jpxcodec.t1_encode_block(np.zeros((8, 8), np.int64), "HL")
    assert (data, npass, nbps) == (b"", 0, 0)


def test_t1_pass_count_matches_bitplanes():
    c = np.array([[5]])  # 3 bit planes -> 1 cleanup + 2x(SPP,MR,CUP)
    _, npass, nbps = jpxcodec.t1_encode_block(c, "LL")
    assert nbps == 3 and npass == 7


def test_t1_truncated_declared_passes_is_typed_error():
    c = RNG.randint(-100, 100, (8, 8))
    data, npass, nbps = jpxcodec.t1_encode_block(np.asarray(c, np.int64), "LL")
    with pytest.raises(ValueError, match="too many passes"):
        jpxcodec.t1_decode_block(data, 8, 8, "LL", npass + 30, nbps)


# ---------------------------------------------------------------------------
# full codestream round trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("jp2", [True, False])
def test_jpx_round_trip_gray_and_rgb(jp2):
    cases = [
        render_text_image("JPX LOSSLESS"),
        RNG.randint(0, 256, (37, 53)).astype(np.uint8),
        RNG.randint(0, 256, (21, 33, 3)).astype(np.uint8),
        np.full((65, 70), 200, np.uint8),
        np.array([[42]], np.uint8),
        RNG.randint(0, 256, (129, 70)).astype(np.uint8),  # multi-code-block
    ]
    for img in cases:
        data = jpxcodec.encode_jpx(img, jp2=jp2)
        out = jpxcodec.decode_jpx(data)
        assert out.shape == img.shape and np.array_equal(out, img)


def test_jpx_levels_zero_and_deep():
    img = RNG.randint(0, 256, (40, 40)).astype(np.uint8)
    for lv in (0, 1, 5):
        assert np.array_equal(
            jpxcodec.decode_jpx(jpxcodec.encode_jpx(img, levels=lv)), img
        )


def test_jpx_jp2_container_is_walked():
    img = RNG.randint(0, 256, (9, 9)).astype(np.uint8)
    data = jpxcodec.encode_jpx(img, jp2=True)
    assert data.startswith(b"\x00\x00\x00\x0cjP  \r\n\x87\n")
    assert b"jp2c" in data and b"ihdr" in data
    # bare codestream also accepted
    bare = jpxcodec.encode_jpx(img, jp2=False)
    assert bare[:2] == b"\xff\x4f"
    assert np.array_equal(jpxcodec.decode_jpx(bare), img)


def test_jpx_typed_errors():
    img = RNG.randint(0, 256, (9, 9)).astype(np.uint8)
    data = jpxcodec.encode_jpx(img, jp2=False)
    with pytest.raises(ValueError, match="no SOC"):
        jpxcodec.decode_jpx(b"garbage everywhere")
    # unsupported progression order
    cod_at = data.find(b"\xff\x52")
    bad = bytearray(data)
    bad[cod_at + 5] = 2  # RPCL
    with pytest.raises(ValueError, match="LRCP"):
        jpxcodec.decode_jpx(bytes(bad))
    # unsupported code-block style (bypass)
    bad = bytearray(data)
    bad[cod_at + 12] = 1
    with pytest.raises(ValueError, match="style"):
        jpxcodec.decode_jpx(bytes(bad))
    # irreversible transform claimed against a reversible (style-0)
    # QCD: mismatched semantics, typed error
    bad = bytearray(data)
    bad[cod_at + 13] = 0
    with pytest.raises(ValueError, match="style 2|quantized"):
        jpxcodec.decode_jpx(bytes(bad))
    # truncated tile body
    with pytest.raises(ValueError):
        jpxcodec.decode_jpx(data[: len(data) // 2])


# ---------------------------------------------------------------------------
# PDF /JPXDecode integration
# ---------------------------------------------------------------------------


def test_jpx_pdf_roundtrip_and_ocr():
    text = "JPX PDF SCAN 654"
    page = render_text_image(text)
    data = pdfcodec.encode_pdf([page], jpx=True)
    assert b"/JPXDecode" in data
    imgs = pdfcodec.decode_pdf(data)
    assert np.array_equal(imgs[0], page)
    got, conf = ocr_decode(imgs[0])
    assert got == text and conf == 1.0


def test_jpx_pdf_rgb_and_composed_features():
    page = render_text_image("JPX COMPOSED")
    rgb = np.stack([page, 255 - page, page // 2], axis=-1).astype(np.uint8)
    for kw in (
        dict(object_streams=True),
        dict(encrypt=True, cipher="aes"),
        dict(ascii85=True),
    ):
        data = pdfcodec.encode_pdf([page, rgb], jpx=True, **kw)
        imgs = pdfcodec.decode_pdf(data)
        assert np.array_equal(imgs[0], page) and np.array_equal(imgs[1], rgb), kw


def test_jpx_pdf_geometry_mismatch_is_typed_error():
    page = render_text_image("GEOM")
    data = pdfcodec.encode_pdf([page], jpx=True)
    h, w = page.shape
    bad = data.replace(
        b"/Width %d /Height %d" % (w, h), b"/Width %d /Height %d" % (w + 1, h)
    )
    with pytest.raises(ValueError, match="declares"):
        pdfcodec.decode_pdf(bad)


# ---------------------------------------------------------------------------
# Lossy 9/7 path (irreversible DWT + ICT + deadzone quantization)
# ---------------------------------------------------------------------------


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


@pytest.mark.parametrize(
    "shape", [(1, 1), (1, 9), (9, 1), (5, 5), (16, 16), (37, 53)]
)
@pytest.mark.parametrize("levels", [0, 1, 3])
def test_dwt97_float_round_trip(shape, levels):
    a = RNG.randint(0, 256, shape).astype(np.float64)
    ll, bands = jpxcodec.dwt97_forward(a, levels)
    assert np.allclose(jpxcodec.dwt97_inverse(ll, bands), a, atol=1e-8)


def test_ict_round_trip_within_coefficient_precision():
    rgb = RNG.randint(0, 256, (8, 9, 3)).astype(np.float64)
    back = jpxcodec.ict_inverse(*jpxcodec.ict_forward(rgb))
    # published 5-decimal G.3 coefficients are not exact inverses
    assert np.abs(back - rgb).max() < 0.02


def test_jpx_lossy_round_trips_within_psnr():
    x = np.linspace(0, 255, 64)
    smooth = np.clip(
        np.add.outer(x, x) / 2 + 10 * np.sin(x / 9), 0, 255
    ).astype(np.uint8)
    for jp2 in (False, True):
        back = jpxcodec.decode_jpx(
            jpxcodec.encode_jpx(smooth, irreversible=True, jp2=jp2)
        )
        assert _psnr(smooth, back) > 45
    rgb = np.stack([smooth, smooth.T, 255 - smooth], axis=-1)
    back = jpxcodec.decode_jpx(jpxcodec.encode_jpx(rgb, irreversible=True))
    assert _psnr(rgb, back) > 40
    noise = RNG.randint(0, 256, (40, 56)).astype(np.uint8)
    back = jpxcodec.decode_jpx(jpxcodec.encode_jpx(noise, irreversible=True))
    assert _psnr(noise, back) > 38
    # coarser quantization still decodes, with bounded error
    back = jpxcodec.decode_jpx(
        jpxcodec.encode_jpx(smooth, irreversible=True, base_delta=1.0)
    )
    assert np.abs(back.astype(int) - smooth.astype(int)).max() <= 4


def test_jpx_lossy_markers_and_mismatch_errors():
    img = RNG.randint(0, 256, (16, 16)).astype(np.uint8)
    code = jpxcodec.encode_jpx(img, irreversible=True, jp2=False)
    pos = 2
    saw = {}
    while pos + 4 <= len(code):
        m, l = code[pos : pos + 2], int.from_bytes(code[pos + 2 : pos + 4], "big")
        if m == b"\xff\x52":
            saw["transform"] = code[pos + 4 + 9]
        if m == b"\xff\x5c":
            saw["style"] = code[pos + 4] & 0x1F
        if m == b"\xff\x90":
            break
        pos += 2 + l
    assert saw == {"transform": 0, "style": 2}
    # flip the COD transform byte of a lossless stream: 9/7 claimed
    # against a style-0 QCD is a typed mismatch error
    lossless = jpxcodec.encode_jpx(img, jp2=False)
    i = lossless.find(b"\xff\x52")
    broken = bytearray(lossless)
    broken[i + 4 + 9] = 0
    with pytest.raises(ValueError, match="style 2|quantized QCD"):
        jpxcodec.decode_jpx(bytes(broken))
    # and the reverse: a 5/3 stream carrying a quantized QCD
    lossy = jpxcodec.encode_jpx(img, irreversible=True, jp2=False)
    j = lossy.find(b"\xff\x52")
    broken2 = bytearray(lossy)
    broken2[j + 4 + 9] = 1
    with pytest.raises(ValueError, match="style 0"):
        jpxcodec.decode_jpx(bytes(broken2))
    with pytest.raises(ValueError, match="base_delta"):
        jpxcodec.encode_jpx(img, irreversible=True, base_delta=0.0)


def test_jpx_lossy_bitonal_binarization_exact_and_pdf_e2e():
    """The corpus-rotation safety property (mirroring the DCT corpus
    argument): near-lossless 9/7 of a bitonal glyph render never
    crosses the OCR binarization threshold, so /JPXDecode lossy pages
    OCR to byte-identical text."""
    img = render_text_image("lossy jpx page words here etc")
    back = jpxcodec.decode_jpx(jpxcodec.encode_jpx(img, irreversible=True))
    assert ((img < 128) == (back < 128)).all()
    data = pdfcodec.encode_pdf([img], jpx=True, jpx_lossy=True, object_streams=True)
    pages = pdfcodec.decode_pdf(data)
    assert len(pages) == 1
    text, conf = ocr_decode(pages[0])
    assert text == "LOSSY JPX PAGE WORDS HERE ETC" and conf == 1.0
