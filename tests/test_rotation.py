"""Tests for true-rotation support (3-shear decomposition, Paeth 1986):
exact-inverse geometry, rotation estimation, and OCR recovery through
estimated derotation within the documented envelope."""

import numpy as np
import pytest

from pdf_ocr_spark.operators.imaging import (
    derotate_image,
    estimate_rotation,
    ocr_decode,
    rotate_image,
)
from pdf_ocr_spark.sources.glyphs import render_text_image

TEXT = (
    "THE QUICK BROWN FOX JUMPS OVER LAZY DOG\n"
    "PACK MY BOX WITH FIVE DOZEN JUGS\n"
    "SPARK ENGINE BATCH ARROW SPAN TEXT"
)


def test_known_angle_roundtrip_is_exact_at_any_angle():
    """Center-anchored integer shears cancel bit-for-bit when the angle
    is known: rotate(theta) then rotate(-theta) preserves every glyph
    pixel (the grow-per-shear formulation measured 3-38% ink overlap)."""
    page = render_text_image(TEXT)
    for theta in (-0.2, -0.12, -0.05, 0.03, 0.1, 0.2):
        back = rotate_image(rotate_image(page, theta), -theta)
        got, conf = ocr_decode(back)
        assert got == TEXT and conf == 1.0, theta


def test_rotation_actually_rotates():
    stroke = np.full((60, 60), 255, np.uint8)
    stroke[:, 30] = 0  # vertical line
    r = rotate_image(stroke, 0.1)
    ys, xs = np.nonzero(r < 128)
    slope = np.polyfit(ys, xs, 1)[0]
    assert slope == pytest.approx(-np.tan(0.1), abs=0.02)


def test_estimate_rotation_accuracy():
    page = render_text_image(TEXT)
    for theta in (-0.12, -0.06, 0.0, 0.06, 0.12):
        rot = rotate_image(page, theta) if theta else page
        est = estimate_rotation(rot < 128)
        assert abs(est - theta) < 0.005, (theta, est)


def test_estimated_derotation_recovers_text_in_envelope():
    """Full OCR recovery through ESTIMATED derotation for rotations up
    to ~3.4 degrees (the documented envelope at 1-px stroke width;
    typical scan skew is below this)."""
    page = render_text_image(TEXT)
    for theta in (-0.06, -0.02, 0.0, 0.02, 0.06):
        rot = rotate_image(page, theta) if theta else page
        got, _ = ocr_decode(derotate_image(rot))
        assert got == TEXT, theta


def test_large_angle_recovers_most_glyphs():
    """Beyond the envelope the ±1-px shear residue costs some glyphs
    but the page must still be substantially readable."""
    page = render_text_image(TEXT)
    want = set(TEXT.replace("\n", " ").split())
    for theta in (-0.12, 0.12):
        got, _ = ocr_decode(derotate_image(rotate_image(page, theta)))
        got_words = set(got.replace("\n", " ").split())
        overlap = len(want & got_words) / len(want)
        assert overlap >= 0.5, (theta, overlap, got)


def test_pipeline_derotate_config(spark):
    """Opt-in rotated-scan support end to end: pages rotated by ~2.3
    degrees decode exactly with ExtractionConfig(derotate=True) and
    fail without it."""
    from pyspark.sql import Row

    from pdf_ocr_spark.config import ExtractionConfig
    from pdf_ocr_spark.operators.ocr import ocr_pages
    from pdf_ocr_spark.sources.pngcodec import encode_png

    texts = {0: "ROTATED PAGE ONE", 1: "SECOND ROTATED PAGE"}
    rows = [
        Row(
            doc_id="d",
            offset=i,
            media_ref=f"mem://d/{i}",
            payload=bytearray(
                encode_png(rotate_image(render_text_image(t), 0.04 if i else -0.04))
            ),
        )
        for i, t in texts.items()
    ]
    df = spark.createDataFrame(rows)
    plain = {r.offset: r for r in ocr_pages(df).collect()}
    fixed = {
        r.offset: r
        for r in ocr_pages(df, ExtractionConfig(derotate=True)).collect()
    }
    for i, t in texts.items():
        assert fixed[i].text == t and fixed[i].error is False
        assert plain[i].text != t  # rotation genuinely breaks the default path
