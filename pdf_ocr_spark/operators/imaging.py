"""Numpy image kernels: enhancement + from-scratch glyph OCR decoding.

These run only inside Arrow-batched ``mapInPandas`` workers (never
per-row from Spark's perspective). The OCR decoder is a real, tiny
pipeline — grayscale, binarize, text-line segmentation by projection,
fixed-pitch cell segmentation, template matching with grid-origin
search — standing in for Tesseract (absent in this container) exactly
the way the reference's self-test stands in for real scans
(/root/reference/ocr_test.py:57-184). Deterministic by construction.
"""

from __future__ import annotations

import numpy as np

from pdf_ocr_spark.sources.glyphs import (
    CHAR_PITCH,
    FONT_5X7,
    GLYPH_H,
    GLYPH_W,
    glyph_array,
)

# --- M3: enhance_image (/root/reference/app.py:204-224) --------------------

#: PIL ImageFilter.SHARPEN: 3x3 kernel, scale 16, offset 0.
_SHARPEN_KERNEL = np.array([[-2, -2, -2], [-2, 32, -2], [-2, -2, -2]], dtype=np.int64)


def _sharpen_channel(ch: np.ndarray) -> np.ndarray:
    acc = np.zeros((ch.shape[0] - 2, ch.shape[1] - 2), dtype=np.int64)
    src = ch.astype(np.int64)
    for dy in range(3):
        for dx in range(3):
            acc += _SHARPEN_KERNEL[dy, dx] * src[dy : dy + acc.shape[0], dx : dx + acc.shape[1]]
    out = ch.copy()
    # PIL leaves the 1-px border unfiltered
    out[1:-1, 1:-1] = np.clip((acc + 8) // 16, 0, 255).astype(np.uint8)
    return out


def to_grayscale(img: np.ndarray) -> np.ndarray:
    """ITU-R 601 luma, integer arithmetic (PIL 'L' convention)."""
    if img.ndim == 2:
        return img
    r, g, b = img[..., 0].astype(np.int64), img[..., 1].astype(np.int64), img[..., 2].astype(np.int64)
    return ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8)


def enhance_image(img: np.ndarray) -> np.ndarray:
    """Sharpen -> contrast x1.5 -> grayscale, the reference's preprocess
    chain (sharpen filter, ImageEnhance.Contrast(1.5), convert('L')).
    On any internal error the original image is returned, matching
    /root/reference/app.py:222-224."""
    try:
        if img.ndim == 3:
            sharp = np.stack([_sharpen_channel(img[..., c]) for c in range(3)], axis=-1)
        else:
            sharp = _sharpen_channel(img)
        # ImageEnhance.Contrast: blend toward the solid-gray mean of the
        # L-converted image: out = mean + 1.5*(px - mean).
        mean = int(to_grayscale(sharp).mean() + 0.5)
        contrasted = np.clip(
            np.floor(mean + 1.5 * (sharp.astype(np.float64) - mean) + 0.5), 0, 255
        ).astype(np.uint8)
        return to_grayscale(contrasted)
    except Exception:
        return img


# --- OCR decode ------------------------------------------------------------

_CHARS = list(FONT_5X7)
_TEMPLATES = np.stack([glyph_array(c) for c in _CHARS])  # (n_glyphs, 7, 5)
_BLANK_SCORE = GLYPH_H * GLYPH_W


def _segment_lines(ink: np.ndarray, max_gap: int = 2) -> list[tuple[int, int]]:
    """Group ink rows into text-line bands; gaps <= max_gap stay within a
    line (glyphs like ':' have internal blank rows; the renderer leaves
    >= 3 blank rows between lines)."""
    rows = np.flatnonzero(ink.any(axis=1))
    if rows.size == 0:
        return []
    bands: list[tuple[int, int]] = []
    start = prev = int(rows[0])
    for r in rows[1:]:
        if r - prev > max_gap + 1:
            bands.append((start, prev))
            start = int(r)
        prev = int(r)
    bands.append((start, prev))
    return bands


def _decode_line(ink: np.ndarray, band: tuple[int, int]) -> tuple[str, float]:
    """Decode one text-line band: estimate the glyph-grid origin (the
    band's first ink row/col only bounds it, since glyphs like '.' don't
    touch their cell's top-left), then classify each fixed-pitch cell by
    max pixel agreement against the font templates."""
    top, bottom = band
    cols = np.flatnonzero(ink[top : bottom + 1].any(axis=0))
    if cols.size == 0:
        return "", 0.0
    c0, c_last = int(cols[0]), int(cols[-1])

    h, w = ink.shape

    def decode_at(oy: int, ox: int) -> tuple[str, float, int]:
        n_cells = max(1, -(-(c_last + 1 - ox) // CHAR_PITCH))
        chars: list[str] = []
        total = 0
        for k in range(n_cells):
            x = ox + k * CHAR_PITCH
            cell = np.zeros((GLYPH_H, GLYPH_W), dtype=bool)
            ys, xs = max(0, oy), max(0, x)
            ye, xe = min(h, oy + GLYPH_H), min(w, x + GLYPH_W)
            if ys < ye and xs < xe:
                cell[ys - oy : ye - oy, xs - x : xe - x] = ink[ys:ye, xs:xe]
            if not cell.any():
                chars.append(" ")
                total += _BLANK_SCORE
                continue
            scores = (_TEMPLATES == cell).sum(axis=(1, 2))
            best = int(scores.argmax())
            chars.append(_CHARS[best])
            total += int(scores[best])
        return "".join(chars).rstrip(), total, n_cells

    # Fast path: assume the band's top-left ink pixel is the grid origin
    # (true whenever the line contains any full-height, left-anchored
    # glyph). Accept on a perfect score; otherwise search nearby origins.
    text, score, n = decode_at(top, c0)
    if score == n * _BLANK_SCORE:
        return text, 1.0
    best = (score / (n * _BLANK_SCORE), text)
    for oy in range(top - (GLYPH_H - 1), top + 1):
        for ox in range(c0 - (GLYPH_W - 1), c0 + 1):
            t, s, k = decode_at(oy, ox)
            conf = s / (k * _BLANK_SCORE)
            if conf > best[0]:
                best = (conf, t)
    return best[1], best[0]


def ocr_decode(img: np.ndarray, threshold: int = 128) -> tuple[str, float]:
    """Decode a rendered page image to (text, mean_confidence).

    Mirrors the reference's M4 shape: primary pass, and if the result is
    empty a retry with an alternative segmentation setting (the
    reference retries tesseract with ``--psm 6``,
    /root/reference/app.py:259-263) — here a data-driven threshold.
    """
    gray = to_grayscale(img)
    ink = gray < threshold
    if not ink.any():
        # retry: adapt threshold to the image's own intensity spread
        ink = gray < gray.mean()
        if not ink.any():
            return "", 0.0
    lines = []
    confs = []
    for band in _segment_lines(ink):
        text, conf = _decode_line(ink, band)
        lines.append(text)
        confs.append(conf)
    return "\n".join(lines), float(np.mean(confs)) if confs else 0.0
