"""Deterministic synthetic corpus generator for the interleaved
documents table (FIXTURES.md F1).

Generation is distributed (``spark.range`` -> ``mapInPandas``) and
keyed: every value derives from ``random.Random(f"{seed}:{key}")``, so
any row can be regenerated independently on any executor — no driver
loops, no order dependence, identical output at any parallelism. The
same keyed derivation gives the *expected* OCR text of every page image
(:func:`expected_page_text`), which is the span-equality oracle.

Span-count skew follows the FIXTURES profile: 80% of docs have 1-3
spans, 15% have 4-20, 5% have 50-200 — exercising the salting path.
"""

from __future__ import annotations

import random
from collections.abc import Iterator

import pandas as pd

from pdf_ocr_spark.schema import DOCUMENTS_SCHEMA, MEDIA_SCHEMA
from pdf_ocr_spark.sources.glyphs import render_text_image
from pdf_ocr_spark.sources.pngcodec import encode_png

#: Uppercase-safe vocabulary for page images (must stay inside the
#: renderer charset so OCR decode is lossless).
IMG_WORDS = (
    "TESSERACT OCR TEST PAGE SCAN IMAGE SPARK ENGINE BATCH ARROW SPAN "
    "DOC TEXT LINE WORD GLYPH PIXEL TABLE QUERY SHUFFLE JOIN MERGE SORT"
).split()

#: Text-span vocabulary, deliberately seeded with the artifact patterns
#: the fix_common_ocr_errors chain rewrites (l1, rn, cl, vv, space-punct,
#: digits 0/1/5) plus control chars and newline runs (FIXTURES.md F1).
TEXT_TOKENS = [
    "quick", "l1ne", "learn", "circle", "savvy", "modern", "uncle",
    "word", "batch", "page5", "vol1", "r0w", "data", "engine ,",
    "end .", "why ?", "stop !", "note :", "mid ;", "plain",
]


def media_ref_for(doc_id: str, offset: int) -> str:
    return f"mem://{doc_id}/page_{offset}.png"


def parse_media_ref(ref: str) -> tuple[str, int]:
    doc_id = ref.split("//", 1)[1].split("/", 1)[0]
    offset = int(ref.rsplit("page_", 1)[1].removesuffix(".png"))
    return doc_id, offset


def doc_id_for(i: int) -> str:
    return f"doc_{i:08d}"


def expected_page_text(doc_id: str, offset: int, seed: int = 42) -> str:
    """The exact text rendered into (and OCR-recoverable from) the page
    image at (doc_id, offset)."""
    rng = random.Random(f"{seed}:{doc_id}:{offset}:img")
    lines = []
    for _ in range(1 if rng.random() < 0.7 else 2):
        toks = [rng.choice(IMG_WORDS) for _ in range(rng.randint(2, 5))]
        if rng.random() < 0.3:
            toks.append(str(rng.randint(0, 999)))
        line = " ".join(toks)
        if rng.random() < 0.3:
            line += rng.choice([".", "!", "?", ":", ";", ","])
        lines.append(line)
    return "\n".join(lines)


def _page_jitter(doc_id: str, offset: int, seed: int) -> tuple[int, int]:
    rng = random.Random(f"{seed}:{doc_id}:{offset}:jit")
    return rng.randint(0, 4), rng.randint(0, 6)


def _media_fate(doc_id: str, offset: int, seed: int) -> float:
    return random.Random(f"{seed}:{doc_id}:{offset}:fate").random()


def _text_span(rng: random.Random) -> str:
    parts = [rng.choice(TEXT_TOKENS) for _ in range(rng.randint(3, 10))]
    sep = rng.choice([" ", " ", " ", "\n", "\n\n", "\n\n\n"])
    text = sep.join(parts)
    if rng.random() < 0.1:
        text = text[: len(text) // 2] + "\x00\x07" + text[len(text) // 2 :]
    return text


def _span_count(rng: random.Random) -> int:
    r = rng.random()
    if r < 0.80:
        return rng.randint(1, 3)
    if r < 0.95:
        return rng.randint(4, 20)
    return rng.randint(50, 200)


def generate_documents(spark, n_docs: int, seed: int = 42, image_rate: float = 0.5):
    """Distributed deterministic documents table."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, spans_col = [], []
            for i in pdf["id"]:
                doc_id = doc_id_for(int(i))
                rng = random.Random(f"{seed}:{doc_id}")
                spans = []
                for off in range(_span_count(rng)):
                    if rng.random() < image_rate:
                        spans.append(
                            {
                                "kind": "image",
                                "text": "",
                                "media_ref": media_ref_for(doc_id, off),
                                "offset": off,
                            }
                        )
                    else:
                        spans.append(
                            {
                                "kind": "text",
                                "text": _text_span(rng),
                                "media_ref": "",
                                "offset": off,
                            }
                        )
                doc_ids.append(doc_id)
                spans_col.append(spans)
            yield pd.DataFrame({"doc_id": doc_ids, "spans": spans_col})

    return spark.range(n_docs).mapInPandas(gen, schema=DOCUMENTS_SCHEMA)


def materialize_corpus(
    spark,
    out_dir: str,
    n_docs: int,
    seed: int = 42,
    missing_rate: float = 0.02,
    corrupt_rate: float = 0.02,
    partitions: int = 64,
) -> tuple[str, str]:
    """Generate and write the documents + media tables to parquet
    (the stand-in for the Iceberg input tables). Skips work if already
    materialized. Returns (documents_path, media_path)."""
    import os

    docs_path = os.path.join(out_dir, "documents")
    media_path = os.path.join(out_dir, "media")
    marker = os.path.join(out_dir, f"_READY_{n_docs}_{seed}")
    if not os.path.exists(marker):
        docs = generate_documents(spark, n_docs=n_docs, seed=seed).repartition(partitions)
        docs.write.mode("overwrite").parquet(docs_path)
        media = generate_media(
            spark,
            spark.read.parquet(docs_path),
            seed=seed,
            missing_rate=missing_rate,
            corrupt_rate=corrupt_rate,
        )
        media.write.mode("overwrite").parquet(media_path)
        open(marker, "w").close()
    return docs_path, media_path


#: Shear slopes the generator may apply (all on the decoder's candidate
#: grid, so skewed pages still decode exactly).
SHEAR_SLOPES = (-0.15, -0.1, -0.05, 0.05, 0.1, 0.15, 0.2, -0.2)


def generate_media(
    spark,
    documents,
    seed: int = 42,
    missing_rate: float = 0.0,
    corrupt_rate: float = 0.0,
    shear_rate: float = 0.0,
):
    """Media side-table (media_ref -> PNG payload) for a documents table.

    Payloads derive from the media_ref alone, so this needs no state
    from the documents generator. ``missing_rate`` drops refs (the
    kernel must emit file-not-found error rows, mirroring
    /root/reference/app.py:332-334); ``corrupt_rate`` yields non-PNG
    bytes (decode-error rows).
    """
    from pyspark.sql import functions as F

    refs = (
        documents.select(F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "image")
        .select(F.col("s.media_ref").alias("media_ref"))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_refs, payloads = [], []
            for ref in pdf["media_ref"]:
                doc_id, offset = parse_media_ref(ref)
                fate = _media_fate(doc_id, offset, seed)
                if fate < missing_rate:
                    continue
                if fate < missing_rate + corrupt_rate:
                    payload = b"\x89PNG but not really"
                else:
                    img = render_text_image(
                        expected_page_text(doc_id, offset, seed),
                        jitter=_page_jitter(doc_id, offset, seed),
                    )
                    shear_fate = random.Random(f"{seed}:{doc_id}:{offset}:shear")
                    if shear_fate.random() < shear_rate:
                        from pdf_ocr_spark.operators.imaging import shear_image

                        img = shear_image(img, shear_fate.choice(SHEAR_SLOPES))
                    payload = encode_png(img)
                out_refs.append(ref)
                payloads.append(payload)
            yield pd.DataFrame({"media_ref": out_refs, "payload": payloads})

    return refs.mapInPandas(gen, schema=MEDIA_SCHEMA)


MEDIA_EXPECTATION_SCHEMA = (
    "media_ref string, format string, width int, height int, n_bytes long, "
    "valid string, mean_intensity double, ink_ratio double"
)


def media_expectation_manifest(
    documents,
    seed: int = 42,
    missing_rate: float = 0.0,
    corrupt_rate: float = 0.0,
):
    """Expected media_metadata / image_features rows, computed straight
    from the generator's deterministic geometry (render -> stats), NOT
    by parsing payloads — the independent side of the DuckDB oracle for
    the media queries. Must mirror :func:`generate_media`'s fate logic
    exactly (same seed => same corrupt/missing set)."""
    from pyspark.sql import functions as F

    refs = (
        documents.select(F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "image")
        .select(F.col("s.media_ref").alias("media_ref"))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                k: []
                for k in (
                    "media_ref", "format", "width", "height", "n_bytes",
                    "valid", "mean_intensity", "ink_ratio",
                )
            }
            for ref in pdf["media_ref"]:
                doc_id, offset = parse_media_ref(ref)
                fate = _media_fate(doc_id, offset, seed)
                if fate < missing_rate:
                    continue
                rows["media_ref"].append(ref)
                if fate < missing_rate + corrupt_rate:
                    # generate_media's corrupt payload is a fixed 19-byte
                    # non-PNG; png_dimensions raises "not a PNG"
                    rows["format"].append("unknown")
                    rows["width"].append(None)
                    rows["height"].append(None)
                    rows["n_bytes"].append(len(b"\x89PNG but not really"))
                    rows["valid"].append("error: not a PNG")
                    rows["mean_intensity"].append(None)
                    rows["ink_ratio"].append(None)
                else:
                    img = render_text_image(
                        expected_page_text(doc_id, offset, seed),
                        jitter=_page_jitter(doc_id, offset, seed),
                    )
                    h, w = img.shape
                    rows["format"].append("png")
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["n_bytes"].append(len(encode_png(img)))
                    rows["valid"].append("ok")
                    rows["mean_intensity"].append(float(img.mean()))
                    rows["ink_ratio"].append(float((img < 128).mean()))
            out = pd.DataFrame(rows)
            out["width"] = pd.array(out["width"], dtype="Int32")
            out["height"] = pd.array(out["height"], dtype="Int32")
            yield out

    return refs.mapInPandas(gen, schema=MEDIA_EXPECTATION_SCHEMA)


def expected_word_boxes(doc_id: str, offset: int, seed: int = 42):
    """Analytic word bounding boxes for the page at (doc_id, offset) —
    computed from the renderer constants and the glyph ink masks alone
    (no rendering, no segmentation), mirroring the layout kernel's
    reporting rules exactly:

    * a line band's top is the first ink row = the line's cell row
      (every letter/digit glyph has row-0 ink);
    * the grid origin is the band's first ink column, i.e. the minimum
      over glyphs of (cell_x + glyph's first ink column);
    * word x-extent is [origin + pos*CHAR_PITCH,
      origin + (pos+len)*CHAR_PITCH - 1], y-extent [top, top+GLYPH_H].

    Returns a list of (line_idx, word_idx, word, x0, y0, x1, y1).
    """
    import numpy as np

    from pdf_ocr_spark.sources.glyphs import (
        CHAR_PITCH,
        GLYPH_H,
        LINE_PITCH,
        MARGIN,
        glyph_array,
    )

    text = expected_page_text(doc_id, offset, seed).upper()
    dy, dx = _page_jitter(doc_id, offset, seed)
    out = []
    for li, line in enumerate(text.split("\n")):
        first_cols = []
        for ci, ch in enumerate(line):
            g = glyph_array(ch)
            if g.any():
                first_cols.append(ci * CHAR_PITCH + int(np.argmax(g.any(axis=0))))
        if not first_cols:
            continue
        top = MARGIN + dy + li * LINE_PITCH
        c0 = MARGIN + dx + min(first_cols)
        pos, wi = 0, 0
        for raw in line.split(" "):
            if raw:
                x0 = c0 + pos * CHAR_PITCH
                x1 = c0 + (pos + len(raw)) * CHAR_PITCH - 1
                out.append((li, wi, raw, x0, top, x1, top + GLYPH_H))
                wi += 1
            pos += len(raw) + 1
    return out


def layout_expectation_manifest(documents, seed: int = 42):
    """Expected word-box rows for every clean page of a documents table
    (the DuckDB oracle manifest for `word_boxes`). Must be used with
    media generated at missing_rate=0, corrupt_rate=0, shear_rate=0."""
    from pyspark.sql import functions as F

    refs = (
        documents.select(F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "image")
        .select(F.col("s.media_ref").alias("media_ref"))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_ref", "line_idx", "word_idx", "word", "x0", "y0", "x1", "y1")}
            for ref in pdf["media_ref"]:
                doc_id, offset = parse_media_ref(ref)
                for li, wi, w, x0, y0, x1, y1 in expected_word_boxes(doc_id, offset, seed):
                    rows["media_ref"].append(ref)
                    rows["line_idx"].append(li)
                    rows["word_idx"].append(wi)
                    rows["word"].append(w)
                    rows["x0"].append(x0)
                    rows["y0"].append(y0)
                    rows["x1"].append(x1)
                    rows["y1"].append(y1)
            yield pd.DataFrame(rows)

    return refs.mapInPandas(
        gen,
        schema="media_ref string, line_idx int, word_idx int, word string, "
        "x0 int, y0 int, x1 int, y1 int",
    )


def expected_hocr_page(doc_id: str, offset: int, media_ref: str, seed: int = 42) -> dict:
    """Analytic hOCR expectation for a CLEAN page (no corrupt/shear):
    line/word geometry from the renderer constants + glyph ink masks
    (the :func:`expected_word_boxes` rules, extended with the line-band
    right edge = last glyph ink column + 1), confidence 1.0 (a clean
    render template-matches perfectly), serialized through the SAME
    pure formatter the kernel uses (`operators.hocr.hocr_page`) — so a
    string compare value-checks segmentation, decode, geometry, AND the
    markup in one shot. No rendering, no segmentation in this path."""
    import numpy as np

    from pdf_ocr_spark.operators.hocr import hocr_page
    from pdf_ocr_spark.sources.glyphs import (
        CHAR_PITCH,
        GLYPH_H,
        LINE_PITCH,
        MARGIN,
        glyph_array,
    )

    text = expected_page_text(doc_id, offset, seed).upper()
    dy, dx = _page_jitter(doc_id, offset, seed)
    raw_lines = text.split("\n")
    n_cols = max((len(ln) for ln in raw_lines), default=0)
    height = 2 * MARGIN + len(raw_lines) * LINE_PITCH + dy
    width = 2 * MARGIN + max(n_cols, 1) * CHAR_PITCH + dx
    lines = []
    for li, line in enumerate(raw_lines):
        first_cols, last_cols = [], []
        for ci, ch in enumerate(line):
            g = glyph_array(ch)
            if g.any():
                colmask = g.any(axis=0)
                first_cols.append(ci * CHAR_PITCH + int(np.argmax(colmask)))
                last_cols.append(
                    ci * CHAR_PITCH + len(colmask) - 1 - int(np.argmax(colmask[::-1]))
                )
        if not first_cols:
            continue
        top = MARGIN + dy + li * LINE_PITCH
        c0 = MARGIN + dx + min(first_cols)
        words = []
        pos = 0
        for raw in line.split(" "):
            if raw:
                x0 = c0 + pos * CHAR_PITCH
                x1 = c0 + (pos + len(raw)) * CHAR_PITCH - 1
                words.append({"text": raw, "bbox": (x0, top, x1, top + GLYPH_H)})
            pos += len(raw) + 1
        lines.append(
            {
                "text": line,
                "bbox": (c0, top, MARGIN + dx + max(last_cols) + 1, top + GLYPH_H),
                "words": words,
                "confidence": 1.0,
            }
        )
    return {
        "doc_id": doc_id,
        "offset": offset,
        "media_ref": media_ref,
        "text": "\n".join(l["text"] for l in lines),
        "hocr": hocr_page(lines, offset, width, height, media_ref),
        "confidence": 1.0,
        "error": False,
    }


def hocr_expectation_manifest(documents, seed: int = 42):
    """Expected (doc_id, offset, media_ref, text, hocr, confidence,
    error) rows for every clean page — the DuckDB oracle manifest for
    `hocr_pages`. Must be used with media generated at missing_rate=0,
    corrupt_rate=0, shear_rate=0 (the deskew/corrupt paths are
    pytest-verified instead: no analytic markup exists for them)."""
    from pyspark.sql import functions as F

    refs = (
        documents.select(F.col("doc_id"), F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "image")
        .select("doc_id", F.col("s.offset").alias("offset"), F.col("s.media_ref").alias("media_ref"))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, offset, ref in zip(pdf["doc_id"], pdf["offset"], pdf["media_ref"]):
                rows.append(expected_hocr_page(str(doc_id), int(offset), str(ref), seed))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "offset", "media_ref", "text", "hocr", "confidence", "error"],
            )

    return refs.mapInPandas(
        gen,
        schema="doc_id string, offset int, media_ref string, text string, "
        "hocr string, confidence double, error boolean",
    )
