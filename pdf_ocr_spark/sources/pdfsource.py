"""Real-PDF ingestion: ``binaryFile`` source -> page explode -> OCR.

This is the engine's counterpart of the reference's upload path:
``convert_from_path`` rasterizes each PDF into page images which the
OCR worker consumes (/root/reference/app.py:447-482). Here the PDFs are
read distributed via ``spark.read.format("binaryFile")``, parsed by the
from-scratch subset parser (:mod:`pdf_ocr_spark.sources.pdfcodec`), and
each page is re-encoded as a PNG payload so the existing Arrow-batched
OCR kernel (:mod:`pdf_ocr_spark.operators.ocr`) runs unchanged.

Scale shape: binaryFile gives one row per file (whole-file bytes — the
right granularity for scanned PDFs, which are page-image containers a
few MB each); page explode happens inside ``mapInPandas`` so a
1000-executor cluster fans pages out without any driver involvement.
Malformed PDFs become error rows, never exceptions (the reference's
error-as-row discipline, app.py:335-337).

The fixture writer (:func:`write_pdf_corpus`) is likewise distributed —
executors render and write their partition's PDFs — and deterministic:
page k of a document holds words [20k, 20k+20) of its text rendered in
the 5x7 font, so expected page text (and therefore page counts and
reassembled text) is derivable in pure SQL for the DuckDB oracle.
"""

from __future__ import annotations

import os
import re
import weakref
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

#: Words rendered per PDF page by the fixture writer. Shared constant
#: with the SQL oracles in entrypoints (n_pages = ceil(n_words / this)).
WORDS_PER_PAGE = 20

_DOC_RE = re.compile(r"doc_([^/]+)\.pdf$")

#: "session" -> (weakref to SparkContext, dedicated binaryFile scan
#: session) — see :func:`_binary_scan`; at most one live entry.
_SCAN_SESSIONS: dict = {}

#: Fixture-corpus heterogeneity residues (see write_pdf_corpus):
#: doc id % ENCRYPT_RESIDUES == 1 -> RC4-encrypted file;
#: doc id % PROGRESSIVE_RESIDUES == 1 -> progressive JPEG scans (DCT
#: corpus only).
ENCRYPT_RESIDUES = 5
PROGRESSIVE_RESIDUES = 3
#: doc id % PREDICTOR_RESIDUES == 2 -> PNG predictor 12 (Up) on the
#: Flate raster; doc id % LZW_RESIDUES == 3 -> /LZWDecode raster
#: (both non-DCT corpus only — DCT rasters are JPEG streams).
PREDICTOR_RESIDUES = 4
LZW_RESIDUES = 7
#: doc id % CCITT_RESIDUES == 4 -> Group 4 fax raster (/CCITTFaxDecode
#: /K -1, 1-bit) — the dominant wild scanned-PDF shape (non-DCT only).
CCITT_RESIDUES = 9
#: doc id % ASCII85_RESIDUES == 5 -> the raster stream additionally
#: wrapped in /ASCII85Decode (a FILTER CHAIN, e.g.
#: [/ASCII85Decode /FlateDecode] — the legacy-tool wrapping shape).
ASCII85_RESIDUES = 13
#: doc id % RLE_RESIDUES == 6 -> /RunLengthDecode raster (the
#: PostScript-converter / fax-export byte-RLE shape; non-DCT only).
RLE_RESIDUES = 11
#: doc id % CMYK_RESIDUES == 2 -> /DeviceCMYK XObject over a
#: 4-component Adobe JPEG (DCT corpus only — the print-workflow scan
#: shape), APP14 transform rotating 0 (CMYK) / 2 (YCCK) by (id//7)%2.
CMYK_RESIDUES = 7
#: doc id % JBIG2_RESIDUES == 7 -> /JBIG2Decode raster (the
#: "optimized"/compressed bitonal shape Acrobat and scanner stacks
#: emit), coding mode rotating by (id//17)%5 over arithmetic+TPGDON,
#: plain arithmetic, MMR=1, symbol-coded (dictionary + text region),
#: and symbol-coded with the dictionary in a shared /JBIG2Globals
#: stream (non-DCT only; CCITT wins on overlap).
JBIG2_RESIDUES = 17
#: doc id % DEPTH_RESIDUES == 8 -> non-8-bit /BitsPerComponent raster
#: (raw/Flate path only; ccitt/jbig2/rle win on overlap), depth
#: rotating by (id//19)%3 over 16 / 4 / 1 bits, and every other one
#: ((id//57)%2) additionally stored inverted behind /Decode [1 0].
DEPTH_RESIDUES = 19
#: doc id % INLINE_RESIDUES == 9 -> the page raster is a §8.9.7
#: INLINE image (BI..ID..EI in the content stream, no XObject — the
#: fax-converter / print-driver shape), data form rotating by
#: (id//23)%3 over /Fl-coded data in a plain content stream, raw
#: samples inside a Flate-coded content stream, and /RL-coded data.
#: Takes precedence over every other non-DCT raster rotation
#: (encryption still applies — the content stream is encrypted).
INLINE_RESIDUES = 23
#: doc id % INDEXED_RESIDUES == 10 -> /Indexed palette raster
#: (§8.6.6.3 — the "optimized"/quantized shape PDF shrinkers emit):
#: samples become palette indices at the minimal 1/2/4/8-bit depth
#: over a hex-string lookup. Raw/Flate path only; yields to the
#: ccitt/jbig2/rle/inline/depth rotations, wins over predictor/LZW.
INDEXED_RESIDUES = 29
#: doc id % ICC_RESIDUES == 12 -> the device colorspace is wrapped as
#: [/ICCBased N 0 R] over a minimal profile stream (§8.6.5.5 — the
#: born-digital producer default). Same precedence as /Indexed
#: (which wins when both residues hit).
ICC_RESIDUES = 31
#: doc id % UPDATE_RESIDUES == 13 -> the file carries an §7.5.6
#: INCREMENTAL UPDATE (the save-in-Acrobat shape): an appended
#: re-save replaces the page-0 raster with a level-9 Flate re-encode
#: of the same pixels and bumps /Info /Producer to "pdf-ocr-spark
#: 1.1" — last definition wins. Skipped for encrypted (id % 5 == 1:
#: the update bodies would need the file key) and inline (id % 23 ==
#: 9: no raster XObject to replace) docs.
UPDATE_RESIDUES = 37
#: doc id % ATTACH_RESIDUES == 14 -> the file carries §7.7.4 EMBEDDED
#: FILES (the invoice-XML / portfolio shape): an /EmbeddedFiles name
#: tree in the catalog with two Flate-coded attachments whose names
#: and contents derive purely from (doc_id, text) so the
#: pdf_attachments oracle recomputes the exact rows in SQL. Composes
#: with every raster rotation (it only touches the catalog) and with
#: encryption (streams encrypt; under RC4 the /Filespec strings are
#: per-object ciphertext and the name-tree strings live in the ObjStm,
#: §7.6.2).
ATTACH_RESIDUES = 41
#: doc id % ROTATE_RESIDUES == 15 -> every page carries a §7.7.3.3
#: /Rotate entry (the sideways-fed scanner shape), angle rotating by
#: (id//43)%3 over 90/180/270. Content-transparent: the writer stores
#: rasters pre-rotated counter-clockwise and the reader honours
#: /Rotate clockwise, so extracted text is unchanged. Composes with
#: every raster codec and with inline-image pages (non-DCT only).
#: Every other rotated doc ((id//129)%2==1) places the single /Rotate
#: on the PAGES-TREE node instead (§7.7.3.4 inheritance).
ROTATE_RESIDUES = 43
#: doc id % FORM_RESIDUES == 16 -> the file carries a §12.7.2
#: /AcroForm with three filled text fields (title / pages / lang)
#: derived purely from (doc_id, text), so the pdf_form_fields oracle
#: recomputes the exact rows in SQL. Field widgets join page 0's
#: /Annots next to any link annotations; under RC4 the field strings
#: are per-object ciphertext (non-DCT corpus only).
FORM_RESIDUES = 47
#: doc id % OUTLINE_RESIDUES == 17 -> the file carries a §12.3.3
#: document outline (bookmark tree): page i gets a level-1
#: "Chapter i" on even i and a nested level-2 "Section i" on odd i —
#: structure and titles derive purely from (doc_id, n_pages) so the
#: pdf_outline oracle recomputes the exact rows in SQL. Under RC4
#: the /Title strings are per-object ciphertext (non-DCT only).
#: Every other un-encrypted outline doc ((id//53)%2==1) uses the
#: pdfTeX NAMED shape instead — indirect title strings, /A GoTo
#: actions, and a /Kids-subdivided /Names /Dests tree — so the
#: driver-green row certifies both resolution paths.
OUTLINE_RESIDUES = 53

PDF_PAGES_SCHEMA = (
    "doc_id string, offset int, media_ref string, payload binary, parse_error string"
)


def page_texts(text: str, words_per_page: int = WORDS_PER_PAGE) -> list[str]:
    """Deterministic page chunking: whitespace words, ``words_per_page``
    per page, at least one (possibly empty) page."""
    words = text.split()
    if not words:
        return [""]
    return [
        " ".join(words[i : i + words_per_page])
        for i in range(0, len(words), words_per_page)
    ]


def write_pdf_corpus(
    docs: DataFrame,
    out_dir: str,
    words_per_page: int = WORDS_PER_PAGE,
    compress: bool = True,
    object_streams: bool = True,
    dct: bool = False,
    jpx: bool = False,
) -> DataFrame:
    """Render one scanned-style PDF per (doc_id, text) row into
    ``out_dir`` (executor-side writes, driver never sees a page) and
    return the manifest (doc_id, path, n_pages). Triggering an action
    on the manifest performs the writes. ``compress`` (default on)
    Flate-encodes the raster streams and ``object_streams`` (default
    on) packs the document structure into a PDF 1.5 /ObjStm behind a
    cross-reference stream — together the layout every modern
    real-world producer emits — so the e2e extraction queries exercise
    the inflate + object-stream paths, not just the raw fixture
    shape. ``dct=True`` instead stores each raster as a baseline JPEG
    (``/Filter /DCTDecode``) — the real-world color-scan layout,
    decoded by the from-scratch codec in jpegcodec.py.

    Round 4 — corpus heterogeneity, so the driver's exact-oracle gate
    (not just pytest) certifies the new decode paths: every doc whose
    numeric id satisfies ``id % ENCRYPT_RESIDUES`` is RC4-encrypted
    (standard security handler, empty user password), and in the DCT
    corpus every ``id % PROGRESSIVE_RESIDUES`` doc stores progressive
    (SOF2) JPEG scans. Both transforms are content-transparent, so the
    SQL oracles are unchanged — a hash match proves the decrypt and
    progressive-decode paths return byte-identical text.

    Round 5 adds two more content-transparent variants to the non-DCT
    corpus: ``id % PREDICTOR_RESIDUES == 2`` rasters are Up-filtered
    (/DecodeParms /Predictor 12 — the layout most real Flate image
    producers emit) and ``id % LZW_RESIDUES == 3`` rasters are
    /LZWDecode streams (the legacy-producer shape); ids hitting both
    residues get LZW + predictor together. Of the encrypted files,
    every 25th (``(id // 5) % 25 == 2``) uses the AES-256 V5/R6
    /AESV3 handler instead of RC4 — the post-2017 producer shape.
    ``id % CCITT_RESIDUES == 4`` docs store CCITT fax rasters with the
    mode rotating by ``(id // 9) % 3`` over /K -1 (Group 4 MMR — the
    dominant wild shape), /K 0 (Group 3 1-D MH), and /K 2 (Group 3
    mixed) — 1-bit, exact because glyph renders are bitonal.
    ``id % RLE_RESIDUES == 6`` rasters are /RunLengthDecode streams
    (the PostScript-converter byte-RLE shape; CCITT wins on ids
    hitting both residues). ``id % JBIG2_RESIDUES == 7`` rasters are
    /JBIG2Decode streams (the compressed-bitonal shape Acrobat's
    optimizer emits), organization rotating by ``(id//17)%5`` over
    generic-region arithmetic+TPGDON / plain arithmetic / MMR /
    symbol-coded (dictionary + text region) / symbol-coded with the
    dictionary in a shared /JBIG2Globals stream; CCITT wins on
    overlapping ids. In the DCT corpus ``id % CMYK_RESIDUES ==
    2`` pages are /DeviceCMYK XObjects over 4-component Adobe JPEGs
    (the print-workflow shape), APP14 transform rotating CMYK/YCCK by
    ``(id // 7) % 2``; CMYK wins over progressive on overlapping
    ids (Adobe CMYK progressive is not a real producer shape).
    ``id % DEPTH_RESIDUES == 8`` raw/Flate rasters are stored at a
    non-8-bit /BitsPerComponent — 16-bit big-endian widened, 4-bit
    and 1-bit packed, rotating by ``(id // 19) % 3`` — and every
    other depth doc (``(id // 57) % 2``) is additionally stored
    inverted behind ``/Decode [1 0]`` (the negative-sample export
    shape); all depth variants are content-transparent because the
    bitonal renders are exact at every depth.
    ``id % INLINE_RESIDUES == 9`` non-DCT docs store the raster as a
    §8.9.7 INLINE image (BI..ID..EI inside the content stream, no
    raster XObject — the fax-converter / print-driver shape), data
    form rotating by ``(id // 23) % 3`` over /Fl-coded data in a
    plain content stream, raw samples inside a Flate-coded content
    stream, and /RL-coded data; inline wins over every other non-DCT
    raster rotation, and the encryption rotation still applies (the
    content stream is what gets encrypted).
    ``id % INDEXED_RESIDUES == 10`` plain-raster docs quantize
    through an §8.6.6.3 /Indexed palette (indices at the minimal
    1/2/4/8-bit depth, hex-string lookup) and ``id % ICC_RESIDUES ==
    12`` wrap the device space as ``[/ICCBased N 0 R]`` over a
    minimal profile stream (§8.6.5.5); both apply only where no
    codec/depth rotation hit, Indexed wins when both residues hit,
    and both are content-transparent (the palette lookup
    reconstructs the exact raster)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np  # noqa: F401  (renderer dependency, worker-side)

        from pdf_ocr_spark.sources.glyphs import render_text_image
        from pdf_ocr_spark.sources.pdfcodec import encode_pdf

        os.makedirs(out_dir, exist_ok=True)
        for pdf in batches:
            paths, n_pages = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                pages = page_texts(text or "", words_per_page)
                images = [render_text_image(p) for p in pages]
                try:
                    d = int(doc_id)
                except ValueError:
                    d = 0
                if jpx:
                    # pure /JPXDecode corpus (no other rotations):
                    # the JPEG 2000 decode surface gets its own
                    # focused driver-certified query. Half the docs
                    # ((id//4)%2) use the LOSSY 9/7 path — the wild
                    # scanner shape; like the DCT corpus, exactness
                    # holds because the near-lossless delta never
                    # crosses the OCR binarization threshold (pinned
                    # in tests/test_jpx.py)
                    path = os.path.join(out_dir, f"doc_{doc_id}.pdf")
                    tmp = path + ".tmp"
                    with open(tmp, "wb") as f:
                        f.write(
                            encode_pdf(
                                images,
                                object_streams=object_streams,
                                jpx=True,
                                jpx_lossy=(d // 4) % 2 == 1,
                            )
                        )
                    os.replace(tmp, path)
                    paths.append(path)
                    n_pages.append(len(images))
                    continue
                meta, xmp_t = None, None
                if not dct:
                    # §14.3 document metadata, derived purely from the
                    # doc id so the pdf_metadata oracle can recompute
                    # it in SQL (dct corpus skipped: cache stability)
                    meta = {
                        "Title": f"Document {doc_id}",
                        "Author": "Author %d" % (d % 7),
                        "Producer": "pdf-ocr-spark 1.0",
                        "CreationDate": "D:2026%02d%02d000000Z"
                        % (d % 12 + 1, d % 28 + 1),
                    }
                    if d % 3 == 0:
                        xmp_t = f"Document {doc_id}"
                links = None
                if not dct:
                    # §12.5.6.5 link annotations, all residue-derived
                    # from (id, i) so the pdf_links oracle recomputes
                    # the exact row set in SQL:
                    #   - (id+i)%2==0: outbound /URI action
                    #   - (id+i)%3==0: intra-doc edge to page (i+1)%n —
                    #     /A GoTo when (id+i) is even, the /Dest-key
                    #     shape otherwise (§12.5.6.5 allows either;
                    #     both resolve to the same row)
                    #   - (id+i)%6==5: /GoToR remote edge to page
                    #     (id+i)%4 of doc_((id*3+i)%1000).pdf
                    # Named-outline docs additionally get a /GoTo on
                    # page 0 whose /D NAMES the outline's last dest
                    # (sec.(n-1) -> page n-1), folding link resolution
                    # through the /Names /Dests tree pdf_outline built.
                    n_imgs = len(images)
                    links = []
                    for i in range(n_imgs):
                        items: list = []
                        if (d + i) % 2 == 0:
                            items.append(f"https://example.org/doc/{doc_id}/p{i}")
                        if (d + i) % 3 == 0:
                            t = (i + 1) % n_imgs
                            items.append(
                                ("goto", t) if (d + i) % 2 == 0 else ("dest", t)
                            )
                        if (d + i) % 6 == 5:
                            items.append(
                                (
                                    "gotor",
                                    f"doc_{(d * 3 + i) % 1000}.pdf",
                                    (d + i) % 4,
                                )
                            )
                        links.append(items)
                rot, rot_inherit = 0, False
                if not dct and d % ROTATE_RESIDUES == 15:
                    rot = (90, 180, 270)[(d // ROTATE_RESIDUES) % 3]
                    rot_inherit = (d // (ROTATE_RESIDUES * 3)) % 2 == 1
                toc, toc_shape = None, "direct"
                if not dct and d % OUTLINE_RESIDUES == 17:
                    if (d // OUTLINE_RESIDUES) % 2 == 1 and d % ENCRYPT_RESIDUES != 1:
                        toc_shape = "named"  # the pdfTeX shape
                    # §12.3.3 bookmarks: Chapter on even pages, a
                    # nested Section on odd pages — SQL-derivable
                    toc = [
                        (
                            1 if i % 2 == 0 else 2,
                            (f"Chapter {i}" if i % 2 == 0 else f"Section {i}"),
                            i,
                        )
                        for i in range(len(images))
                    ]
                if links is not None and toc is not None and toc_shape == "named":
                    # named-dest link edge (see links comment above):
                    # resolves through the same /Names /Dests tree the
                    # named outline registers (sec.i -> page i)
                    links[0] = links[0] + [
                        ("goto_named", f"sec.{len(images) - 1}")
                    ]
                fields = None
                if not dct and d % FORM_RESIDUES == 16:
                    # §12.7.2 filled text fields, SQL-derivable
                    fields = [
                        ("title", f"Document {doc_id}"),
                        ("pages", str(len(images))),
                        ("lang", ("en", "fr", "de")[d % 3]),
                    ]
                atts = None
                if not dct and d % ATTACH_RESIDUES == 14:
                    # §7.7.4 embedded files, SQL-derivable: an
                    # invoice-style XML carrying the word count and a
                    # notes file carrying the first five words
                    words = (text or "").split()
                    atts = [
                        (
                            f"invoice_{doc_id}.xml",
                            (
                                f'<invoice doc="{doc_id}"><words>'
                                f"{len(words)}</words></invoice>"
                            ).encode(),
                        ),
                        (f"notes_{doc_id}.txt", " ".join(words[:5]).encode()),
                    ]
                if not dct and d % INLINE_RESIDUES == 9:
                    # §8.9.7 inline-image page (BI..ID..EI, no raster
                    # XObject) — wins over every other non-DCT raster
                    # rotation; encryption rotation still applies
                    path = os.path.join(out_dir, f"doc_{doc_id}.pdf")
                    tmp = path + ".tmp"
                    with open(tmp, "wb") as f:
                        f.write(
                            encode_pdf(
                                images,
                                object_streams=object_streams,
                                inline=("flate", "raw", "rle")[
                                    (d // INLINE_RESIDUES) % 3
                                ],
                                info=meta,
                                xmp_title=xmp_t,
                                page_links=links,
                                attachments=atts,
                                form_fields=fields,
                                outlines=toc,
                                outline_shape=toc_shape,
                                rotate=rot,
                                rotate_inherit=rot_inherit,
                                encrypt=d % ENCRYPT_RESIDUES == 1,
                                cipher=(
                                    "aes256"
                                    if (d // ENCRYPT_RESIDUES) % 25 == 2
                                    else "rc4"
                                ),
                            )
                        )
                    os.replace(tmp, path)
                    paths.append(path)
                    n_pages.append(len(images))
                    continue
                depth = (
                    not dct
                    and d % DEPTH_RESIDUES == 8
                    and d % CCITT_RESIDUES != 4
                    and d % JBIG2_RESIDUES != 7
                    and d % RLE_RESIDUES != 6
                )
                plain_raster = (
                    not dct
                    and not depth
                    and d % CCITT_RESIDUES != 4
                    and d % JBIG2_RESIDUES != 7
                    and d % RLE_RESIDUES != 6
                )
                indexed = plain_raster and d % INDEXED_RESIDUES == 10
                icc = (
                    plain_raster and not indexed and d % ICC_RESIDUES == 12
                )
                path = os.path.join(out_dir, f"doc_{doc_id}.pdf")
                tmp = path + ".tmp"
                blob = encode_pdf(
                            images,
                            compress=compress,
                            object_streams=object_streams,
                            dct=dct,
                            dct_progressive=dct
                            and d % PROGRESSIVE_RESIDUES == 1
                            and d % CMYK_RESIDUES != 2,
                            dct_cmyk=dct and d % CMYK_RESIDUES == 2,
                            dct_cmyk_transform=((d // CMYK_RESIDUES) % 2) * 2,
                            encrypt=d % ENCRYPT_RESIDUES == 1,
                            # 1 in 25 of the encrypted files use the
                            # ISO 32000-2 AES-256/R6 handler. The R6
                            # KDF is DESIGNED expensive (hardened
                            # SHA-2/AES iteration, ~0.9 s/file open in
                            # pure python, memoized per worker) — so
                            # it gets a small but driver-certified
                            # share (4 files at sf0.001, 40 at sf0.1)
                            # and RC4 carries the bulk encrypted load
                            cipher=(
                                "aes256"
                                if (d // ENCRYPT_RESIDUES) % 25 == 2
                                else "rc4"
                            ),
                            predictor=(
                                12
                                if not dct
                                and d % PREDICTOR_RESIDUES == 2
                                and not (indexed or icc)
                                else 1
                            ),
                            lzw=not dct
                            and d % LZW_RESIDUES == 3
                            and not (indexed or icc),
                            indexed=indexed,
                            icc=icc,
                            info=meta,
                            xmp_title=xmp_t,
                            page_links=links,
                            attachments=atts,
                            form_fields=fields,
                            outlines=toc,
                            outline_shape=toc_shape,
                            rotate=rot,
                            rotate_inherit=rot_inherit,
                            rle=not dct and d % RLE_RESIDUES == 6,
                            ccitt=not dct and d % CCITT_RESIDUES == 4,
                            # rotate the fax mode: G4, G3 1-D, G3 mixed
                            ccitt_k=(-1, 0, 2)[(d // CCITT_RESIDUES) % 3],
                            jbig2=not dct
                            and d % JBIG2_RESIDUES == 7
                            and d % CCITT_RESIDUES != 4,
                            jbig2_mode=("tpgd", "arith", "mmr", "text", "textg")[
                                (d // JBIG2_RESIDUES) % 5
                            ],
                            ascii85=d % ASCII85_RESIDUES == 5,
                            # depth rotation: 16-bit widened, 4-bit
                            # and 1-bit packed (bitonal renders are
                            # exact at every depth); every other depth
                            # doc stored inverted behind /Decode [1 0]
                            sample_bpc=(
                                (16, 4, 1)[(d // DEPTH_RESIDUES) % 3]
                                if depth
                                else 8
                            ),
                            decode_invert=depth
                            and (d // (DEPTH_RESIDUES * 3)) % 2 == 1,
                )
                if not dct and d % UPDATE_RESIDUES == 13 and d % ENCRYPT_RESIDUES != 1:
                    # §7.5.6 incremental update (the save-in-Acrobat
                    # shape): a re-save replacing the page-0 raster
                    # with a level-9 Flate re-encode of the SAME
                    # pixels plus a bumped-/Producer /Info — readers
                    # must honour the latest definitions (certified
                    # by pdf_metadata's oracle CASE on this residue)
                    import re as _re

                    from pdf_ocr_spark.sources.pdfcodec import (
                        _serialize_info_dict,
                        flate_image_xobject,
                        incremental_update,
                    )

                    new_info = dict(meta, Producer="pdf-ocr-spark 1.1")
                    info_num = int(
                        _re.findall(rb"/Info\s+(\d+)\s+0\s+R", blob)[-1]
                    )
                    blob = incremental_update(
                        blob,
                        {
                            5: flate_image_xobject(images[0]),
                            info_num: _serialize_info_dict(new_info),
                        },
                    )
                with open(tmp, "wb") as f:
                    f.write(blob)
                os.replace(tmp, path)  # atomic: readers never see partials
                paths.append(path)
                n_pages.append(len(images))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "path": paths, "n_pages": n_pages}
            )

    return docs.select("doc_id", "text").mapInPandas(
        kernel, schema="doc_id string, path string, n_pages int"
    )


def _binary_scan(spark: SparkSession, pattern: str, light: bool = False) -> DataFrame:
    """binaryFile scan with driver-side file listing. Above 32 files
    Spark launches a parallel-listing job with one task per file —
    measured seconds of pure scheduling for hundreds of tiny local
    fixtures. Local/posix listings are cheap on the driver, so raise
    the threshold for this read; on a real cluster against S3/HDFS at
    10^12-file scale, leave the default so listing parallelizes.

    The override is scoped to an ephemeral ``newSession()`` (same
    SparkContext, isolated SQL conf), so concurrent queries or
    streaming jobs on the caller's session can never observe it —
    mutating the caller's session-global conf around the eager
    ``load()`` was a documented race.

    One scan session is cached per SparkContext (not created per call):
    a long-lived driver issuing many scans would otherwise accumulate
    JVM-side session state (listeners, conf, catalog) per scan.

    Wave packing: binaryFile bins whole files into splits of
    ``maxPartitionBytes`` (default 128 MB) counting ``openCostInBytes``
    (4 MB) per file, so a small fused-fixture corpus lands just above
    one task wave — e.g. 1.25 waves = a measured ~25% straggler tail
    on the CPU-bound extraction kernel. When the planned scan yields
    fewer than 4x-parallelism partitions, re-plan it with a
    proportionally smaller maxPartitionBytes (quantized to a power of
    two; one cached session per value, so the bounded-session
    guarantee holds). Corpora that already fill >= 4 waves — the
    100 TB case, where split count scales with data — are untouched,
    keeping the metadata-family scan floor free of extra task-
    scheduling overhead; binaryFile never splits within a file, so a
    lowered budget can only split multi-file bins."""
    ctx = spark.sparkContext
    df = scan_session(spark).read.format("binaryFile").load(pattern)
    par = max(1, ctx.defaultParallelism)
    if light:
        # Light (metadata-tier) kernels cost about a millisecond per
        # file or less (measured: 0.4–1.75 ms across the harvests
        # using this path), so the fixed per-task cost of a python
        # stage (~10 ms: worker handshake + Arrow setup) dominates when
        # openCostInBytes (4 MB/file) — not real bytes — inflates the
        # partition count of a tiny-file corpus. Detect that regime by
        # REAL corpus bytes (one ContentSummary call): when the whole
        # corpus fits inside one wave of default-size splits, coalesce
        # (narrow, no shuffle) to one task per core. A corpus whose
        # bytes genuinely need many splits — the 100 TB case — is
        # untouched, keeping the scan's balance properties.
        try:
            jvm = spark._jvm
            jpath = jvm.org.apache.hadoop.fs.Path(os.path.dirname(pattern))
            fs = jpath.getFileSystem(ctx._jsc.hadoopConfiguration())
            total_bytes = fs.getContentSummary(jpath).getLength()
        except Exception:
            total_bytes = None
        if (
            total_bytes is not None
            and total_bytes <= par * 134217728
            and df.rdd.getNumPartitions() > par
        ):
            df = df.coalesce(par)
        return df
    target = 4 * par
    p0 = df.rdd.getNumPartitions()
    if 1 < p0 < target:
        mpb = max(1, (134217728 * p0) // target)
        mpb = 1 << max(20, mpb.bit_length() - 1)  # quantize, floor 1 MB
        if mpb < 134217728:
            df = (
                scan_session(spark, "session-mpb%d" % mpb, mpb)
                .read.format("binaryFile")
                .load(pattern)
            )
    return df


def scan_session(
    spark: SparkSession, key: str = "session", mpb: int | None = None
) -> SparkSession:
    """The cached listing-threshold-raised scan session (see
    :func:`_binary_scan` — one per SparkContext and maxPartitionBytes
    value, isolated SQL conf so callers never observe the override).
    Shared with the streaming file source: ``getBatch`` builds each
    micro-batch's relation through the same InMemoryFileIndex path, so
    a >32-file trigger otherwise launches a one-task-per-file listing
    JOB every trigger (measured ~2 s of pure scheduling per trigger on
    a 1250-file local batch)."""
    ctx = spark.sparkContext
    entry = _SCAN_SESSIONS.get(key)
    if entry is not None:
        ctx_ref, cached = entry
        # weakref key: a GC'd SparkContext can never alias a new
        # one (id() reuse after GC was the previous hazard)
        if ctx_ref() is ctx:
            return cached
    s = spark.newSession()
    s.conf.set(
        "spark.sql.sources.parallelPartitionDiscovery.threshold", "100000"
    )
    if mpb is not None:
        s.conf.set("spark.sql.files.maxPartitionBytes", str(mpb))
    _SCAN_SESSIONS[key] = (weakref.ref(ctx), s)
    return s


def read_pdf_pages(
    spark: SparkSession, pdf_dir: str, password: str = ""
) -> DataFrame:
    """``binaryFile`` scan -> one row per page: (doc_id, offset,
    media_ref, payload=PNG bytes, parse_error). A file the subset
    parser rejects yields a single row with ``parse_error`` set and a
    null payload (which the OCR kernel already turns into an error
    row). ``password`` (ExtractionConfig.pdf_password) opens
    password-protected files — tried as user then owner."""
    bf = _binary_scan(spark, os.path.join(pdf_dir, "*.pdf"))
    pw = password.encode()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdf_ocr_spark.sources.pdfcodec import decode_pdf
        from pdf_ocr_spark.sources.pngcodec import encode_png

        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "offset", "media_ref", "payload", "parse_error")}
            for path, content in zip(pdf["path"], pdf["content"]):
                m = _DOC_RE.search(path)
                doc_id = m.group(1) if m else path
                try:
                    images = decode_pdf(bytes(content), password=pw)
                except ValueError as e:
                    rows["doc_id"].append(doc_id)
                    rows["offset"].append(0)
                    rows["media_ref"].append(path)
                    rows["payload"].append(None)
                    rows["parse_error"].append(str(e))
                    continue
                for i, img in enumerate(images):
                    rows["doc_id"].append(doc_id)
                    rows["offset"].append(i)
                    rows["media_ref"].append(f"{path}#page={i}")
                    rows["payload"].append(encode_png(img))
                    rows["parse_error"].append(None)
            yield pd.DataFrame(rows)

    return bf.select("path", "content").mapInPandas(kernel, schema=PDF_PAGES_SCHEMA)


def pdf_page_counts(spark: SparkSession, pdf_dir: str) -> DataFrame:
    """Metadata-only page counting: reads /Count from the pages tree,
    no raster decode — the cheap scan (reference app.py:415-430)."""
    bf = _binary_scan(spark, os.path.join(pdf_dir, "*.pdf"), light=True)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdf_ocr_spark.sources.pdfcodec import page_count

        for pdf in batches:
            ids, counts = [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                m = _DOC_RE.search(path)
                ids.append(m.group(1) if m else path)
                try:
                    counts.append(page_count(bytes(content)))
                except ValueError:
                    counts.append(-1)
            yield pd.DataFrame({"doc_id": ids, "n_pages": counts})

    return bf.select("path", "content").mapInPandas(
        kernel, schema="doc_id string, n_pages int"
    )


def read_pdf_info(spark: SparkSession, pdf_dir: str) -> DataFrame:
    """Document-metadata scan: the §14.3.3 /Info dictionary plus the
    §14.3.2 XMP dc:title per file — no raster decode, the cheap
    metadata pass a curation pipeline runs before committing to
    extraction. One narrow Arrow stage over the binaryFile scan; a
    malformed file yields a row of NULLs rather than failing the
    partition (the error-as-row contract, reference app.py:486-493)."""
    bf = _binary_scan(spark, os.path.join(pdf_dir, "*.pdf"), light=True)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdf_ocr_spark.sources.pdfcodec import pdf_info

        cols = ("title", "author", "producer", "created", "xmp_title")
        for pdf in batches:
            rows = {c: [] for c in ("doc_id",) + cols}
            for path, content in zip(pdf["path"], pdf["content"]):
                m = _DOC_RE.search(path)
                rows["doc_id"].append(m.group(1) if m else path)
                try:
                    got = pdf_info(bytes(content))
                except ValueError:
                    got = {}
                for c in cols:
                    rows[c].append(got.get(c))
            yield pd.DataFrame(rows)

    return bf.select("path", "content").mapInPandas(
        kernel,
        schema=(
            "doc_id string, title string, author string, "
            "producer string, created string, xmp_title string"
        ),
    )


def read_pdf_links(spark: SparkSession, pdf_dir: str) -> DataFrame:
    """Link-edge harvest over PDF corpora: §12.5.6.5 /Link annotations
    exploded to one (doc_id, page, kind, uri, to_page) row each in
    document order — kind 'uri' (§12.6.4.7 outbound actions, the PDF
    twin of the HTML link extractor feeding the crawl frontier),
    'goto' (§12.6.4.2 intra-document edges with the destination —
    direct, indirect, or named via the /Names /Dests tree — resolved
    to a target page index), and 'gotor' (§12.6.4.3 cross-document
    edges: uri carries the remote file, to_page the remote page
    number). Narrow Arrow stage, no raster decode; malformed files
    contribute no rows."""
    bf = _binary_scan(spark, os.path.join(pdf_dir, "*.pdf"), light=True)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdf_ocr_spark.sources.pdfcodec import pdf_links

        for pdf in batches:
            ids, pg, kinds, uris, tp = [], [], [], [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                m = _DOC_RE.search(path)
                did = m.group(1) if m else path
                try:
                    found = pdf_links(bytes(content))
                except ValueError:
                    continue
                for page, kind, uri, to_page in found:
                    ids.append(did)
                    pg.append(page)
                    kinds.append(kind)
                    uris.append(uri)
                    tp.append(to_page)
            yield pd.DataFrame(
                {"doc_id": ids, "page": pg, "kind": kinds, "uri": uris, "to_page": tp}
            )

    return bf.select("path", "content").mapInPandas(
        kernel,
        schema="doc_id string, page int, kind string, uri string, to_page int",
    )


def read_pdf_attachments(
    spark: SparkSession, pdf_dir: str, password: str = ""
) -> DataFrame:
    """Embedded-file harvest over PDF corpora: §7.7.4 /EmbeddedFiles
    name trees exploded to one (doc_id, name, content) row per
    attachment in tree order — the side-data pass an ingestion
    pipeline runs over invoice/portfolio PDFs. Narrow Arrow stage, no
    raster decode; contents decode as UTF-8 text (replacement chars
    for binary payloads); malformed files contribute no rows."""
    bf = _binary_scan(spark, os.path.join(pdf_dir, "*.pdf"), light=True)
    pw = password.encode()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdf_ocr_spark.sources.pdfcodec import pdf_attachments

        for pdf in batches:
            ids, names, contents = [], [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                m = _DOC_RE.search(path)
                did = m.group(1) if m else path
                try:
                    found = pdf_attachments(bytes(content), password=pw)
                except ValueError:
                    continue
                for name, blob in found:
                    ids.append(did)
                    names.append(name)
                    contents.append(blob.decode("utf-8", "replace"))
            yield pd.DataFrame({"doc_id": ids, "name": names, "content": contents})

    return bf.select("path", "content").mapInPandas(
        kernel, schema="doc_id string, name string, content string"
    )


def read_pdf_form_fields(
    spark: SparkSession, pdf_dir: str, password: str = ""
) -> DataFrame:
    """Filled-form harvest over PDF corpora: §12.7.2 /AcroForm text
    fields exploded to one (doc_id, field, value) row per field in
    /Fields order — the structured-data pass an ingestion pipeline
    runs over application/invoice PDFs. Narrow Arrow stage, no raster
    decode; malformed files contribute no rows."""
    bf = _binary_scan(spark, os.path.join(pdf_dir, "*.pdf"), light=True)
    pw = password.encode()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdf_ocr_spark.sources.pdfcodec import pdf_form_fields

        for pdf in batches:
            ids, fnames, values = [], [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                m = _DOC_RE.search(path)
                did = m.group(1) if m else path
                try:
                    found = pdf_form_fields(bytes(content), password=pw)
                except ValueError:
                    continue
                for fname, value in found:
                    ids.append(did)
                    fnames.append(fname)
                    values.append(value)
            yield pd.DataFrame({"doc_id": ids, "field": fnames, "value": values})

    return bf.select("path", "content").mapInPandas(
        kernel, schema="doc_id string, field string, value string"
    )


def read_pdf_outline(
    spark: SparkSession, pdf_dir: str, password: str = ""
) -> DataFrame:
    """Bookmark harvest over PDF corpora: §12.3.3 /Outlines trees
    exploded to one (doc_id, level, title, page) row per item in
    pre-order — the table-of-contents pass a document-understanding
    pipeline runs for section segmentation. Narrow Arrow stage, no
    raster decode; malformed files contribute no rows."""
    bf = _binary_scan(spark, os.path.join(pdf_dir, "*.pdf"), light=True)
    pw = password.encode()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdf_ocr_spark.sources.pdfcodec import pdf_outline

        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "level", "title", "page")}
            for path, content in zip(pdf["path"], pdf["content"]):
                m = _DOC_RE.search(path)
                did = m.group(1) if m else path
                try:
                    found = pdf_outline(bytes(content), password=pw)
                except ValueError:
                    continue
                for level, title, page in found:
                    rows["doc_id"].append(did)
                    rows["level"].append(level)
                    rows["title"].append(title)
                    rows["page"].append(page)
            yield pd.DataFrame(rows)

    return bf.select("path", "content").mapInPandas(
        kernel, schema="doc_id string, level int, title string, page int"
    )


def read_pdf_profiles(
    spark: SparkSession, pdf_dir: str, password: str = ""
) -> DataFrame:
    """The fused document-PROFILE pass: one row per file carrying
    every structure signal the curation tier wants — page count,
    /Info title, link/attachment/form-field/outline counts — from a
    SINGLE binaryFile scan and a SINGLE narrow Arrow stage, no joins.
    This is the 100 TB shape for running the whole metadata tier at
    once: the per-file cost is a handful of object-graph regex passes
    (no raster decode), and the scan is paid once instead of once per
    signal. A file any harvest rejects yields NULLs for that signal
    rather than dropping the row; a file the loader rejects yields a
    row of NULLs with doc_id set (error-as-row)."""
    bf = _binary_scan(spark, os.path.join(pdf_dir, "*.pdf"), light=True)
    kernel, schema = profile_kernel(password)
    return bf.select("path", "content").mapInPandas(kernel, schema=schema)


PROFILE_SCHEMA = (
    "doc_id string, n_pages int, title string, n_links int, "
    "n_attachments int, n_form_fields int, n_outline int"
)


def profile_kernel(password: str = ""):
    """The fused-profile Arrow kernel as a (kernel, schema) pair, shared
    by the batch scan (:func:`read_pdf_profiles`) and the incremental
    streaming harvest (streaming/stream.py stream_pdf_profiles) — one
    definition, two execution modes."""
    pw = password.encode()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdf_ocr_spark.sources.pdfcodec import pdf_profile_signals

        cols = (
            "doc_id", "n_pages", "title",
            "n_links", "n_attachments", "n_form_fields", "n_outline",
        )

        for pdf in batches:
            rows = {c: [] for c in cols}
            for path, content in zip(pdf["path"], pdf["content"]):
                m = _DOC_RE.search(path)
                rows["doc_id"].append(m.group(1) if m else path)
                # ONE object-graph load per file for all six signals
                # (pdf_profile_signals) — per-signal error semantics
                # identical to the six public harvests
                got = pdf_profile_signals(bytes(content), password=pw)
                rows["n_pages"].append(got["n_pages"])
                rows["title"].append(got["title"])
                # the profile's n_links counts OUTBOUND (/URI) links —
                # the frontier-feeding signal; intra-/cross-document
                # goto/gotor edges are pdf_links' own harvest
                rows["n_links"].append(
                    None
                    if got["links"] is None
                    else sum(1 for r in got["links"] if r[1] == "uri")
                )
                rows["n_attachments"].append(got["n_attachments"])
                rows["n_form_fields"].append(got["n_form_fields"])
                rows["n_outline"].append(got["n_outline"])
            yield pd.DataFrame(rows)

    return kernel, PROFILE_SCHEMA


def extract_pdf_documents(spark: SparkSession, pdf_dir: str, config=None) -> DataFrame:
    """End-to-end real-PDF extraction: binaryFile -> parse -> OCR ->
    ordered per-document reassembly. Output: (doc_id, txt, n_pages,
    mean_confidence, n_errors) — raw OCR text, pages joined with a
    blank line, byte-stable for the fixture corpus.

    Parse and OCR are FUSED into one Arrow stage: the composable
    two-stage form (``read_pdf_pages`` -> ``ocr_pages``) carries each
    page between stages as PNG bytes, paying an encode+decode per page
    purely for schema transport (measured ~1.8x the whole query);
    here the parsed rasters feed the decoder directly. Error semantics
    match the two-stage path exactly (parse failures become one
    ``[Error: ...]`` row per file)."""
    from pyspark.sql import functions as F

    from pdf_ocr_spark.config import ExtractionConfig

    cfg = config or ExtractionConfig()
    if cfg.ocr_engine != "glyph":
        # external engines go through the composable two-stage path,
        # which carries the full engine dispatch / error-row semantics
        from pdf_ocr_spark.operators.ocr import ocr_pages

        pages = read_pdf_pages(spark, pdf_dir, password=cfg.pdf_password)
        decoded = ocr_pages(
            pages.select("doc_id", "offset", "media_ref", "payload", "parse_error"),
            cfg,
        )
        return _reassemble_pdf_docs(decoded)
    bf = _binary_scan(spark, os.path.join(pdf_dir, "*.pdf"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdf_ocr_spark.operators.imaging import (
            derotate_image,
            enhance_image,
            ocr_decode,
        )
        from pdf_ocr_spark.sources.pdfcodec import decode_pdf

        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "offset", "text", "confidence", "error")}

            def emit(doc_id, offset, text, conf, err):
                rows["doc_id"].append(doc_id)
                rows["offset"].append(offset)
                rows["text"].append(text)
                rows["confidence"].append(conf)
                rows["error"].append(err)

            for path, content in zip(pdf["path"], pdf["content"]):
                m = _DOC_RE.search(path)
                doc_id = m.group(1) if m else path
                try:
                    images = decode_pdf(bytes(content), password=cfg.pdf_password.encode())
                except ValueError as e:
                    emit(doc_id, 0, f"[Error: {e}]", 0.0, True)
                    continue
                for i, img in enumerate(images):
                    if cfg.preprocess:
                        img = enhance_image(img)
                    if cfg.derotate:
                        img = derotate_image(img)
                    text, conf = ocr_decode(img)
                    emit(doc_id, i, text, conf, False)
            yield pd.DataFrame(rows)

    decoded = bf.select("path", "content").mapInPandas(
        kernel,
        schema="doc_id string, offset int, text string, confidence double, error boolean",
    )
    return _reassemble_pdf_docs(decoded)


def _reassemble_pdf_docs(decoded: DataFrame) -> DataFrame:
    """Per-document ordered reassembly of decoded page rows."""
    from pyspark.sql import functions as F

    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("offset"), F.col("text")))
    )
    return (
        decoded.groupBy("doc_id")
        .agg(
            ordered.alias("_pages"),
            F.count("*").alias("n_pages"),
            F.avg("confidence").alias("mean_confidence"),
            F.sum(F.col("error").cast("long")).alias("n_errors"),
        )
        .select(
            "doc_id",
            F.array_join(F.transform("_pages", lambda s: s["text"]), "\n\n").alias("txt"),
            "n_pages",
            "mean_confidence",
            "n_errors",
        )
    )


def text_page_lines(text: str, words_per_page: int = WORDS_PER_PAGE, words_per_line: int = 8) -> list[list[str]]:
    """Page/line chunking for born-digital fixtures: the same 20-word
    pages as :func:`page_texts`, each split into 8-word lines (so the
    text-layer writer exercises multi-line Td/TL/T* positioning)."""
    pages = []
    for page in page_texts(text, words_per_page):
        words = page.split()
        if not words:
            pages.append([])
            continue
        pages.append(
            [" ".join(words[j : j + words_per_line]) for j in range(0, len(words), words_per_line)]
        )
    return pages


#: Text-layer corpus font-encoding rotation (round 5): doc id % 4
#: picks the font shape, so driver-green pdf_text_layer rows certify
#: every decode path — 0 legacy UTF-8, 1 /WinAnsiEncoding simple font,
#: 2 /Differences with a-z remapped to high codes, 3 Type0/Identity-H
#: CID with a /ToUnicode CMap. All four are content-transparent.
#: Round 6 overlays ``id % TTF_RESIDUES == 6``: an embedded font with
#: NO /ToUnicode and NO /Encoding — alternating (by ``id // 11``) a
#: symbolic TrueType subset (FontFile2: (3,0) cmap + post names,
#: §9.6.6.4) and a Type1 subset (FontFile: cleartext builtin encoding
#: vector, the pdfTeX CM shape) — certifying both embedded decode
#: tiers under the driver's exact oracle.
TEXT_ENCODINGS = ("legacy", "winansi", "differences", "cid")
TTF_RESIDUES = 11


def write_text_pdf_corpus(docs: DataFrame, out_dir: str) -> DataFrame:
    """One born-digital (text-layer, no raster) PDF per (doc_id, text)
    row — executor-side writes, same manifest contract as
    :func:`write_pdf_corpus`. Font encodings rotate per doc id
    (``TEXT_ENCODINGS``) so the extractor's /Encoding, /Differences,
    and /ToUnicode paths all appear in the fixture corpus; every
    ``id % ENCRYPT_RESIDUES == 1`` doc is additionally RC4-encrypted
    (the protected born-digital shape — content and /ToUnicode
    streams decrypt through the same handler path as the raster
    corpus, certified by pdf_text_layer's exact oracle)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdf_ocr_spark.sources.pdfcodec import encode_text_pdf

        os.makedirs(out_dir, exist_ok=True)
        for pdf in batches:
            paths, n_pages = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                pages = text_page_lines(text or "")
                try:
                    d = int(doc_id)
                except ValueError:
                    d = 0
                path = os.path.join(out_dir, f"doc_{doc_id}.pdf")
                tmp = path + ".tmp"
                if d % TTF_RESIDUES == 6:
                    enc_name = "ttf" if (d // TTF_RESIDUES) % 2 == 0 else "type1"
                else:
                    enc_name = TEXT_ENCODINGS[d % 4]
                with open(tmp, "wb") as f:
                    f.write(
                        encode_text_pdf(
                            pages,
                            encoding=enc_name,
                            encrypt=d % ENCRYPT_RESIDUES == 1,
                        )
                    )
                os.replace(tmp, path)
                paths.append(path)
                n_pages.append(len(pages))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "path": paths, "n_pages": n_pages}
            )

    return docs.select("doc_id", "text").mapInPandas(
        kernel, schema="doc_id string, path string, n_pages int"
    )


def read_pdf_text_layers(
    spark: SparkSession, pdf_dir: str, password: str = ""
) -> DataFrame:
    """binaryFile scan -> content-stream text extraction (no raster, no
    OCR): one row per document, pages joined with blank lines —
    the born-digital fast path the reference lacks entirely (it
    rasterizes and OCRs every input). Unparseable files become
    parse_error rows. ``password`` opens protected files (user or
    owner role)."""
    bf = _binary_scan(spark, os.path.join(pdf_dir, "*.pdf"), light=True)
    pw = password.encode()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdf_ocr_spark.sources.pdfcodec import extract_text_layer

        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "txt", "parse_error")}
            for path, content in zip(pdf["path"], pdf["content"]):
                m = _DOC_RE.search(path)
                doc_id = m.group(1) if m else path
                rows["doc_id"].append(doc_id)
                try:
                    pages = extract_text_layer(bytes(content), password=pw)
                    rows["txt"].append("\n\n".join(pages))
                    rows["parse_error"].append(None)
                except ValueError as e:
                    rows["txt"].append(None)
                    rows["parse_error"].append(str(e))
            yield pd.DataFrame(rows)

    return bf.select("path", "content").mapInPandas(
        kernel, schema="doc_id string, txt string, parse_error string"
    )


def mixed_page_segments(text: str, words_per_page: int = WORDS_PER_PAGE):
    """Deterministic hybrid-page structure for the interleaved fixture
    corpus: each 20-word page carries a born-digital TEXT segment
    (first 10 words) followed by a rendered IMAGE segment (last 10
    words, omitted when the chunk is empty) — so every page is a
    genuine text+media interleaving and the expected span sequence is
    derivable in pure SQL."""
    half = words_per_page // 2
    pages = []
    for chunk in page_texts(text, words_per_page):
        words = chunk.split()
        text_part = " ".join(words[:half])
        img_part = " ".join(words[half:])
        segs = [("text", [text_part])]
        if img_part:
            segs.append(("image", img_part))  # rendered by the writer kernel
        pages.append(segs)
    return pages


def write_mixed_pdf_corpus(docs: DataFrame, out_dir: str) -> DataFrame:
    """One hybrid (interleaved text+image) PDF per (doc_id, text) row —
    executor-side writes, same manifest contract as the other corpus
    writers. This is the fixture for the north star's core data model:
    pages that interleave born-digital text spans with raster media
    spans in content-stream order."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdf_ocr_spark.sources.glyphs import render_text_image
        from pdf_ocr_spark.sources.pdfcodec import encode_mixed_pdf

        os.makedirs(out_dir, exist_ok=True)
        for pdf in batches:
            paths, n_pages = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                pages = [
                    [
                        (k, render_text_image(p) if k == "image" else p)
                        for k, p in segs
                    ]
                    for segs in mixed_page_segments(text or "")
                ]
                path = os.path.join(out_dir, f"doc_{doc_id}.pdf")
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(encode_mixed_pdf(pages))
                os.replace(tmp, path)
                paths.append(path)
                n_pages.append(len(pages))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "path": paths, "n_pages": n_pages}
            )

    return docs.select("doc_id", "text").mapInPandas(
        kernel, schema="doc_id string, path string, n_pages int"
    )


def read_pdf_spans(
    spark: SparkSession, pdf_dir: str, password: str = ""
) -> DataFrame:
    """binaryFile scan -> ordered interleaved span rows per document:
    (doc_id, offset, kind, text, media_ref) — the north star's full
    span tuple. Text spans come from the content stream's BT..ET
    blocks (font-decoded, NULL media_ref); image spans are
    OCR-decoded rasters from the XObject ``Do`` operators, each
    carrying a stable ``<file>#seg=<offset>`` media reference, in
    content-stream order — the PDF source emitting the engine's
    native span model directly. Unparseable files become one
    parse_error row."""
    bf = _binary_scan(spark, os.path.join(pdf_dir, "*.pdf"), light=True)
    pw = password.encode()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdf_ocr_spark.operators.imaging import ocr_decode
        from pdf_ocr_spark.sources.pdfcodec import extract_page_segments

        for pdf in batches:
            rows = {
                k: []
                for k in (
                    "doc_id", "offset", "kind", "text", "media_ref", "parse_error"
                )
            }

            def emit(doc_id, offset, kind, text, media_ref=None, err=None):
                rows["doc_id"].append(doc_id)
                rows["offset"].append(offset)
                rows["kind"].append(kind)
                rows["text"].append(text)
                rows["media_ref"].append(media_ref)
                rows["parse_error"].append(err)

            for path, content in zip(pdf["path"], pdf["content"]):
                m = _DOC_RE.search(path)
                doc_id = m.group(1) if m else path
                base = os.path.basename(path)
                try:
                    pages = extract_page_segments(bytes(content), password=pw)
                except ValueError as e:
                    emit(doc_id, 0, "error", None, err=str(e))
                    continue
                off = 0
                for segs in pages:
                    for kind, payload in segs:
                        if kind == "text":
                            emit(doc_id, off, "text", payload)
                        else:
                            text, _conf = ocr_decode(payload)
                            emit(doc_id, off, "image", text, f"{base}#seg={off}")
                        off += 1
            yield pd.DataFrame(rows)

    return bf.select("path", "content").mapInPandas(
        kernel,
        schema=(
            "doc_id string, offset int, kind string, text string, "
            "media_ref string, parse_error string"
        ),
    )
