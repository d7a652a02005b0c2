"""Wild-PDF interop floor: every real (third-party) PDF on the system
must pass every must-pass harvest, and the text layer must decode with
zero replacement characters. The sweep harness itself lives in
scripts/interop_sweep.py; this pins its aggregate result so a decode
regression fails CI, not just a committed artifact."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from interop_sweep import find_pdfs, sweep  # noqa: E402

WILD = [p for p in find_pdfs(["/usr", "/opt"]) if "/tmp" not in p]


@pytest.mark.skipif(not WILD, reason="no wild PDFs on this system")
def test_wild_pdf_sweep_floor():
    result = sweep(WILD)
    assert result["n_files"] >= 2  # libtasn1 + shared-mime-info ship here
    assert result["failures"] == 0, result["rows"]
    assert result["success_rate"] == 1.0
    for row in result["rows"]:
        o = row["outcomes"]
        # born-digital text extracts fully: no undecodable glyphs
        assert o.get("_u_fffd") == "0", row
        assert int(o.get("_chars", "0")) > 1000, row
        # the raster pipeline's refusal on born-digital files is typed
        assert o.get("decode_pdf") == "no-raster", row


@pytest.mark.skipif(not WILD, reason="no wild PDFs on this system")
@pytest.mark.parametrize("frac", [0.95, 0.7, 0.4, 0.1])
def test_truncated_wild_pdfs_fail_typed(frac):
    """Truncated third-party files must produce typed ValueErrors (or
    degrade to fewer rows), never crash with anything else — the
    error-as-row containment the Spark kernels rely on."""
    from pdf_ocr_spark.sources import pdfcodec as pc

    for path in WILD:
        data = open(path, "rb").read()
        cut = data[: int(len(data) * frac)]
        for hname in ("page_count", "pdf_info", "pdf_links", "pdf_outline",
                      "extract_text_layer"):
            fn = getattr(pc, hname)
            try:
                fn(cut)
            except ValueError:
                pass  # typed: the kernels turn this into an error row
            # any other exception type propagates and fails the test


@pytest.mark.skipif(not WILD, reason="no wild PDFs on this system")
def test_byte_corrupted_wild_pdfs_fail_typed():
    """Deterministic byte corruption across the file body: every
    harvest either succeeds (damage missed the object graph) or raises
    ValueError — no IndexError/KeyError/struct.error leaks."""
    from pdf_ocr_spark.sources import pdfcodec as pc

    for path in WILD:
        data = bytearray(open(path, "rb").read())
        n = len(data)
        for seed in range(6):
            mutated = bytearray(data)
            # flip 64 bytes at doc-derived positions (reproducible)
            for k in range(64):
                pos = (seed * 7919 + k * 104729) % n
                mutated[pos] ^= 0xFF
            blob = bytes(mutated)
            for hname in ("page_count", "pdf_info", "pdf_links",
                          "pdf_outline", "extract_text_layer"):
                try:
                    getattr(pc, hname)(blob)
                except ValueError:
                    pass
