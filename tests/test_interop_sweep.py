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
