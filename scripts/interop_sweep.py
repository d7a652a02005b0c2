#!/usr/bin/env python
"""Wild-PDF interop sweep: run every harvest over every real PDF found
on the system and report a per-(file, harvest) outcome table with a
typed-error taxonomy and aggregate success rates.

The reference's implicit capability is "any PDF Poppler opens"
(/root/reference/app.py:447-454); this measures our gap instead of
sampling it. Outcomes:

  ok:<n>        — harvest succeeded, n result rows (n is informative)
  empty         — succeeded with zero rows (a real absence, not a bug)
  no-raster     — decode_pdf's typed refusal on born-digital files
                  (the raster pipeline is for scanned pages; text
                  extraction is extract_text_layer's job there)
  err:<class>   — ValueError taxonomy key (first words of the message)

Usage:
    python scripts/interop_sweep.py                  # default roots
    python scripts/interop_sweep.py /some/dir ...    # explicit roots

Exit code 1 if any file fails a MUST-PASS harvest (everything except
decode_pdf, which legitimately refuses born-digital files)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_ROOTS = ["/usr", "/opt", "/etc", "/srv", "/home"]

HARVESTS = (
    "page_count",
    "pdf_info",
    "pdf_links",
    "pdf_attachments",
    "pdf_form_fields",
    "pdf_outline",
    "extract_text_layer",
    "decode_pdf",
)


def find_pdfs(roots: list[str]) -> list[str]:
    out: list[str] = []
    for root in roots:
        if not os.path.isdir(root):
            continue
        r = subprocess.run(
            ["find", root, "-name", "*.pdf", "-type", "f"],
            capture_output=True, text=True,
        )
        out.extend(p for p in r.stdout.splitlines() if p)
    return sorted(set(out))


def classify(exc: Exception) -> str:
    msg = str(exc)
    if "no image XObject" in msg:
        return "no-raster"
    words = "-".join(msg.split()[:4]).lower()
    return f"err:{type(exc).__name__}:{words[:40]}"


def sweep(paths: list[str]) -> dict:
    from pdf_ocr_spark.sources import pdfcodec as pc

    rows = []
    failures = 0
    for path in paths:
        try:
            data = open(path, "rb").read()
        except OSError as e:
            rows.append({"file": path, "outcomes": {"<read>": classify(e)}})
            failures += 1
            continue
        outcomes: dict[str, str] = {}
        for hname in HARVESTS:
            fn = getattr(pc, hname)
            try:
                r = fn(data)
                n = len(r) if hasattr(r, "__len__") else 1
                outcomes[hname] = f"ok:{n}" if n else "empty"
            except Exception as e:  # typed taxonomy, never a crash
                outcomes[hname] = classify(e)
                if not (hname == "decode_pdf" and outcomes[hname] == "no-raster"):
                    failures += 1
        # extraction-quality signal: replacement-char count in the
        # text layer (undecodable glyphs that survived)
        try:
            txt = "\n".join(pc.extract_text_layer(data))
            outcomes["_chars"] = str(len(txt))
            outcomes["_u_fffd"] = str(txt.count("�"))
        except Exception:
            pass
        rows.append({"file": path, "outcomes": outcomes})

    must_pass = [h for h in HARVESTS if h != "decode_pdf"]
    cells = sum(1 for r in rows for h in must_pass if h in r["outcomes"])
    ok_cells = sum(
        1
        for r in rows
        for h in must_pass
        if r["outcomes"].get(h, "").startswith(("ok:", "empty"))
    )
    return {
        "n_files": len(paths),
        "harvests": list(HARVESTS),
        "must_pass_cells": cells,
        "must_pass_ok": ok_cells,
        "success_rate": round(ok_cells / cells, 4) if cells else None,
        "failures": failures,
        "rows": rows,
    }


def main() -> None:
    roots = sys.argv[1:] or DEFAULT_ROOTS
    paths = find_pdfs(roots)
    result = sweep(paths)
    for r in result["rows"]:
        print(r["file"])
        for h, o in r["outcomes"].items():
            print(f"    {h:22s} {o}")
    print(json.dumps({k: v for k, v in result.items() if k != "rows"}))
    sys.exit(1 if result["failures"] else 0)


if __name__ == "__main__":
    main()
