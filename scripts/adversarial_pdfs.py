#!/usr/bin/env python
"""Adversarial wild-PDF corpus: deterministic structure-aware
mutations of every real (third-party) PDF on the system, swept through
every harvest with a typed-error floor.

Extends scripts/interop_sweep.py's CLEAN floor the way a hostile
crawl extends a clean one: real files arrive truncated, with lying
xref tables, renumbered objects, wrong /Length values, damaged
headers/trailers. The engine's contract under damage is

  * **never crash untyped** — every harvest either succeeds or raises
    ValueError (the error-as-row boundary the Spark kernels rely on);
  * **never wrong text** — when text extraction still SUCCEEDS on a
    mutant, it yields zero U+FFFD (no silently-undecodable glyphs
    smuggled into a training corpus) and is flagged when it diverges
    from the clean file's text so the sweep table shows exactly which
    damage classes degrade output instead of failing.

The corpus is DERIVED, not vendored: mutants regenerate byte-
identically from (wild file, mutation name) — committing ~10 MB of
derived binaries would add no information the generator doesn't
carry. The committed artifacts are this generator and the sweep table
(ADVERSARIAL.json); tests/test_adversarial_pdfs.py pins the floor so
any new U+FFFD or untyped exception fails CI.

Usage:
    python scripts/adversarial_pdfs.py            # sweep + write table
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from interop_sweep import find_pdfs  # noqa: E402

HARVESTS = (
    "page_count",
    "pdf_info",
    "pdf_links",
    "pdf_attachments",
    "pdf_form_fields",
    "pdf_outline",
    "extract_text_layer",
)

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_LEN_RE = re.compile(rb"/Length\s+(\d+)")


def _replace_span(data: bytes, start: int, end: int, repl: bytes) -> bytes:
    return data[:start] + repl + data[end:]


def mutants(data: bytes) -> list[tuple[str, bytes]]:
    """All deterministic mutants of one PDF, as (name, bytes) —
    ~25 per file, every byte derived from the input alone."""
    out: list[tuple[str, bytes]] = []
    n = len(data)

    # -- truncation at four depths ----------------------------------
    for frac in (95, 70, 40, 10):
        out.append((f"truncate_{frac}", data[: n * frac // 100]))

    # -- startxref lies ----------------------------------------------
    i = data.rfind(b"startxref")
    if i != -1:
        m = re.compile(rb"startxref\s+(\d+)").match(data, i)
        if m:
            for tag, val in (("zero", b"0"), ("past_eof", str(2 * n).encode()),
                             ("mid_file", str(n // 2).encode())):
                out.append(
                    (f"startxref_{tag}", _replace_span(data, m.start(1), m.end(1), val))
                )

    # -- xref entry lies: damage 10-digit offsets in the table -------
    xi = data.rfind(b"\nxref")
    entry = re.compile(rb"(\d{10}) (\d{5}) ([nf])")
    if xi != -1:
        hits = list(entry.finditer(data, xi))
        for tag, pick in (("first", 0), ("mid", len(hits) // 2)):
            if hits:
                m = hits[min(pick, len(hits) - 1)]
                lie = str((int(m.group(1)) + n // 3) % n).rjust(10, "0").encode()
                out.append(
                    (f"xref_entry_{tag}", _replace_span(data, m.start(1), m.end(1), lie))
                )
        # -- remove the xref table entirely ---------------------------
        ti = data.find(b"trailer", xi)
        if ti != -1:
            out.append(("xref_removed", data[:xi] + b"\n" + data[ti:]))

    # -- object renumbering: dangle references ------------------------
    objs = list(_OBJ_RE.finditer(data))
    for tag, pick in (("first", 0), ("mid", len(objs) // 2), ("last", -1)):
        if objs:
            m = objs[pick]
            new = str(int(m.group(1)) + 900000).encode()
            out.append(
                (f"obj_renumber_{tag}", _replace_span(data, m.start(1), m.end(1), new))
            )

    # -- stream /Length lies ------------------------------------------
    lens = list(_LEN_RE.finditer(data))
    for tag, pick, lie in (
        ("short", 0, lambda v: str(max(0, v // 3)).encode()),
        ("long", len(lens) // 2, lambda v: str(v * 7 + 123).encode()),
        ("huge", -1, lambda v: str(n * 3).encode()),
    ):
        if lens:
            m = lens[min(pick, len(lens) - 1)]
            out.append(
                (
                    f"stream_length_{tag}",
                    _replace_span(data, m.start(1), m.end(1), lie(int(m.group(1)))),
                )
            )

    # -- trailer /Root points nowhere ---------------------------------
    rm = re.compile(rb"/Root\s+(\d+)\s+\d+\s+R")
    m = rm.search(data, max(0, n - 4096)) or rm.search(data)
    if m:
        out.append(("root_dangling", _replace_span(data, m.start(1), m.end(1), b"999999")))

    # -- EOF / header damage -------------------------------------------
    ei = data.rfind(b"%%EOF")
    if ei != -1:
        out.append(("eof_removed", data[:ei]))
    out.append(("header_future_version", b"%PDF-9.9" + data[8:]))
    out.append(("header_garbage", b"\x00\xff\x00\xff\x00\xff\x00\xff" + data[8:]))

    # -- swap two object bodies (offsets lie wholesale) ----------------
    if len(objs) >= 4:
        a, b = objs[1], objs[2]
        ea = data.find(b"endobj", a.start())
        eb = data.find(b"endobj", b.start())
        if -1 < ea < b.start() and eb > b.start():
            swapped = (
                data[: a.start()]
                + data[b.start() : eb + 6]
                + data[ea + 6 : b.start()]
                + data[a.start() : ea + 6]
                + data[eb + 6 :]
            )
            out.append(("objects_swapped", swapped))

    # -- trailer /Size lie ----------------------------------------------
    sm = re.compile(rb"/Size\s+(\d+)")
    m = sm.search(data, max(0, n - 4096)) or sm.search(data)
    if m:
        out.append(("trailer_size_lie", _replace_span(data, m.start(1), m.end(1), b"3")))

    # -- xref subsection count lie ---------------------------------------
    if xi != -1:
        cm = re.compile(rb"xref\s+(\d+)\s+(\d+)").search(data, xi)
        if cm:
            lie = str(int(cm.group(2)) * 5 + 7).encode()
            out.append(
                ("xref_count_lie", _replace_span(data, cm.start(2), cm.end(2), lie))
            )

    # -- preamble junk before the header (the HTTP-débris shape real
    # crawls deliver; offsets in the xref are now all wrong) -----------
    out.append(("preamble_junk", b"JUNKJUNKJUNKJUNK\r\n" * 3 + data))

    # -- reproducible byte flips across the body -----------------------
    for seed in range(4):
        mutated = bytearray(data)
        for k in range(64):
            mutated[(seed * 7919 + k * 104729) % n] ^= 0xFF
        out.append((f"bitflip_{seed}", bytes(mutated)))

    return out


def sweep_adversarial(paths: list[str]) -> dict:
    """Run every harvest over every mutant of every wild file.
    Outcome grammar matches interop_sweep plus:

      UNTYPED:<class>  — a non-ValueError escaped (floor violation)
      ok*:<n>          — succeeded but text diverges from the clean
                         file (flagged, only meaningful for
                         extract_text_layer)
    """
    from pdf_ocr_spark.sources import pdfcodec as pc

    def joined(res) -> str:
        # extract_text_layer returns per-page texts; compare one string
        return "\f".join(res) if isinstance(res, (list, tuple)) else str(res)

    rows = []
    n_untyped = n_fffd = n_mutants = 0
    for path in paths:
        clean = open(path, "rb").read()
        try:
            clean_text = joined(pc.extract_text_layer(clean))
        except ValueError:
            clean_text = None
        for name, blob in mutants(clean):
            n_mutants += 1
            outcomes: dict[str, str] = {}
            for hname in HARVESTS:
                fn = getattr(pc, hname)
                try:
                    res = fn(blob)
                except ValueError as exc:
                    outcomes[hname] = "err:" + " ".join(str(exc).split()[:3])[:40]
                    continue
                except Exception as exc:  # noqa: BLE001 — the floor being pinned
                    outcomes[hname] = f"UNTYPED:{type(exc).__name__}"
                    n_untyped += 1
                    continue
                if hname == "extract_text_layer":
                    text = joined(res)
                    fffd = text.count("�")
                    n_fffd += fffd
                    diverges = clean_text is not None and text != clean_text
                    outcomes[hname] = (
                        f"{'ok*' if diverges else 'ok'}:{len(text)}"
                        + (f":fffd={fffd}" if fffd else "")
                    )
                else:
                    try:
                        cnt = len(res)
                    except TypeError:
                        cnt = 1
                    outcomes[hname] = f"ok:{cnt}" if cnt else "empty"
            rows.append(
                {"file": os.path.basename(path), "mutation": name, "outcomes": outcomes}
            )
    return {
        "n_files": len(paths),
        "n_mutants": n_mutants,
        "untyped_exceptions": n_untyped,
        "fffd_in_successes": n_fffd,
        "rows": rows,
    }


def main() -> None:
    roots = sys.argv[1:] or ["/usr", "/opt", "/etc", "/srv", "/home"]
    paths = [p for p in find_pdfs(roots) if "/tmp" not in p]
    result = sweep_adversarial(paths)
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "ADVERSARIAL.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(json.dumps({k: v for k, v in result.items() if k != "rows"}))
    sys.exit(1 if result["untyped_exceptions"] or result["fffd_in_successes"] else 0)


if __name__ == "__main__":
    main()
