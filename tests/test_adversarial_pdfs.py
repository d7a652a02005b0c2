"""Adversarial wild-PDF floor: structure-aware mutations (truncation,
xref lies, object renumbering, stream-/Length lies, header/trailer
damage, byte flips) of every real PDF on the system must NEVER crash
untyped and NEVER yield wrong text — successful extractions are
byte-equal to the clean file's text with zero U+FFFD. The corpus
regenerates deterministically from scripts/adversarial_pdfs.py (the
committed sweep table is ADVERSARIAL.json)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from adversarial_pdfs import mutants, sweep_adversarial  # noqa: E402
from interop_sweep import find_pdfs  # noqa: E402

WILD = [p for p in find_pdfs(["/usr", "/opt"]) if "/tmp" not in p]


@pytest.fixture(scope="module")
def result():
    return sweep_adversarial(WILD)


@pytest.mark.skipif(not WILD, reason="no wild PDFs on this system")
def test_corpus_size_and_determinism():
    data = open(WILD[0], "rb").read()
    a, b = mutants(data), mutants(data)
    assert [n for n, _ in a] == [n for n, _ in b]
    assert all(x == y for (_, x), (_, y) in zip(a, b))  # byte-identical
    assert len(a) >= 24  # ~25 mutation shapes per wild file


@pytest.mark.skipif(not WILD, reason="no wild PDFs on this system")
def test_never_crash_never_wrong_text(result):
    assert result["n_mutants"] >= 24 * len(WILD)
    # the floor: zero untyped exceptions across every (mutant, harvest)
    assert result["untyped_exceptions"] == 0, [
        (r["mutation"], h, o)
        for r in result["rows"]
        for h, o in r["outcomes"].items()
        if o.startswith("UNTYPED")
    ]
    # zero replacement characters in anything that still extracts
    assert result["fffd_in_successes"] == 0
    # and zero silent divergence: a successful extraction equals the
    # clean text byte-for-byte (ok*, the divergence flag, never fires)
    diverging = [
        (r["mutation"], o)
        for r in result["rows"]
        for h, o in r["outcomes"].items()
        if o.startswith("ok*")
    ]
    assert diverging == [], diverging


@pytest.mark.skipif(not WILD, reason="no wild PDFs on this system")
def test_recoverable_damage_actually_recovers(result):
    """The never-crash floor must not be bought by failing everything:
    damage that leaves the object graph intact (startxref lies, EOF
    stripped, future version header, /Size lies) must still extract
    the FULL clean text via the rescan path, per file."""
    recoverable = {
        "startxref_zero",
        "startxref_past_eof",
        "startxref_mid_file",
        "eof_removed",
        "header_future_version",
        "trailer_size_lie",
    }
    for r in result["rows"]:
        if r["mutation"] in recoverable:
            o = r["outcomes"]["extract_text_layer"]
            assert o.startswith("ok:"), (r["file"], r["mutation"], o)


@pytest.mark.skipif(not WILD, reason="no wild PDFs on this system")
def test_hard_damage_fails_typed(result):
    """Deep truncation must surface as a typed error for page_count —
    the row the Spark kernel turns into an error row, never a crash."""
    for r in result["rows"]:
        if r["mutation"] == "truncate_10":
            assert r["outcomes"]["page_count"].startswith("err:"), r
