"""Font-encoded PDF text layers: /Encoding tables, /Differences,
/ToUnicode CMaps (simple + Type0/CID), and the writer variants that
plant them in the fixture corpus.

The reference reads font encodings implicitly through Poppler
(/root/reference/app.py:447-454); these pin the from-scratch decode
path in pdf_ocr_spark/sources/pdffonts.py — including interop against
real third-party pdfTeX/texinfo PDFs shipped with the OS.
"""

from __future__ import annotations

import os

import pytest

from pdf_ocr_spark.sources import pdffonts
from pdf_ocr_spark.sources.pdfcodec import encode_text_pdf, extract_text_layer

PAGES = [["hello world one two", "second line here"], ["page two text"]]
EXPECT = ["hello world one two\nsecond line here", "page two text"]


@pytest.mark.parametrize("encoding", ["legacy", "winansi", "differences", "cid"])
def test_writer_variants_round_trip(encoding):
    assert extract_text_layer(encode_text_pdf(PAGES, encoding=encoding)) == EXPECT


@pytest.mark.parametrize("encoding", ["legacy", "winansi", "cid"])
def test_non_ascii_round_trip(encoding):
    text = "café naïve — résumé ±£"
    got = extract_text_layer(encode_text_pdf([[text]], encoding=encoding))
    assert got == [text]


def test_cid_full_bmp_round_trip():
    text = "Ω λ 中文 test"
    assert extract_text_layer(encode_text_pdf([[text]], encoding="cid")) == [text]


def test_differences_bytes_are_high():
    """The differences variant must actually place codes >= 0x80 in the
    content stream — otherwise it wouldn't exercise the table path."""
    data = encode_text_pdf([["abc"]], encoding="differences")
    assert b"/Differences" in data
    # content stream: (..) Tj with bytes 0x80 0x81 0x82
    assert bytes([0x80, 0x81, 0x82]) in data


def test_glyph_names():
    g = pdffonts.glyph_to_unicode
    assert g("eacute") == "é" and g("quotedblleft") == "“" and g("fl") == "ﬂ"
    assert g("Lslash") == "Ł" and g("germandbls") == "ß"
    assert g("uni0041") == "A" and g("uni00660069") == "fi"
    assert g("u1F600") == "😀"
    assert g("nosuchglyph") == "�"


def test_encoding_tables():
    assert pdffonts.WIN_ANSI[0xE9] == "é"
    assert pdffonts.WIN_ANSI[0x80] == "€"  # cp1252, not latin-1
    assert pdffonts.WIN_ANSI[0x81] == "•"  # unused WinAnsi codes -> bullet
    assert pdffonts.MAC_ROMAN[0x8E] == "é"
    assert pdffonts.STANDARD[0x27] == "’" and pdffonts.STANDARD[0x60] == "‘"
    assert pdffonts.STANDARD[0xAE] == "ﬁ" and pdffonts.STANDARD[0xD0] == "—"
    # differences override a named base
    t = pdffonts.encoding_table(b"WinAnsiEncoding", b"65 /bullet /eacute 200 /fl")
    assert t[65] == "•" and t[66] == "é" and t[200] == "ﬂ" and t[67] == "C"
    with pytest.raises(ValueError, match="base encoding"):
        pdffonts.encoding_table(b"PDFDocEncoding", None)


def test_parse_tounicode_forms():
    cmap = b"""
1 begincodespacerange
<00> <FF>
endcodespacerange
2 beginbfchar
<41> <0042>
<42> <00660069>
endbfchar
1 beginbfrange
<50> <52> <0061>
endbfrange
1 beginbfrange
<60> <61> [<2713> <2714>]
endbfrange
"""
    nbytes, m = pdffonts.parse_tounicode(cmap)
    assert nbytes == 1
    assert m[0x41] == "B" and m[0x42] == "fi"
    assert m[0x50] == "a" and m[0x51] == "b" and m[0x52] == "c"
    assert m[0x60] == "✓" and m[0x61] == "✔"
    # default code width without a codespacerange: 2 (Identity-H)
    nb2, _ = pdffonts.parse_tounicode(b"1 beginbfchar <0041> <0041> endbfchar")
    assert nb2 == 2
    with pytest.raises(ValueError, match="bfrange"):
        pdffonts.parse_tounicode(
            b"1 begincodespacerange <0000> <ffff> endcodespacerange\n"
            b"1 beginbfrange <0000> <ffffff> <0000> endbfrange"
        )


REAL_PDFTEX = "/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf"
REAL_TEXINFO = "/usr/share/doc/libtasn1-doc/libtasn1.pdf"


@pytest.mark.skipif(not os.path.exists(REAL_PDFTEX), reason="OS doc pdf absent")
def test_interop_real_pdftex_document():
    """Third-party born-digital PDF (pdfTeX 1.40.22, PDF 1.5 object
    streams, Type1 fonts with /Differences + single-byte /ToUnicode
    CMaps, nested page tree, TJ-kern word spacing): the text layer
    must come out as readable spaced English."""
    with open(REAL_PDFTEX, "rb") as f:
        pages = extract_text_layer(f.read())
    assert len(pages) == 17
    first = pages[0]
    assert "Shared MIME-info Database" in first
    assert "Thomas Leonard" in first
    assert "This is version 0.21" in first
    joined = " ".join(pages)
    for phrase in ["MIME type", "freedesktop", "database"]:
        assert phrase in joined


@pytest.mark.skipif(not os.path.exists(REAL_TEXINFO), reason="OS doc pdf absent")
def test_interop_real_texinfo_document():
    with open(REAL_TEXINFO, "rb") as f:
        pages = extract_text_layer(f.read())
    assert len(pages) == 36
    assert "Abstract Syntax Notation One" in pages[0]
    assert "Libtasn1" in pages[0]


def test_nested_page_tree_and_contents_array():
    """Synthetic file exercising the two structural shapes real
    producers emit that the flat fixture writer doesn't: intermediate
    /Pages nodes and a /Contents array of streams."""
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Pages /Parent 2 0 R /Kids [4 0 R] /Count 1 "
        b"/Resources << /Font << /F1 7 0 R >> >> >>",
        4: b"<< /Type /Page /Parent 3 0 R /Contents [5 0 R 6 0 R] >>",
        5: b"<< /Length 26 >>\nstream\nBT /F1 12 Tf (part one) Tj\nendstream",
        6: b"<< /Length 21 >>\nstream\nBT ( part two) Tj ET\nendstream",
        7: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for n in sorted(objs):
        offsets[n] = len(out)
        out += b"%d 0 obj\n" % n + objs[n] + b"\nendobj\n"
    xref = len(out)
    out += b"xref\n0 8\n0000000000 65535 f \n"
    for n in range(1, 8):
        out += b"%010d 00000 n \n" % offsets[n]
    out += b"trailer\n<< /Size 8 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % xref
    # resources inherited from the intermediate node; contents concatenate
    assert extract_text_layer(bytes(out)) == ["part one part two"]


def test_tj_kern_space_heuristic():
    """Large negative TJ kerns read as word spaces; small kerns don't
    (they're letter-spacing adjustments)."""
    from pdf_ocr_spark.sources.pdfcodec import _text_from_content

    content = b"BT [(hello) -350 (world)] TJ ET"
    assert _text_from_content(content) == "hello world"
    content2 = b"BT [(ker) -40 (ned)] TJ ET"
    assert _text_from_content(content2) == "kerned"


def test_encrypted_text_layer_extracts():
    """RC4-encrypted born-digital files (the protected report shape):
    content and /ToUnicode streams decrypt through the standard
    handler, so every font-encoding variant extracts identically."""
    from pdf_ocr_spark.sources.pdfcodec import encode_text_pdf, extract_text_layer

    pages = [["hello encrypted world", "line two"], ["page deux"]]
    for encoding in ("legacy", "winansi", "differences", "cid"):
        data = encode_text_pdf(pages, encoding=encoding, encrypt=True)
        assert b"/Encrypt" in data
        assert extract_text_layer(data) == [
            "hello encrypted world\nline two", "page deux",
        ], encoding


# ---------------------------------------------------------------------------
# round 6: embedded-program decoding (no /ToUnicode, no /Encoding)
# ---------------------------------------------------------------------------


def test_ttf_builder_round_trip_symbolic_and_unicode():
    from pdf_ocr_spark.sources.pdffonts import build_subset_ttf, truetype_code_table

    m = {c: ch for c, ch in enumerate("hello wrd! Äï42", start=0x20)}
    for sym in (True, False):
        ttf = build_subset_ttf(m, symbolic=sym)
        got = truetype_code_table(ttf)
        assert got is not None
        assert {c: got.get(c) for c in m} == m, sym


def test_cmap_format4_spec_shapes():
    """Format-4 parsing handles idDelta wraparound and the
    glyphIdArray (idRangeOffset) indexing path, not just our builder's
    delta-only output."""
    import struct

    from pdf_ocr_spark.sources.pdffonts import parse_cmap_subtables

    # one delta segment (0x41->gid 5, delta wraps mod 2^16) + one
    # range-offset segment (0x61..0x62 via glyphIdArray) + terminal
    segs = 3
    ends = struct.pack(">3H", 0x41, 0x62, 0xFFFF)
    starts = struct.pack(">3H", 0x41, 0x61, 0xFFFF)
    deltas = struct.pack(">3H", (5 - 0x41) & 0xFFFF, 0, 1)
    # idRangeOffset for seg 1 points 2 bytes past its own slot end
    ranges = struct.pack(">3H", 0, 4, 0)
    glyph_arr = struct.pack(">2H", 9, 10)
    sub = struct.pack(">HHHHHHH", 4, 16 + 8 * segs + 4, 0, 2 * segs, 4, 1, 2)
    sub += ends + b"\x00\x00" + starts + deltas + ranges + glyph_arr
    cmap = struct.pack(">HH", 0, 1) + struct.pack(">HHI", 3, 1, 12) + sub
    got = parse_cmap_subtables(cmap)[(3, 1)]
    assert got == {0x41: 5, 0x61: 9, 0x62: 10}


def test_type1_builtin_encoding():
    from pdf_ocr_spark.sources.pdffonts import type1_code_table

    pfb = (
        b"%!PS-AdobeFont-1.0: Sub001\n"
        b"/Encoding 256 array\n0 1 255 {1 index exch /.notdef put} for\n"
        b"dup 65 /A put\ndup 97 /a put\ndup 32 /space put\n"
        b"dup 200 /adieresis put\nreadonly def\n"
        b"currentdict end\ncurrentfile eexec\n\x00\x01binary"
    )
    got = type1_code_table(pfb)
    assert got is not None
    assert got[65] == "A" and got[97] == "a" and got[32] == " " and got[200] == "ä"
    assert type1_code_table(b"/Encoding StandardEncoding def")[0x41] == "A"


def _tiny_cff(encoding_fmt: int) -> bytes:
    """A handcrafted 3-glyph CFF: .notdef + 'A' + custom 'uni0042'
    (SID 391 -> string index 0), charset format 0, encoding format 0
    or 1 mapping codes 0x30/0x31."""
    import struct

    def index(items):
        if not items:
            return struct.pack(">H", 0)
        offs = [1]
        for it in items:
            offs.append(offs[-1] + len(it))
        return (
            struct.pack(">HB", len(items), 1)
            + bytes(offs)
            + b"".join(items)
        )

    header = bytes([1, 0, 4, 1])
    name_idx = index([b"Tiny"])
    strings = index([b"uni0042"])
    gsubrs = index([])
    charstrings = index([b"\x0e", b"\x0e", b"\x0e"])  # 3 endchar stubs

    # layout: header, name, top, string, gsubr, charset, encoding, cs
    # build top dict last (needs offsets); sizes are stable because
    # offsets are emitted as 5-byte (29) operands
    def top_dict(charset_off, enc_off, cs_off):
        def op29(v):
            return b"\x1d" + struct.pack(">i", v)
        return op29(charset_off) + b"\x0f" + op29(enc_off) + b"\x10" + op29(cs_off) + b"\x11"

    probe = index([top_dict(0, 0, 0)])
    base = len(header) + len(name_idx) + len(probe) + len(strings) + len(gsubrs)
    charset = bytes([0]) + struct.pack(">HH", 34, 391)  # fmt 0: SIDs for gid1, gid2 ('A'=SID 34)
    if encoding_fmt == 0:
        encoding = bytes([0, 2, 0x30, 0x31])  # 2 codes -> gid 1, 2
    else:
        encoding = bytes([1, 1, 0x30, 1])  # 1 range: 0x30..0x31 -> gid 1..2
    charset_off = base
    enc_off = charset_off + len(charset)
    cs_off = enc_off + len(encoding)
    top_idx = index([top_dict(charset_off, enc_off, cs_off)])
    assert len(top_idx) == len(probe)
    return header + name_idx + top_idx + strings + gsubrs + charset + encoding + charstrings


@pytest.mark.parametrize("fmt", [0, 1])
def test_cff_code_table(fmt):
    from pdf_ocr_spark.sources.pdffonts import cff_code_table

    got = cff_code_table(_tiny_cff(fmt))
    assert got is not None
    assert got[0x30] == "A"      # SID 34 = 'A' standard string
    assert got[0x31] == "B"      # custom string 'uni0042' via AGL


def test_embedded_ttf_text_layer_end_to_end():
    """encode_text_pdf(encoding='ttf') emits a no-/ToUnicode symbolic
    subset; extract_text_layer must decode it via the embedded program
    only, plain and encrypted, and the plaintext must NOT be readable
    from the raw bytes (proving the codes are really opaque)."""
    from pdf_ocr_spark.sources.pdfcodec import encode_text_pdf, extract_text_layer

    pages = [["embedded symbolic glyphs", "page one line two"], ["page two"]]
    for enc in (False, True):
        data = encode_text_pdf(pages, encoding="ttf", encrypt=enc)
        assert b"/ToUnicode" not in data and b"/Encoding" not in data
        assert b"embedded" not in data
        got = extract_text_layer(data)
        assert got == ["embedded symbolic glyphs\npage one line two", "page two"]


def test_embedded_type1_text_layer_end_to_end():
    """encode_text_pdf(encoding='type1') emits the pdfTeX CM shape —
    a Type1 subset with no /ToUnicode and no /Encoding whose cleartext
    builtin encoding vector is the only decode evidence."""
    from pdf_ocr_spark.sources.pdfcodec import encode_text_pdf, extract_text_layer

    pages = [["builtin vector decode", "line 2"], ["page two"]]
    for enc in (False, True):
        data = encode_text_pdf(pages, encoding="type1", encrypt=enc)
        assert b"/ToUnicode" not in data and b"/Encoding /" not in data
        got = extract_text_layer(data)
        assert got == ["builtin vector decode\nline 2", "page two"]
