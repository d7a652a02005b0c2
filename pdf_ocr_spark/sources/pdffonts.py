"""Font encodings for born-digital PDF text layers.

Real text-layer PDFs do not carry Unicode in their content-stream
strings — string bytes are *codes* routed through the current font's
encoding: simple fonts (Type1/TrueType) map each byte via a base
encoding (ISO 32000-1 Annex D: Standard / WinAnsi / MacRoman) plus an
optional ``/Differences`` array of glyph names, and/or a ``/ToUnicode``
CMap; composite Type0 fonts map fixed-width (usually 2-byte) codes
through their ``/ToUnicode`` CMap. The reference reads all of this for
free through Poppler (/root/reference/app.py:447-454); this module
implements the decode side from scratch for the subset parser, plus
the small glyph-name→Unicode table the ``/Differences`` path needs.

Decoder preference order (what Poppler's text extractor effectively
does): an explicit ``/ToUnicode`` CMap wins where it maps a code; then
the encoding table (base + differences); a simple font with neither
falls back to the writer's legacy convention (UTF-8 bytes in literal
strings) so pre-round-5 fixture files keep decoding byte-identically.
"""

from __future__ import annotations

import re
from collections.abc import Callable

#: Adobe Glyph List subset: the names that actually occur in base
#: encodings, pdfTeX/dvips /Differences arrays, and our writer. An
#: unknown name decodes to U+FFFD (never an exception — the Spark
#: source wants error *values*, not error rows, for single glyphs).
AGL: dict[str, str] = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@",
    "bracketleft": "[", "backslash": "\\", "bracketright": "]",
    "asciicircum": "^", "underscore": "_", "grave": "`",
    "braceleft": "{", "bar": "|", "braceright": "}", "asciitilde": "~",
    # quotes / dashes / marks
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "quotesinglbase": "‚", "quotedblbase": "„",
    "endash": "–", "emdash": "—", "bullet": "•",
    "dagger": "†", "daggerdbl": "‡", "ellipsis": "…",
    "perthousand": "‰", "guilsinglleft": "‹",
    "guilsinglright": "›", "guillemotleft": "«",
    "guillemotright": "»", "exclamdown": "¡",
    "questiondown": "¿", "section": "§", "paragraph": "¶",
    "periodcentered": "·", "currency": "¤", "cent": "¢",
    "sterling": "£", "yen": "¥", "florin": "ƒ",
    "fraction": "⁄", "degree": "°", "plusminus": "±",
    "multiply": "×", "divide": "÷", "mu": "µ",
    "trademark": "™", "copyright": "©", "registered": "®",
    "Euro": "€", "brokenbar": "¦", "logicalnot": "¬",
    "macron": "¯", "acute": "´", "dieresis": "¨",
    "cedilla": "¸", "onequarter": "¼", "onehalf": "½",
    "threequarters": "¾", "onesuperior": "¹",
    "twosuperior": "²", "threesuperior": "³",
    "ordfeminine": "ª", "ordmasculine": "º",
    "circumflex": "ˆ", "tilde": "˜", "breve": "˘",
    "dotaccent": "˙", "ring": "˚", "hungarumlaut": "˝",
    "ogonek": "˛", "caron": "ˇ",
    # ligatures / special latin
    "fi": "ﬁ", "fl": "ﬂ", "AE": "Æ", "ae": "æ",
    "OE": "Œ", "oe": "œ", "Oslash": "Ø", "oslash": "ø",
    "Lslash": "Ł", "lslash": "ł", "dotlessi": "ı",
    "germandbls": "ß", "Thorn": "Þ", "thorn": "þ",
    "Eth": "Ð", "eth": "ð", "Scaron": "Š",
    "scaron": "š", "Zcaron": "Ž", "zcaron": "ž",
    "Ydieresis": "Ÿ",
}
# ASCII letters name themselves; accented latin via systematic names
for _c in "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ":
    AGL[_c] = _c
for _name, _ch in {
    "Agrave": "À", "Aacute": "Á", "Acircumflex": "Â",
    "Atilde": "Ã", "Adieresis": "Ä", "Aring": "Å",
    "Ccedilla": "Ç", "Egrave": "È", "Eacute": "É",
    "Ecircumflex": "Ê", "Edieresis": "Ë", "Igrave": "Ì",
    "Iacute": "Í", "Icircumflex": "Î", "Idieresis": "Ï",
    "Ntilde": "Ñ", "Ograve": "Ò", "Oacute": "Ó",
    "Ocircumflex": "Ô", "Otilde": "Õ", "Odieresis": "Ö",
    "Ugrave": "Ù", "Uacute": "Ú", "Ucircumflex": "Û",
    "Udieresis": "Ü", "Yacute": "Ý",
    "agrave": "à", "aacute": "á", "acircumflex": "â",
    "atilde": "ã", "adieresis": "ä", "aring": "å",
    "ccedilla": "ç", "egrave": "è", "eacute": "é",
    "ecircumflex": "ê", "edieresis": "ë", "igrave": "ì",
    "iacute": "í", "icircumflex": "î", "idieresis": "ï",
    "ntilde": "ñ", "ograve": "ò", "oacute": "ó",
    "ocircumflex": "ô", "otilde": "õ", "odieresis": "ö",
    "ugrave": "ù", "uacute": "ú", "ucircumflex": "û",
    "udieresis": "ü", "yacute": "ý", "ydieresis": "ÿ",
}.items():
    AGL[_name] = _ch

_UNI_RE = re.compile(r"^uni((?:[0-9A-Fa-f]{4})+)$")
_U_RE = re.compile(r"^u([0-9A-Fa-f]{4,6})$")


def glyph_to_unicode(name: str) -> str:
    """AGL lookup plus the algorithmic ``uniXXXX`` / ``uXXXXXX`` forms
    (Adobe Glyph Naming convention); unknown names -> U+FFFD."""
    hit = AGL.get(name)
    if hit is not None:
        return hit
    m = _UNI_RE.match(name)
    if m:
        hexes = m.group(1)
        return "".join(
            chr(int(hexes[i : i + 4], 16)) for i in range(0, len(hexes), 4)
        )
    m = _U_RE.match(name)
    if m:
        try:
            return chr(int(m.group(1), 16))
        except ValueError:
            return "�"
    return "�"


def _win_ansi_table() -> list[str]:
    """WinAnsiEncoding == Windows code page 1252, with the PDF-spec
    wrinkle (Annex D note 4) that unused codes map to /bullet."""
    table = []
    for b in range(256):
        try:
            table.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            table.append("•")
    return table


def _mac_roman_table() -> list[str]:
    return [bytes([b]).decode("mac_roman") for b in range(256)]


_STANDARD_HIGH = {
    0x27: "quoteright", 0x60: "quoteleft",
    0xA1: "exclamdown", 0xA2: "cent", 0xA3: "sterling", 0xA4: "fraction",
    0xA5: "yen", 0xA6: "florin", 0xA7: "section", 0xA8: "currency",
    0xA9: "quotesingle", 0xAA: "quotedblleft", 0xAB: "guillemotleft",
    0xAC: "guilsinglleft", 0xAD: "guilsinglright", 0xAE: "fi", 0xAF: "fl",
    0xB1: "endash", 0xB2: "dagger", 0xB3: "daggerdbl",
    0xB4: "periodcentered", 0xB6: "paragraph", 0xB7: "bullet",
    0xB8: "quotesinglbase", 0xB9: "quotedblbase", 0xBA: "quotedblright",
    0xBB: "guillemotright", 0xBC: "ellipsis", 0xBD: "perthousand",
    0xBF: "questiondown", 0xC1: "grave", 0xC2: "acute", 0xC3: "circumflex",
    0xC4: "tilde", 0xC5: "macron", 0xC6: "breve", 0xC7: "dotaccent",
    0xC8: "dieresis", 0xCA: "ring", 0xCB: "cedilla", 0xCD: "hungarumlaut",
    0xCE: "ogonek", 0xCF: "caron", 0xD0: "emdash",
    0xE1: "AE", 0xE3: "ordfeminine", 0xE8: "Lslash", 0xE9: "Oslash",
    0xEA: "OE", 0xEB: "ordmasculine", 0xF1: "ae", 0xF5: "dotlessi",
    0xF8: "lslash", 0xF9: "oslash", 0xFA: "oe", 0xFB: "germandbls",
}


def _standard_table() -> list[str]:
    """Adobe StandardEncoding (ISO 32000-1 Annex D.2): ASCII for the
    printable low range except quoteright/quoteleft at 0x27/0x60, plus
    the Adobe high region; unlisted codes are undefined (U+FFFD)."""
    table = ["�"] * 256
    for b in range(0x20, 0x7F):
        table[b] = chr(b)
    for b, name in _STANDARD_HIGH.items():
        table[b] = glyph_to_unicode(name)
    return table


WIN_ANSI = _win_ansi_table()
MAC_ROMAN = _mac_roman_table()
STANDARD = _standard_table()

_BASE_TABLES = {
    b"WinAnsiEncoding": WIN_ANSI,
    b"MacRomanEncoding": MAC_ROMAN,
    b"StandardEncoding": STANDARD,
}

_DIFF_TOKEN = re.compile(rb"/([^\s/\[\]<>()]+)|(\d+)")


def encoding_table(base_name: bytes | None, differences: bytes | None) -> list[str]:
    """Build the 256-entry code->char table: the named base encoding
    (Standard when unnamed, per the spec's Type1 default) overridden
    by the /Differences array's (code, glyph-name...) runs."""
    base = _BASE_TABLES.get(base_name or b"StandardEncoding")
    if base is None:
        raise ValueError(
            "unsupported base encoding /%s" % base_name.decode(errors="replace")
        )
    table = list(base)
    if differences:
        code = 0
        for m in _DIFF_TOKEN.finditer(differences):
            if m.group(2) is not None:
                code = int(m.group(2))
            else:
                if 0 <= code < 256:
                    table[code] = glyph_to_unicode(m.group(1).decode("latin-1"))
                code += 1
    return table


# ---------------------------------------------------------------------------
# ToUnicode CMaps (ISO 32000-1 §9.10.3)
# ---------------------------------------------------------------------------

_HEXPAIR = re.compile(rb"<([0-9A-Fa-f\s]*)>")
_CSR = re.compile(rb"begincodespacerange(.*?)endcodespacerange", re.S)
_BFCHAR = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_RANGE_ITEM = re.compile(
    rb"<([0-9A-Fa-f\s]+)>\s*<([0-9A-Fa-f\s]+)>\s*(?:<([0-9A-Fa-f\s]*)>|\[(.*?)\])",
    re.S,
)


def _hex_bytes(h: bytes) -> bytes:
    return bytes.fromhex(re.sub(rb"\s", b"", h).decode())


def _utf16(b: bytes) -> str:
    try:
        return b.decode("utf-16-be")
    except UnicodeDecodeError:
        return "�"


def parse_tounicode(cmap: bytes) -> tuple[int, dict[int, str]]:
    """Parse a /ToUnicode CMap stream -> (code byte-width, code->text).
    Width comes from the first codespacerange (1 for the simple-font
    CMaps pdfTeX emits, 2 for Identity-H composite fonts; default 2
    when absent, the dominant Type0 shape). bfchar + both bfrange
    forms supported; destination hex is UTF-16BE and may be multi-char
    (ligatures)."""
    nbytes = 2
    csr = _CSR.search(cmap)
    if csr:
        first = _HEXPAIR.search(csr.group(1))
        if first:
            nbytes = max(1, len(_hex_bytes(first.group(1))))
    mapping: dict[int, str] = {}
    for block in _BFCHAR.finditer(cmap):
        pairs = _HEXPAIR.findall(block.group(1))
        for src, dst in zip(pairs[0::2], pairs[1::2]):
            mapping[int.from_bytes(_hex_bytes(src), "big")] = _utf16(_hex_bytes(dst))
    for block in _BFRANGE.finditer(cmap):
        for m in _RANGE_ITEM.finditer(block.group(1)):
            lo = int.from_bytes(_hex_bytes(m.group(1)), "big")
            hi = int.from_bytes(_hex_bytes(m.group(2)), "big")
            if hi - lo > 0x10000:
                raise ValueError("bfrange spans more than 2^16 codes")
            if m.group(3) is not None:
                dst = _hex_bytes(m.group(3))
                base = int.from_bytes(dst, "big")
                for c in range(lo, hi + 1):
                    mapping[c] = _utf16(
                        (base + c - lo).to_bytes(max(2, len(dst)), "big")
                    )
            else:
                dsts = _HEXPAIR.findall(m.group(4))
                for c, d in zip(range(lo, hi + 1), dsts):
                    mapping[c] = _utf16(_hex_bytes(d))
    return nbytes, mapping


# ---------------------------------------------------------------------------
# Decoder assembly
# ---------------------------------------------------------------------------


def legacy_utf8_decoder(raw: bytes) -> str:
    """The subset writer's pre-round-5 convention: literal-string bytes
    are UTF-8 text directly (no font indirection)."""
    return raw.decode("utf-8", errors="replace")


def make_decoder(
    font_dict: bytes,
    resolve: Callable[[int], bytes],
    get_stream: Callable[[int], bytes],
) -> Callable[[bytes], str]:
    """Build the string-bytes->text decoder for one font dictionary.

    ``resolve(num)`` returns an object's body bytes; ``get_stream(num)``
    returns an object's decoded (decompressed + decrypted) stream.
    Composite /Type0 fonts decode fixed-width codes through /ToUnicode;
    simple fonts consult /ToUnicode first (where mapped), then the
    /Encoding table, then the legacy UTF-8 convention when the font
    declares neither.
    """
    is_type0 = re.search(rb"/Subtype\s*/Type0\b", font_dict) is not None

    tounicode: dict[int, str] | None = None
    nbytes = 2 if is_type0 else 1
    tu = re.search(rb"/ToUnicode\s+(\d+)\s+0\s+R", font_dict)
    if tu is not None:
        nbytes, tounicode = parse_tounicode(get_stream(int(tu.group(1))))

    if is_type0:
        mapping = tounicode or {}
        width = nbytes

        def decode_cid(raw: bytes) -> str:
            out = []
            for i in range(0, len(raw) - width + 1, width):
                code = int.from_bytes(raw[i : i + width], "big")
                out.append(mapping.get(code, "�"))
            return "".join(out)

        return decode_cid

    table: list[str] | None = None
    em = re.search(rb"/Encoding\s*(?:/(\w+)|(\d+)\s+0\s+R|(<<))", font_dict)
    if em is not None:
        if em.group(1) is not None:  # /Encoding /WinAnsiEncoding
            table = encoding_table(em.group(1), None)
        else:
            if em.group(2) is not None:  # indirect dict
                enc_body = resolve(int(em.group(2)))
                from pdf_ocr_spark.sources.pdfcodec import _dict_of

                enc_dict = _dict_of(enc_body)
            else:  # inline dict — balanced scan from the <<
                from pdf_ocr_spark.sources.pdfcodec import _dict_of

                enc_dict = _dict_of(font_dict[em.start(3) :])
            bm = re.search(rb"/BaseEncoding\s*/(\w+)", enc_dict)
            dm = re.search(rb"/Differences\s*\[(.*?)\]", enc_dict, re.S)
            table = encoding_table(
                bm.group(1) if bm else None, dm.group(1) if dm else None
            )

    if table is None and tounicode is None:
        return legacy_utf8_decoder

    enc_table = table
    tu_map = tounicode

    def decode_simple(raw: bytes) -> str:
        out = []
        for b in raw:
            if tu_map is not None and b in tu_map:
                out.append(tu_map[b])
            elif enc_table is not None:
                out.append(enc_table[b])
            else:
                out.append("�")
        return "".join(out)

    return decode_simple
