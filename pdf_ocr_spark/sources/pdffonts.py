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
    # TeX/dvips extension names (Poppler carries these in its
    # nameToUnicode table; evidenced in the wild by CMSY10 subsets —
    # /usr/share/doc libtasn1.pdf /CharSet (/bullet/circlecopyrt))
    "circlecopyrt": "©", "suppress": "", "dotlessj": "ȷ",
    "visiblespace": "␣", "tieaccent": "⁀",
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

    embedded: dict[int, str] | None = None
    if table is None and tounicode is None:
        # §9.6.6.4: no /ToUnicode and no /Encoding — the embedded font
        # program (TrueType cmap+post / CFF charset+encoding / Type1
        # builtin encoding) is the remaining evidence
        embedded = embedded_font_table(font_dict, resolve, get_stream)
        if embedded is None:
            return legacy_utf8_decoder

    enc_table = table
    tu_map = tounicode
    emb_map = embedded

    def decode_simple(raw: bytes) -> str:
        out = []
        for b in raw:
            if tu_map is not None and b in tu_map:
                out.append(tu_map[b])
            elif enc_table is not None:
                out.append(enc_table[b])
            elif emb_map is not None:
                out.append(emb_map.get(b, "�"))
            else:
                out.append("�")
        return "".join(out)

    return decode_simple


# ---------------------------------------------------------------------------
# Embedded font programs — decoding fonts that carry NO /ToUnicode and
# NO usable /Encoding (the symbolic-subset shape; ISO 32000-1 §9.6.6.4
# leaves extraction to the font program itself)
# ---------------------------------------------------------------------------


def sfnt_tables(data: bytes) -> dict[bytes, bytes]:
    """The sfnt table directory of a TrueType/OpenType font as
    {tag: table bytes}. Tolerant of truncated subsets (entries whose
    extent exceeds the data are skipped)."""
    import struct

    if len(data) < 12:
        raise ValueError("not an sfnt (too short)")
    num_tables = struct.unpack(">H", data[4:6])[0]
    out: dict[bytes, bytes] = {}
    for i in range(num_tables):
        rec = data[12 + 16 * i : 28 + 16 * i]
        if len(rec) < 16:
            break
        tag = rec[0:4]
        off, length = struct.unpack(">II", rec[8:16])
        if off + length <= len(data):
            out[tag] = data[off : off + length]
    return out


def parse_cmap_subtables(cmap: bytes) -> dict[tuple[int, int], dict[int, int]]:
    """All character-to-glyph subtables of a 'cmap' table, keyed by
    (platformID, encodingID). Formats 0 (byte), 4 (segment delta —
    the Windows staple), and 6 (trimmed) are decoded; other formats
    are skipped."""
    import struct

    out: dict[tuple[int, int], dict[int, int]] = {}
    if len(cmap) < 4:
        return out
    n = struct.unpack(">H", cmap[2:4])[0]
    for i in range(n):
        rec = cmap[4 + 8 * i : 12 + 8 * i]
        if len(rec) < 8:
            break
        pid, eid, off = struct.unpack(">HHI", rec)
        if off + 4 > len(cmap):
            continue
        fmt = struct.unpack(">H", cmap[off : off + 2])[0]
        sub: dict[int, int] = {}
        if fmt == 0 and off + 262 <= len(cmap):
            glyphs = cmap[off + 6 : off + 262]
            sub = {c: glyphs[c] for c in range(256) if glyphs[c]}
        elif fmt == 4:
            seg2 = struct.unpack(">H", cmap[off + 6 : off + 8])[0]
            segs = seg2 // 2
            base = off + 14
            ends = struct.unpack(f">{segs}H", cmap[base : base + seg2])
            starts_at = base + seg2 + 2  # +2: reservedPad
            starts = struct.unpack(f">{segs}H", cmap[starts_at : starts_at + seg2])
            deltas_at = starts_at + seg2
            deltas = struct.unpack(f">{segs}h", cmap[deltas_at : deltas_at + seg2])
            range_at = deltas_at + seg2
            ranges = struct.unpack(f">{segs}H", cmap[range_at : range_at + seg2])
            for s in range(segs):
                if starts[s] == 0xFFFF:
                    continue
                for c in range(starts[s], ends[s] + 1):
                    if ranges[s] == 0:
                        g = (c + deltas[s]) & 0xFFFF
                    else:
                        # glyphIdArray indexing relative to the
                        # idRangeOffset slot (the spec's famous trick)
                        slot = range_at + 2 * s + ranges[s] + 2 * (c - starts[s])
                        if slot + 2 > len(cmap):
                            continue
                        g = struct.unpack(">H", cmap[slot : slot + 2])[0]
                        if g:
                            g = (g + deltas[s]) & 0xFFFF
                    if g:
                        sub[c] = g
        elif fmt == 6 and off + 10 <= len(cmap):
            first, count = struct.unpack(">HH", cmap[off + 6 : off + 10])
            arr = cmap[off + 10 : off + 10 + 2 * count]
            for j in range(min(count, len(arr) // 2)):
                g = struct.unpack(">H", arr[2 * j : 2 * j + 2])[0]
                if g:
                    sub[first + j] = g
        else:
            continue
        out[(pid, eid)] = sub
    return out


# the 258 standard Macintosh glyph names 'post' format 2.0 indexes
# below 258; only the ones extraction meets matter — resolve through
# AGL anyway, so the table holds names, not code points
_MAC_GLYPH_NAMES = (
    ".notdef .null nonmarkingreturn space exclam quotedbl numbersign dollar "
    "percent ampersand quotesingle parenleft parenright asterisk plus comma "
    "hyphen period slash zero one two three four five six seven eight nine "
    "colon semicolon less equal greater question at A B C D E F G H I J K L "
    "M N O P Q R S T U V W X Y Z bracketleft backslash bracketright "
    "asciicircum underscore grave a b c d e f g h i j k l m n o p q r s t u "
    "v w x y z braceleft bar braceright asciitilde"
).split()


def parse_post_names(post: bytes, num_glyphs: int | None = None) -> dict[int, str]:
    """Glyph-id → glyph-name from a version-2.0 'post' table (the only
    version that carries subset names). Indices < 258 reference the
    standard Macintosh set (partial table above — the printable ASCII
    range real subsets use); >= 258 index the trailing Pascal-string
    list."""
    import struct

    if len(post) < 34 or post[0:4] != b"\x00\x02\x00\x00":
        return {}
    n = struct.unpack(">H", post[32:34])[0]
    if num_glyphs is not None:
        n = min(n, num_glyphs)
    idx = struct.unpack(f">{n}H", post[34 : 34 + 2 * n])
    names: list[str] = []
    p = 34 + 2 * n
    while p < len(post):
        ln = post[p]
        names.append(post[p + 1 : p + 1 + ln].decode("latin-1"))
        p += 1 + ln
    out: dict[int, str] = {}
    for gid, ix in enumerate(idx):
        if ix < 258:
            if ix < len(_MAC_GLYPH_NAMES):
                out[gid] = _MAC_GLYPH_NAMES[ix]
        elif ix - 258 < len(names):
            out[gid] = names[ix - 258]
    return out


def truetype_code_table(ttf: bytes) -> dict[int, str] | None:
    """code → unicode for a simple (one-byte) TrueType font, derived
    from the embedded program alone (§9.6.6.4's lookup order):

    * a (3,0) symbolic cmap maps codes directly (trying 0xF000|code
      first — the symbolic-subset convention — then the bare code) to
      glyphs, whose 'post' names resolve through AGL;
    * else a (3,1) Windows-Unicode cmap is inverted to glyph→unicode
      and composed with a byte-keyed (1,0)/(0,x) subtable when one
      exists, falling back to Latin-1 code identity filtered by cmap
      membership (a code the font cannot render carries no evidence).

    Returns None when the program yields nothing usable."""
    import struct

    try:
        tables = sfnt_tables(ttf)
    except ValueError:
        return None
    if b"cmap" not in tables:
        return None
    # the subtable/post parsers raise struct.error/IndexError on
    # truncated binaries — the public parser's contract is None for
    # undecodable programs, not an untyped exception
    try:
        subs = parse_cmap_subtables(tables[b"cmap"])
        post = parse_post_names(tables.get(b"post", b""))
    except (struct.error, IndexError, ValueError):
        return None
    out: dict[int, str] = {}
    sym = subs.get((3, 0))
    if sym:
        for code in range(256):
            gid = sym.get(0xF000 | code, sym.get(code))
            if gid is None:
                continue
            name = post.get(gid)
            uni = glyph_to_unicode(name) if name else ""
            if uni:
                out[code] = uni
        if out:
            return out
        # a symbolic cmap with no decodable glyph names (e.g. missing
        # or pre-2.0 'post') carries no evidence — fall through to a
        # coexisting (3,1) Unicode subtable instead of giving up
    uni_sub = subs.get((3, 1))
    if uni_sub:
        gid_to_uni: dict[int, str] = {}
        for cp, gid in sorted(uni_sub.items(), reverse=True):
            gid_to_uni[gid] = chr(cp)  # lowest code point wins
        byte_sub = subs.get((1, 0)) or next(
            (subs[k] for k in subs if k[0] == 0), None
        )
        if byte_sub:
            for code, gid in byte_sub.items():
                if code < 256 and gid in gid_to_uni:
                    out[code] = gid_to_uni[gid]
        else:
            for code in range(32, 256):
                if code in uni_sub:
                    out[code] = chr(code)
        # glyph names beat the inversion where both exist
        if post:
            inv = {g: c for c, g in (byte_sub or {}).items()}
            for gid, name in post.items():
                uni = glyph_to_unicode(name)
                code = inv.get(gid)
                if uni and code is not None and code < 256:
                    out[code] = uni
        return out or None
    return None


_T1_ENC_RE = re.compile(rb"dup\s+(\d+)\s*/([^\s/\[\]<>(){}]+)\s+put")


def type1_code_table(pfb: bytes) -> dict[int, str] | None:
    """code → unicode from a Type1 font program's builtin encoding:
    the cleartext ``/Encoding`` vector's ``dup <code> /<name> put``
    entries resolve through AGL; ``/Encoding StandardEncoding def``
    yields the standard table. PFB segment headers (0x80 0x01/0x02)
    are tolerated; only the cleartext portion (before eexec) is
    read."""
    clear = pfb
    eexec = pfb.find(b"eexec")
    if eexec != -1:
        clear = pfb[:eexec]
    if re.search(rb"/Encoding\s+StandardEncoding\s+def", clear):
        return {i: ch for i, ch in enumerate(STANDARD) if ch}
    if b"/Encoding" not in clear:
        return None
    out: dict[int, str] = {}
    for m in _T1_ENC_RE.finditer(clear):
        code = int(m.group(1))
        uni = glyph_to_unicode(m.group(2).decode("latin-1"))
        if uni and code < 256:
            out[code] = uni
    return out or None


# the 391 CFF standard strings (Adobe CFF spec, Appendix A) — SIDs
# below 391 index this list; subset fonts' custom names follow in the
# font's own String INDEX
_CFF_STD_STRINGS = (
    ".notdef space exclam quotedbl numbersign dollar percent ampersand "
    "quoteright parenleft parenright asterisk plus comma hyphen period "
    "slash zero one two three four five six seven eight nine colon "
    "semicolon less equal greater question at A B C D E F G H I J K L M N "
    "O P Q R S T U V W X Y Z bracketleft backslash bracketright "
    "asciicircum underscore quoteleft a b c d e f g h i j k l m n o p q r "
    "s t u v w x y z braceleft bar braceright asciitilde exclamdown cent "
    "sterling fraction yen florin section currency quotesingle "
    "quotedblleft guillemotleft guilsinglleft guilsinglright fi fl endash "
    "dagger daggerdbl periodcentered paragraph bullet quotesinglbase "
    "quotedblbase quotedblright guillemotright ellipsis perthousand "
    "questiondown grave acute circumflex tilde macron breve dotaccent "
    "dieresis ring cedilla hungarumlaut ogonek caron emdash AE "
    "ordfeminine Lslash Oslash OE ordmasculine ae dotlessi lslash oslash "
    "oe germandbls onesuperior logicalnot mu trademark Eth onehalf "
    "plusminus Thorn onequarter divide brokenbar degree thorn "
    "threequarters twosuperior registered minus eth multiply "
    "threesuperior copyright Aacute Acircumflex Adieresis Agrave Aring "
    "Atilde Ccedilla Eacute Ecircumflex Edieresis Egrave Iacute "
    "Icircumflex Idieresis Igrave Ntilde Oacute Ocircumflex Odieresis "
    "Ograve Otilde Scaron Uacute Ucircumflex Udieresis Ugrave Yacute "
    "Ydieresis Zcaron aacute acircumflex adieresis agrave aring atilde "
    "ccedilla eacute ecircumflex edieresis egrave iacute icircumflex "
    "idieresis igrave ntilde oacute ocircumflex odieresis ograve otilde "
    "scaron uacute ucircumflex udieresis ugrave yacute ydieresis zcaron "
    "exclamsmall Hungarumlautsmall dollaroldstyle dollarsuperior "
    "ampersandsmall Acutesmall parenleftsuperior parenrightsuperior "
    "twodotenleader onedotenleader zerooldstyle oneoldstyle twooldstyle "
    "threeoldstyle fouroldstyle fiveoldstyle sixoldstyle sevenoldstyle "
    "eightoldstyle nineoldstyle commasuperior "
    "threequartersemdash periodsuperior questionsmall asuperior "
    "bsuperior centsuperior dsuperior esuperior isuperior lsuperior "
    "msuperior nsuperior osuperior rsuperior ssuperior tsuperior ff ffi "
    "ffl parenleftinferior parenrightinferior Circumflexsmall "
    "hyphensuperior Gravesmall Asmall Bsmall Csmall Dsmall Esmall Fsmall "
    "Gsmall Hsmall Ismall Jsmall Ksmall Lsmall Msmall Nsmall Osmall "
    "Psmall Qsmall Rsmall Ssmall Tsmall Usmall Vsmall Wsmall Xsmall "
    "Ysmall Zsmall colonmonetary onefitted rupiah Tildesmall "
    "exclamdownsmall centoldstyle Lslashsmall Scaronsmall Zcaronsmall "
    "Dieresissmall Brevesmall Caronsmall Dotaccentsmall Macronsmall "
    "figuredash hypheninferior Ogoneksmall Ringsmall Cedillasmall "
    "questiondownsmall oneeighth threeeighths fiveeighths seveneighths "
    "onethird twothirds zerosuperior foursuperior fivesuperior "
    "sixsuperior sevensuperior eightsuperior ninesuperior zeroinferior "
    "oneinferior twoinferior threeinferior fourinferior fiveinferior "
    "sixinferior seveninferior eightinferior nineinferior "
    "centinferior dollarinferior periodinferior commainferior Agravesmall "
    "Aacutesmall Acircumflexsmall Atildesmall Adieresissmall Aringsmall "
    "AEsmall Ccedillasmall Egravesmall Eacutesmall Ecircumflexsmall "
    "Edieresissmall Igravesmall Iacutesmall Icircumflexsmall "
    "Idieresissmall Ethsmall Ntildesmall Ogravesmall Oacutesmall "
    "Ocircumflexsmall Otildesmall Odieresissmall OEsmall Oslashsmall "
    "Ugravesmall Uacutesmall Ucircumflexsmall Udieresissmall Yacutesmall "
    "Thornsmall Ydieresissmall 001.000 001.001 001.002 001.003 Black "
    "Bold Book Light Medium Regular Roman Semibold"
).split()


def _cff_index(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """One CFF INDEX structure at ``pos``: (items, next position)."""
    import struct

    count = struct.unpack(">H", data[pos : pos + 2])[0]
    if count == 0:
        return [], pos + 2
    off_size = data[pos + 2]
    offs = []
    p = pos + 3
    for _ in range(count + 1):
        offs.append(int.from_bytes(data[p : p + off_size], "big"))
        p += off_size
    base = p - 1
    items = [data[base + offs[i] : base + offs[i + 1]] for i in range(count)]
    return items, base + offs[-1]


def _cff_dict(data: bytes) -> dict[int, list]:
    """A CFF DICT: operator (two-byte ops keyed 1200+op2) → operands."""
    out: dict[int, list] = {}
    operands: list = []
    i = 0
    while i < len(data):
        b0 = data[i]
        if b0 <= 21:
            op = b0
            i += 1
            if b0 == 12:
                op = 1200 + data[i]
                i += 1
            out[op] = operands
            operands = []
        elif b0 == 28:
            operands.append(int.from_bytes(data[i + 1 : i + 3], "big", signed=True))
            i += 3
        elif b0 == 29:
            operands.append(int.from_bytes(data[i + 1 : i + 5], "big", signed=True))
            i += 5
        elif b0 == 30:  # real number: skip to the 0xF nibble
            i += 1
            while i < len(data):
                if data[i] & 0x0F == 0x0F or data[i] >> 4 == 0x0F:
                    i += 1
                    break
                i += 1
            operands.append(0.0)
        elif 32 <= b0 <= 246:
            operands.append(b0 - 139)
            i += 1
        elif 247 <= b0 <= 250:
            operands.append((b0 - 247) * 256 + data[i + 1] + 108)
            i += 2
        elif 251 <= b0 <= 254:
            operands.append(-(b0 - 251) * 256 - data[i + 1] - 108)
            i += 2
        else:
            i += 1
    return out


def cff_code_table(cff: bytes) -> dict[int, str] | None:
    """code → unicode from a bare CFF (Type1C) font program: the
    Encoding maps code→GID (format 0/1, supplements honoured; offset
    0 = the built-in Standard encoding), the charset maps GID→SID
    (formats 0/1/2), SIDs resolve through the standard strings + the
    font's String INDEX, and names through AGL. Returns None when
    nothing decodes."""
    import struct

    try:
        hdr_size = cff[2]
        _names, p = _cff_index(cff, hdr_size)
        tops, p = _cff_index(cff, p)
        strings, p = _cff_index(cff, p)
        if not tops:
            return None
        top = _cff_dict(tops[0])
    except (IndexError, struct.error):
        return None

    def sid_name(sid: int) -> str:
        if sid < len(_CFF_STD_STRINGS):
            return _CFF_STD_STRINGS[sid]
        j = sid - len(_CFF_STD_STRINGS)
        return strings[j].decode("latin-1") if j < len(strings) else ""

    # number of glyphs = CharStrings INDEX count (op 17)
    cs_off = top.get(17)
    if not cs_off:
        return None
    try:
        charstrings, _ = _cff_index(cff, int(cs_off[0]))
    except (IndexError, struct.error):
        return None
    n_glyphs = len(charstrings)

    # charset: GID -> SID (GID 0 is .notdef, never listed)
    gid_to_sid = {0: 0}
    cs = top.get(15, [0])
    cso = int(cs[0])
    if cso == 0:  # ISOAdobe: identity SIDs
        for g in range(1, n_glyphs):
            gid_to_sid[g] = g
    elif cso > 2:
        fmt = cff[cso]
        q = cso + 1
        if fmt == 0:
            for g in range(1, n_glyphs):
                gid_to_sid[g] = struct.unpack(">H", cff[q : q + 2])[0]
                q += 2
        elif fmt in (1, 2):
            g = 1
            step = 3 if fmt == 1 else 4
            while g < n_glyphs and q + step <= len(cff):
                first = struct.unpack(">H", cff[q : q + 2])[0]
                left = (
                    cff[q + 2]
                    if fmt == 1
                    else struct.unpack(">H", cff[q + 2 : q + 4])[0]
                )
                for j in range(left + 1):
                    if g < n_glyphs:
                        gid_to_sid[g] = first + j
                        g += 1
                q += step

    # encoding: code -> GID (op 16; 0 = Standard, 1 = Expert)
    enc = top.get(16, [0])
    eo = int(enc[0])
    code_to_gid: dict[int, int] = {}
    if eo in (0, 1):
        # built-in standard encoding: code -> name -> SID -> GID
        name_to_gid = {sid_name(s): g for g, s in gid_to_sid.items()}
        for code, ch in enumerate(STANDARD):
            if not ch:
                continue
            # STANDARD holds unicode chars; recover the glyph name by
            # scanning this font's own names for a matching AGL value
            for name, g in name_to_gid.items():
                if glyph_to_unicode(name) == ch:
                    code_to_gid[code] = g
                    break
    else:
        fmt = cff[eo]
        q = eo + 1
        base_fmt = fmt & 0x7F
        if base_fmt == 0:
            n_codes = cff[q]
            q += 1
            for g in range(1, n_codes + 1):
                code_to_gid[cff[q]] = g
                q += 1
        elif base_fmt == 1:
            n_ranges = cff[q]
            q += 1
            g = 1
            for _ in range(n_ranges):
                first, left = cff[q], cff[q + 1]
                for j in range(left + 1):
                    code_to_gid[first + j] = g
                    g += 1
                q += 2
        if fmt & 0x80:  # supplements: (code, SID) pairs
            sid_to_gid = {s: g for g, s in gid_to_sid.items()}
            n_sups = cff[q]
            q += 1
            for _ in range(n_sups):
                code = cff[q]
                sid = struct.unpack(">H", cff[q + 1 : q + 3])[0]
                if sid in sid_to_gid:
                    code_to_gid[code] = sid_to_gid[sid]
                q += 3

    out: dict[int, str] = {}
    for code, gid in code_to_gid.items():
        sid = gid_to_sid.get(gid)
        if sid is None:
            continue
        uni = glyph_to_unicode(sid_name(sid))
        if uni and code < 256:
            out[code] = uni
    return out or None


def embedded_font_table(
    font_dict: bytes,
    resolve: Callable[[int], bytes],
    get_stream: Callable[[int], bytes],
) -> dict[int, str] | None:
    """code → unicode derived from the /FontDescriptor's embedded
    program: /FontFile2 (TrueType sfnt), /FontFile3 (bare CFF /
    Type1C), or /FontFile (Type1). The last resort before the legacy
    convention for fonts carrying neither /ToUnicode nor a usable
    /Encoding."""
    fd = re.search(rb"/FontDescriptor\s+(\d+)\s+0\s+R", font_dict)
    if fd is None:
        return None
    from pdf_ocr_spark.sources.pdfcodec import _dict_of

    try:
        fdd = _dict_of(resolve(int(fd.group(1))))
    except ValueError:
        return None
    for key, parser in (
        (rb"/FontFile2\s+(\d+)\s+0\s+R", truetype_code_table),
        (rb"/FontFile3\s+(\d+)\s+0\s+R", cff_code_table),
        (rb"/FontFile\s+(\d+)\s+0\s+R", type1_code_table),
    ):
        m = re.search(key, fdd)
        if m is None:
            continue
        try:
            prog = get_stream(int(m.group(1)))
        except ValueError:
            continue
        try:
            table = parser(prog)
        except Exception:
            table = None
        if table:
            return table
    return None


# ---------------------------------------------------------------------------
# Writer: minimal symbolic-subset TrueType builder (fixture side of the
# no-/ToUnicode decode path above)
# ---------------------------------------------------------------------------


def _cmap_format4(mapping: dict[int, int]) -> bytes:
    """A format-4 cmap subtable for the given char→glyph mapping (one
    segment per contiguous code run + the mandatory 0xFFFF terminal),
    idDelta-only (no glyphIdArray) when each run's glyphs are
    contiguous — which the builder guarantees by construction."""
    import struct

    codes = sorted(mapping)
    segs: list[tuple[int, int]] = []  # (start, end)
    for c in codes:
        if segs and c == segs[-1][1] + 1 and mapping[c] == mapping[c - 1] + 1:
            segs[-1] = (segs[-1][0], c)
        else:
            segs.append((c, c))
    segs.append((0xFFFF, 0xFFFF))
    n = len(segs)
    ends = b"".join(struct.pack(">H", e) for _s, e in segs)
    starts = b"".join(struct.pack(">H", s) for s, _e in segs)
    # idDelta arithmetic is modulo 65536 (the spec stores int16 but
    # defines the sum mod 2^16) — mask and pack unsigned, byte-identical
    deltas = b"".join(
        struct.pack(">H", 1 if s == 0xFFFF else (mapping[s] - s) & 0xFFFF)
        for s, _e in segs
    )
    ranges = b"\x00\x00" * n
    # header: format, length, language, segCountX2, searchRange,
    # entrySelector, rangeShift
    seg2 = 2 * n
    import math

    entry_sel = max(0, int(math.log2(n)) if n else 0)
    search_range = 2 * (2 ** entry_sel)
    sub = struct.pack(
        ">HHHHHHH",
        4,
        16 + 8 * n,
        0,
        seg2,
        search_range,
        entry_sel,
        seg2 - search_range,
    ) + ends + b"\x00\x00" + starts + deltas + ranges
    return sub


def build_subset_ttf(code_to_char: dict[int, str], symbolic: bool = True) -> bytes:
    """A minimal structurally-valid sfnt carrying exactly what §9.6.6.4
    extraction needs and nothing else: a (3,0) symbolic cmap mapping
    0xF000|code → gid (or a (3,1)+(1,0) pair when ``symbolic=False``),
    a version-2.0 'post' table naming every glyph ``uniXXXX``, and
    minimal head/maxp. Glyphs have no outlines (extraction never
    rasterizes); table checksums are real so generic sfnt tooling can
    at least walk the directory."""
    import struct

    codes = sorted(code_to_char)
    n_glyphs = len(codes) + 1  # gid 0 = .notdef

    # cmap
    if symbolic:
        mapping = {0xF000 | c: gid for gid, c in enumerate(codes, start=1)}
        plat, enc_id = 3, 0
        sub = _cmap_format4(mapping)
        cmap = (
            struct.pack(">HH", 0, 1)
            + struct.pack(">HHI", plat, enc_id, 12)
            + sub
        )
    else:
        uni_map = {ord(code_to_char[c]): gid for gid, c in enumerate(codes, start=1)}
        byte_map = {c: gid for gid, c in enumerate(codes, start=1)}
        sub31 = _cmap_format4(uni_map)
        # (1,0) byte table as format 6 (trimmed) keeps codes sparse-safe
        first = codes[0] if codes else 0
        count = (codes[-1] - first + 1) if codes else 0
        arr = b"".join(
            struct.pack(">H", byte_map.get(first + j, 0)) for j in range(count)
        )
        sub10 = struct.pack(">HHHHH", 6, 10 + 2 * count, 0, first, count) + arr
        off31 = 4 + 8 * 2
        off10 = off31 + len(sub31)
        cmap = (
            struct.pack(">HH", 0, 2)
            + struct.pack(">HHI", 1, 0, off10)
            + struct.pack(">HHI", 3, 1, off31)
            + sub31
            + sub10
        )

    # post v2.0: uniXXXX names for every real glyph
    names = ["uni%04X" % ord(code_to_char[c]) for c in codes]
    idx = struct.pack(">H", n_glyphs) + struct.pack(">H", 0)  # gid0 -> .notdef
    idx += b"".join(struct.pack(">H", 258 + i) for i in range(len(names)))
    pascal = b"".join(bytes([len(nm)]) + nm.encode("ascii") for nm in names)
    post = b"\x00\x02\x00\x00" + b"\x00" * 28 + idx + pascal

    head = (
        struct.pack(">IHH", 0x00010000, 0, 0)  # version, revision hi/lo
        + b"\x00" * 4  # checksumAdjustment (left 0 — readers ignore)
        + struct.pack(">I", 0x5F0F3CF5)  # magic
        + b"\x00" * 38
    )
    maxp = struct.pack(">IH", 0x00010000, n_glyphs) + b"\x00" * 26

    tables = {b"cmap": cmap, b"head": head, b"maxp": maxp, b"post": post}
    tags = sorted(tables)
    n = len(tags)

    def csum(b: bytes) -> int:
        b = b + b"\x00" * (-len(b) % 4)
        return sum(
            int.from_bytes(b[i : i + 4], "big") for i in range(0, len(b), 4)
        ) & 0xFFFFFFFF

    import math

    entry_sel = int(math.log2(n))
    search_range = 16 * (2 ** entry_sel)
    out = struct.pack(
        ">IHHHH", 0x00010000, n, search_range, entry_sel, 16 * n - search_range
    )
    off = 12 + 16 * n
    recs = b""
    body = b""
    for tag in tags:
        t = tables[tag]
        recs += tag + struct.pack(">III", csum(t), off, len(t))
        pad = t + b"\x00" * (-len(t) % 4)
        body += pad
        off += len(pad)
    return out + recs + body
