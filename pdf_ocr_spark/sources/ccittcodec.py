"""From-scratch CCITT Group 4 (ITU-T T.6, 2-D MMR) fax codec.

The dominant raster filter in wild *scanned* PDFs — scanner firmware
and office copiers emit /CCITTFaxDecode with ``/K -1`` (pure two-
dimensional MMR) almost universally for bitonal pages. The reference
decodes these through Poppler (/root/reference/app.py:447-454); this
module implements both directions from scratch so the subset parser
accepts them: the mode codes (pass / horizontal / vertical ±3) and
the T.4 run-length Huffman tables (terminating + makeup + shared
extended makeup) are transcribed from the public ITU-T T.4/T.6
recommendations.

Row model: a row is its list of *changing elements* (pixel indices
where the color flips), colors alternating starting white. The
reference line for row 0 is the imaginary all-white line. b1 is the
first changing element on the reference line right of a0 whose new
color is opposite to a0's color — with the transitions representation
that is simply the first reference transition > a0 whose *index
parity* equals the current transition count's parity.

Bit conventions (ISO 32000-1 §7.4.6): decoded 0 bits are BLACK by
default (``/BlackIs1 false``); rows pack MSB-first with no row
padding unless ``/EncodedByteAlign``. The codec works on uint8 0/1
arrays where **1 = black ink**; the PDF layer maps those to 8-bit
gray (black=0) and applies BlackIs1.
"""

from __future__ import annotations

import numpy as np

# --- ITU-T T.4 run-length code tables (public standard) -------------------

_WHITE_TERM = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011",
    14: "110100", 15: "110101", 16: "101010", 17: "101011",
    18: "0100111", 19: "0001100", 20: "0001000", 21: "0010111",
    22: "0000011", 23: "0000100", 24: "0101000", 25: "0101011",
    26: "0010011", 27: "0100100", 28: "0011000", 29: "00000010",
    30: "00000011", 31: "00011010", 32: "00011011", 33: "00010010",
    34: "00010011", 35: "00010100", 36: "00010101", 37: "00010110",
    38: "00010111", 39: "00101000", 40: "00101001", 41: "00101010",
    42: "00101011", 43: "00101100", 44: "00101101", 45: "00000100",
    46: "00000101", 47: "00001010", 48: "00001011", 49: "01010010",
    50: "01010011", 51: "01010100", 52: "01010101", 53: "00100100",
    54: "00100101", 55: "01011000", 56: "01011001", 57: "01011010",
    58: "01011011", 59: "01001010", 60: "01001011", 61: "00110010",
    62: "00110011", 63: "00110100",
}

_WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100",
    512: "01100101", 576: "01101000", 640: "01100111",
    704: "011001100", 768: "011001101", 832: "011010010",
    896: "011010011", 960: "011010100", 1024: "011010101",
    1088: "011010110", 1152: "011010111", 1216: "011011000",
    1280: "011011001", 1344: "011011010", 1408: "011011011",
    1472: "010011000", 1536: "010011001", 1600: "010011010",
    1664: "011000", 1728: "010011011",
}

_BLACK_TERM = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011",
    5: "0011", 6: "0010", 7: "00011", 8: "000101", 9: "000100",
    10: "0000100", 11: "0000101", 12: "0000111", 13: "00000100",
    14: "00000111", 15: "000011000", 16: "0000010111",
    17: "0000011000", 18: "0000001000", 19: "00001100111",
    20: "00001101000", 21: "00001101100", 22: "00000110111",
    23: "00000101000", 24: "00000010111", 25: "00000011000",
    26: "000011001010", 27: "000011001011", 28: "000011001100",
    29: "000011001101", 30: "000001101000", 31: "000001101001",
    32: "000001101010", 33: "000001101011", 34: "000011010010",
    35: "000011010011", 36: "000011010100", 37: "000011010101",
    38: "000011010110", 39: "000011010111", 40: "000001101100",
    41: "000001101101", 42: "000011011010", 43: "000011011011",
    44: "000001010100", 45: "000001010101", 46: "000001010110",
    47: "000001010111", 48: "000001100100", 49: "000001100101",
    50: "000001010010", 51: "000001010011", 52: "000000100100",
    53: "000000110111", 54: "000000111000", 55: "000000100111",
    56: "000000101000", 57: "000001011000", 58: "000001011001",
    59: "000000101011", 60: "000000101100", 61: "000001011010",
    62: "000001100110", 63: "000001100111",
}

_BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

#: Extended makeup codes 1792-2560 are shared by both colors (T.4 §2).
_EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

# --- vertical/pass/horizontal mode codes (T.6 table 1) --------------------

_MODE_V = {0: "1", 1: "011", -1: "010", 2: "000011", -2: "000010",
           3: "0000011", -3: "0000010"}
_MODE_P = "0001"
_MODE_H = "001"


def _decode_trie(tables: list[dict[int, str]]) -> dict[str, int]:
    out: dict[str, int] = {}
    for t in tables:
        for run, code in t.items():
            assert code not in out or out[code] == run
            out[code] = run
    return out


_WHITE_DECODE = _decode_trie([_WHITE_TERM, _WHITE_MAKEUP, _EXT_MAKEUP])
_BLACK_DECODE = _decode_trie([_BLACK_TERM, _BLACK_MAKEUP, _EXT_MAKEUP])
_MAX_CODE_LEN = 13


class _BitReader:
    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position
        self.n = len(data) * 8

    def peek(self, k: int) -> str:
        out = []
        for i in range(self.pos, min(self.pos + k, self.n)):
            out.append("1" if self.data[i >> 3] & (0x80 >> (i & 7)) else "0")
        return "".join(out)

    def skip(self, k: int) -> None:
        self.pos += k

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _read_run(br: _BitReader, white: bool) -> int:
    """One complete run length: zero or more makeup codes (>= 64,
    each must be followed by more) ending in a terminating code."""
    table = _WHITE_DECODE if white else _BLACK_DECODE
    total = 0
    while True:
        buf = br.peek(_MAX_CODE_LEN)
        for ln in range(2, len(buf) + 1):
            run = table.get(buf[:ln])
            if run is not None:
                br.skip(ln)
                total += run
                if run < 64:  # terminating code ends the run
                    return total
                break
        else:
            raise ValueError(
                "invalid CCITT run code near bit %d (%s...)" % (br.pos, buf[:13])
            )


def _read_mode(br: _BitReader) -> tuple[str, int]:
    buf = br.peek(7)
    if buf.startswith("1"):
        br.skip(1)
        return "V", 0
    if buf.startswith("011"):
        br.skip(3)
        return "V", 1
    if buf.startswith("010"):
        br.skip(3)
        return "V", -1
    if buf.startswith("001"):
        br.skip(3)
        return "H", 0
    if buf.startswith("0001"):
        br.skip(4)
        return "P", 0
    if buf.startswith("000011"):
        br.skip(6)
        return "V", 2
    if buf.startswith("000010"):
        br.skip(6)
        return "V", -2
    if buf.startswith("0000011"):
        br.skip(7)
        return "V", 3
    if buf.startswith("0000010"):
        br.skip(7)
        return "V", -3
    raise ValueError("invalid CCITT mode code near bit %d (%s)" % (br.pos, buf))


def _b1_b2(ref: list[int], a0: int, parity: int, width: int) -> tuple[int, int]:
    """The reference line's b1/b2 for the current a0 and color parity
    (0 = white): first ref transition strictly right of a0 with index
    parity == ``parity``, and the transition after it."""
    i = 0
    n = len(ref)
    while i < n and ref[i] <= (a0 if a0 >= 0 else -1):
        i += 1
    if (i & 1) != parity:
        i += 1
    b1 = ref[i] if i < n else width
    b2 = ref[i + 1] if i + 1 < n else width
    return b1, b2


def _decode_2d_row(br: _BitReader, ref: list[int], columns: int) -> list[int]:
    """One 2-D (MMR) coded row against the reference transitions."""
    cur: list[int] = []
    a0 = -1
    while (a0 if a0 >= 0 else 0) < columns:
        mode, dv = _read_mode(br)
        parity = len(cur) & 1
        b1, b2 = _b1_b2(ref, a0, parity, columns)
        if mode == "V":
            a1 = b1 + dv
            if not 0 <= a1 <= columns:
                raise ValueError("CCITT vertical move outside row")
            cur.append(a1)
            a0 = a1
        elif mode == "P":
            a0 = b2
        else:  # H: two runs, current color then opposite
            start = a0 if a0 > 0 else 0
            run1 = _read_run(br, white=parity == 0)
            run2 = _read_run(br, white=parity == 1)
            a1 = start + run1
            a2 = a1 + run2
            if a2 > columns:
                raise ValueError("CCITT horizontal runs overflow row")
            cur.extend((a1, a2))
            a0 = a2
        if len(cur) > 2 * columns + 4:
            raise ValueError("CCITT row transition overflow (corrupt)")
    return cur


def _decode_1d_row(br: _BitReader, columns: int) -> list[int]:
    """One 1-D (MH, T.4 §2.2) coded row: alternating white/black run
    codes starting with a (possibly zero-length) white run."""
    cur: list[int] = []
    pos = 0
    white = True
    while pos < columns:
        run = _read_run(br, white=white)
        pos += run
        if pos > columns:
            raise ValueError("CCITT 1-D run overflows row")
        cur.append(pos)
        white = not white
        if len(cur) > 2 * columns + 4:
            raise ValueError("CCITT row transition overflow (corrupt)")
    return cur


def _paint_row(out: np.ndarray, r: int, cur: list[int], columns: int) -> None:
    color = 0
    prev = 0
    for t in cur:
        t = min(t, columns)
        if color:
            out[r, prev:t] = 1
        prev = t
        color ^= 1
    if color and prev < columns:
        out[r, prev:] = 1


def g4_decode(
    data: bytes,
    columns: int,
    rows: int,
    byte_align: bool = False,
) -> np.ndarray:
    """Decode a /K -1 MMR stream -> (rows, columns) uint8 array with
    1 = black. Corrupt codes raise ValueError naming the bit offset
    (typed-error contract)."""
    br = _BitReader(data)
    ref: list[int] = []  # imaginary all-white line: no transitions
    out = np.zeros((rows, columns), dtype=np.uint8)
    for r in range(rows):
        if byte_align:
            br.byte_align()
        cur = _decode_2d_row(br, ref, columns)
        _paint_row(out, r, cur, columns)
        ref = [t for t in cur if t <= columns]
    return out


class _BitWriter:
    __slots__ = ("bits",)

    def __init__(self):
        self.bits: list[str] = []

    def write(self, code: str) -> None:
        self.bits.append(code)

    def tobytes(self) -> bytes:
        s = "".join(self.bits)
        s += "0" * (-len(s) % 8)
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def _write_run(bw: _BitWriter, run: int, white: bool) -> None:
    term = _WHITE_TERM if white else _BLACK_TERM
    makeup = _WHITE_MAKEUP if white else _BLACK_MAKEUP
    while run >= 64:
        if run >= 2624:  # largest ext makeup + max terminating headroom
            bw.write(_EXT_MAKEUP[2560])
            run -= 2560
            continue
        mk = (run // 64) * 64
        if mk > 1728:
            bw.write(_EXT_MAKEUP[mk])
        else:
            bw.write(makeup[mk])
        run -= mk
    bw.write(term[run])


def _transitions(row: np.ndarray) -> list[int]:
    """Changing-element positions, colors alternating from white — a
    row that STARTS black changes at position 0."""
    t = [0] if row[0] else []
    d = np.flatnonzero(np.diff(row.astype(np.int8)))
    t.extend(int(x) + 1 for x in d)
    return t


def g4_encode(img: np.ndarray) -> bytes:
    """Encode a (rows, columns) 0/1 array (1 = black) as a /K -1 MMR
    stream, choosing pass/vertical/horizontal per the T.6 coding
    procedure. No EOFB (PDF readers stop at /Rows, §7.4.6 note)."""
    if img.ndim != 2:
        raise ValueError("CCITT encoder needs a 2-D bitonal array")
    rows, columns = img.shape
    bw = _BitWriter()
    ref: list[int] = []
    for r in range(rows):
        cur = _transitions(img[r])
        a0 = -1
        idx = 0  # next transition index in cur
        while (a0 if a0 >= 0 else 0) < columns:
            a1 = cur[idx] if idx < len(cur) else columns
            parity = idx & 1
            b1, b2 = _b1_b2(ref, a0, parity, columns)
            if b2 < a1:
                bw.write(_MODE_P)
                a0 = b2
            elif abs(a1 - b1) <= 3:
                bw.write(_MODE_V[a1 - b1])
                a0 = a1
                idx += 1
            else:
                a2 = cur[idx + 1] if idx + 1 < len(cur) else columns
                start = a0 if a0 > 0 else 0
                bw.write(_MODE_H)
                _write_run(bw, a1 - start, white=parity == 0)
                _write_run(bw, a2 - a1, white=parity == 1)
                a0 = a2
                idx += 2
        ref = cur
    return bw.tobytes()


# ---------------------------------------------------------------------------
# Group 3 (ITU-T T.4) — round 5: K=0 pure 1-D MH, K>0 mixed 1-D/2-D.
# Older fax hardware and many scan-to-PDF tools emit these (/K 0 is
# the PDF default when /CCITTFaxDecode carries no /K at all).
# ---------------------------------------------------------------------------

_EOL = "000000000001"


def _skip_eol(br: _BitReader) -> bool:
    """Consume one EOL (11 zero bits + 1, T.4 allows fill zeros before
    it) if present at the cursor; returns whether one was consumed."""
    buf = br.peek(64)
    i = 0
    while i < len(buf) and buf[i] == "0":
        i += 1
    if i >= 11 and i < len(buf) and buf[i] == "1":
        br.skip(i + 1)
        return True
    return False


def g3_decode(
    data: bytes,
    columns: int,
    rows: int,
    k: int = 0,
    byte_align: bool = False,
) -> np.ndarray:
    """Decode a /K >= 0 Group 3 stream -> (rows, columns) uint8, 1 =
    black. ``k == 0``: every row is 1-D MH (leading EOLs tolerated —
    /EndOfLine producers emit them, the PDF default omits them).
    ``k > 0``: each row is preceded by EOL + a tag bit (1 = 1-D,
    0 = 2-D against the previous row), per T.4 §4.2."""
    br = _BitReader(data)
    out = np.zeros((rows, columns), dtype=np.uint8)
    ref: list[int] = []
    for r in range(rows):
        if byte_align:
            br.byte_align()
        if k > 0:
            if not _skip_eol(br):
                raise ValueError("CCITT K>0 row %d missing its EOL" % r)
            tag = br.peek(1)
            if not tag:
                raise ValueError("CCITT K>0 row %d missing its 1-D/2-D tag" % r)
            br.skip(1)
            one_d = tag == "1"
        else:
            _skip_eol(br)  # optional (EndOfLine producers)
            one_d = True
        cur = _decode_1d_row(br, columns) if one_d else _decode_2d_row(br, ref, columns)
        _paint_row(out, r, cur, columns)
        ref = [t for t in cur if t <= columns]
    return out


def g3_encode(img: np.ndarray, k: int = 0) -> bytes:
    """Encode a 0/1 array as Group 3: ``k == 0`` writes plain 1-D MH
    rows (no EOLs — the PDF default layout); ``k > 0`` writes
    EOL+tag-delimited rows with a 1-D row every ``k`` rows and 2-D
    rows between (the standard's K-factor error-confinement shape)."""
    if img.ndim != 2:
        raise ValueError("CCITT encoder needs a 2-D bitonal array")
    rows, columns = img.shape
    bw = _BitWriter()
    ref: list[int] = []
    for r in range(rows):
        cur = _transitions(img[r])
        one_d = k == 0 or r % k == 0
        if k > 0:
            bw.write(_EOL)
            bw.write("1" if one_d else "0")
        if one_d:
            # alternating runs from transitions, starting white
            prev = 0
            white = True
            for t in cur:
                _write_run(bw, t - prev, white=white)
                prev = t
                white = not white
            if prev < columns:
                _write_run(bw, columns - prev, white=white)
            elif not cur:
                _write_run(bw, columns, white=True)
        else:
            a0 = -1
            idx = 0
            while (a0 if a0 >= 0 else 0) < columns:
                a1 = cur[idx] if idx < len(cur) else columns
                parity = idx & 1
                b1, b2 = _b1_b2(ref, a0, parity, columns)
                if b2 < a1:
                    bw.write(_MODE_P)
                    a0 = b2
                elif abs(a1 - b1) <= 3:
                    bw.write(_MODE_V[a1 - b1])
                    a0 = a1
                    idx += 1
                else:
                    a2 = cur[idx + 1] if idx + 1 < len(cur) else columns
                    start = a0 if a0 > 0 else 0
                    bw.write(_MODE_H)
                    _write_run(bw, a1 - start, white=parity == 0)
                    _write_run(bw, a2 - a1, white=parity == 1)
                    a0 = a2
                    idx += 2
        ref = cur
    return bw.tobytes()
