"""Pure-stdlib CCITT Group 3 / Group 4 fax codecs (ITU-T T.4 / T.6) —
the bilevel compressions real scanned-document TIFF corpora carry
(TIFF 6.0 compressions 2, 3 and 4).

Surface:

* **Modified Huffman (MH)** — T.4 one-dimensional run-length coding
  with the white/black terminating + make-up code tables and the shared
  extended make-up ladder (1792..2560); TIFF compression 2 flavour
  (no EOLs, every row byte-aligned).
* **Group 3 1D** — MH rows each preceded by an EOL (000000000001),
  arbitrary zero fill tolerated before EOLs (T.4 §4.1.2).
* **Group 3 2D** — EOL + 1 tag bit per row (1 = next row 1D, 0 = 2D),
  2D rows coded with the vertical / horizontal / pass modes against the
  previous row as reference.
* **Group 4 (MMR, T.6)** — every row 2D against the previous row, an
  imaginary all-white row above the first, no EOLs, optional EOFB.

Decode returns one byte per pixel (0 = white, 1 = black — the fax-domain
convention; rows always start with an implicit white run, which may be
zero-length).  The encoder twin emits conformant streams for all four
flavours so fixtures are byte-real; the code tables are additionally
pinned against spec-published codewords in tests (not just round-trip,
which a self-consistent-but-wrong table would survive).

Reference parity: the reference repo has no image surface; this closes
the documented CCITT gate in ``operators/tiff.py``.  Scale: decode is
per-payload executor work, O(pixels), no shuffle.
"""

from __future__ import annotations

__all__ = [
    "CcittError",
    "decode_mh",
    "decode_g3",
    "decode_g4",
    "encode_mh",
    "encode_g3",
    "encode_g4",
]


class CcittError(ValueError):
    """Malformed or unsupported CCITT bitstream."""


# ---------------------------------------------------------------------------
# T.4 code tables (terminating 0..63, make-up 64..1728, extended 1792..2560)
# ---------------------------------------------------------------------------

_WHITE = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100",
    768: "011001101", 832: "011010010", 896: "011010011",
    960: "011010100", 1024: "011010101", 1088: "011010110",
    1152: "011010111", 1216: "011011000", 1280: "011011001",
    1344: "011011010", 1408: "011011011", 1472: "010011000",
    1536: "010011001", 1600: "010011010", 1664: "011000",
    1728: "010011011",
}

_BLACK = {
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

# extended make-up ladder, shared between colours (T.4 table 4)
_EXT = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

_EOL = "000000000001"

# decode maps: bitstring -> run length, per colour (extended codes merged)
_DEC_WHITE = {v: k for k, v in {**_WHITE, **_EXT}.items()}
_DEC_BLACK = {v: k for k, v in {**_BLACK, **_EXT}.items()}
_MAX_CODE_LEN = 13  # longest black code; EOL handled separately

# 2D mode codewords (T.4 table 7 / T.6 table 1)
_MODE_PASS = "0001"
_MODE_HORIZ = "001"
_MODE_V = {0: "1", 1: "011", 2: "000011", 3: "0000011",
           -1: "010", -2: "000010", -3: "0000010"}


class _Bits:
    """MSB-first bit reader over a bytes payload."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position
        self.nbits = 8 * len(data)

    def bit(self) -> int:
        if self.pos >= self.nbits:
            raise CcittError("bitstream exhausted")
        b = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def exhausted(self, slack_bits: int = 7) -> bool:
        """True when only byte-padding remains."""
        return self.pos + slack_bits >= self.nbits


def _read_code(bits: _Bits, black: bool) -> int:
    """One terminating-or-make-up codeword for the given colour."""
    table = _DEC_BLACK if black else _DEC_WHITE
    acc = ""
    for _ in range(_MAX_CODE_LEN):
        acc += "1" if bits.bit() else "0"
        if acc in table:
            return table[acc]
    raise CcittError(f"unknown {'black' if black else 'white'} code {acc!r}")


def _read_run(bits: _Bits, black: bool) -> int:
    """A full run: zero or more make-up codes then one terminating code
    (runs > 2560 are coded as consecutive 2560 make-ups, T.4 §4.2.1.2)."""
    total = 0
    for _ in range(64):  # generous cap: 64 make-ups ≈ 160k pixels
        v = _read_code(bits, black)
        total += v
        if v < 64:
            return total
    raise CcittError("make-up code run unreasonably long")


def _expect_eol(bits: _Bits) -> None:
    """Consume fill zeros + one EOL (T.4 permits zero fill before EOL)."""
    zeros = 0
    while True:
        b = bits.bit()
        if b:
            if zeros >= 11:
                return
            raise CcittError(
                f"EOL expected: got a 1 after only {zeros} zeros"
            )
        zeros += 1
        if zeros > 64 * 8:
            raise CcittError("EOL fill unreasonably long")


# ---------------------------------------------------------------------------
# 1D decode
# ---------------------------------------------------------------------------


def _decode_1d_row(bits: _Bits, width: int) -> bytearray:
    row = bytearray(width)
    pos = 0
    black = False
    while pos < width:
        run = _read_run(bits, black)
        if pos + run > width:
            raise CcittError(
                f"run overruns row: {pos}+{run} > {width}"
            )
        if black:
            for i in range(pos, pos + run):
                row[i] = 1
        pos += run
        black = not black
    return row


def decode_mh(data: bytes, width: int, height: int) -> bytes:
    """TIFF compression 2 (Modified Huffman RLE): no EOLs, every row
    starts on a byte boundary."""
    bits = _Bits(bytes(data))
    out = bytearray()
    for _ in range(height):
        bits.align()
        out += _decode_1d_row(bits, width)
    return bytes(out)


def decode_g3(
    data: bytes, width: int, height: int, *, two_d: bool = False
) -> bytes:
    """T.4 Group 3: EOL before every row; with ``two_d`` each EOL is
    followed by a tag bit (1 = row is 1D-coded, 0 = 2D-coded against the
    previous row)."""
    bits = _Bits(bytes(data))
    out = bytearray()
    ref: bytearray | None = None
    for y in range(height):
        _expect_eol(bits)
        if two_d:
            if bits.bit():
                row = _decode_1d_row(bits, width)
            else:
                if ref is None:
                    raise CcittError("2D-coded first row has no reference")
                row = _decode_2d_row(bits, width, ref)
        else:
            row = _decode_1d_row(bits, width)
        out += row
        ref = row
    return bytes(out)


# ---------------------------------------------------------------------------
# 2D machinery (shared by G3-2D and G4)
# ---------------------------------------------------------------------------


def _changes(row: bytearray | None, width: int) -> list[int]:
    """Positions of changing elements: pixel p whose colour differs from
    pixel p-1 (pixel -1 imaginary white).  ``None`` = imaginary all-white
    reference row (T.6 §2.2.1)."""
    if row is None:
        return []
    ch = []
    prev = 0
    for i, v in enumerate(row):
        if v != prev:
            ch.append(i)
            prev = v
    return ch


def _b1_b2(ch: list[int], a0: int, black: bool, width: int) -> tuple[int, int]:
    """b1 = first changing element on the reference line right of a0 with
    colour opposite to a0's colour; b2 = next change after b1.  Change at
    even index flips white->black (the element is black), odd index
    flips black->white.  a0's colour is ``black``."""
    # we need a change whose colour != a0 colour: black change when a0
    # white (even index), white change when a0 black (odd index)
    want_parity = 0 if not black else 1
    b1 = width
    b1_idx = len(ch)
    for i, p in enumerate(ch):
        if p > a0 and i % 2 == want_parity:
            b1 = p
            b1_idx = i
            break
    b2 = ch[b1_idx + 1] if b1_idx + 1 < len(ch) else width
    return b1, b2


def _decode_2d_row(
    bits: _Bits, width: int, ref: bytearray | None
) -> bytearray:
    row = bytearray(width)
    ch = _changes(ref, width)
    a0 = -1
    black = False
    while a0 < width:
        b1, b2 = _b1_b2(ch, a0, black, width)
        # read a mode codeword
        acc = ""
        mode: str | int | None = None
        for _ in range(7):
            acc += "1" if bits.bit() else "0"
            if acc == _MODE_PASS:
                mode = "pass"
                break
            if acc == _MODE_HORIZ:
                mode = "horiz"
                break
            hit = [d for d, c in _MODE_V.items() if c == acc]
            if hit:
                mode = hit[0]
                break
        if mode is None:
            raise CcittError(f"unknown 2D mode code {acc!r}")
        start = max(a0, 0)
        if mode == "pass":
            if black:
                for i in range(start, min(b2, width)):
                    row[i] = 1
            a0 = b2
        elif mode == "horiz":
            r1 = _read_run(bits, black)
            r2 = _read_run(bits, not black)
            if start + r1 + r2 > width:
                raise CcittError("horizontal runs overrun row")
            if black:
                for i in range(start, start + r1):
                    row[i] = 1
            else:
                for i in range(start + r1, start + r1 + r2):
                    row[i] = 1
            a0 = start + r1 + r2
        else:
            a1 = b1 + mode
            if not start <= a1 <= width:
                raise CcittError(
                    f"vertical mode lands outside row: a1={a1}"
                )
            if black:
                for i in range(start, a1):
                    row[i] = 1
            a0 = a1
            black = not black
    if a0 != width:
        raise CcittError(f"2D row decoded to {a0} pixels, want {width}")
    return row


def decode_g4(data: bytes, width: int, height: int) -> bytes:
    """T.6 (Group 4 MMR): every row 2D against the previous (imaginary
    all-white above row 0), no EOLs; trailing EOFB tolerated."""
    bits = _Bits(bytes(data))
    out = bytearray()
    ref: bytearray | None = None
    for _ in range(height):
        row = _decode_2d_row(bits, width, ref)
        out += row
        ref = row
    return bytes(out)


# ---------------------------------------------------------------------------
# encoders (fixture half)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def put(self, code: str) -> None:
        self.bits.extend(1 if c == "1" else 0 for c in code)

    def align(self) -> None:
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self) -> bytes:
        self.align()
        return bytes(
            sum(b << (7 - k) for k, b in enumerate(self.bits[i : i + 8]))
            for i in range(0, len(self.bits), 8)
        )


def _put_run(w: _BitWriter, run: int, black: bool) -> None:
    """Make-up(s) + terminating code.  Runs > 2623 are coded as
    consecutive 2560 make-ups (T.4 §4.2.1.2); 64..2623 as one make-up
    of (run//64)*64 (always in the tables) + a terminating code."""
    table = _BLACK if black else _WHITE
    while run > 2623:
        w.put(_EXT[2560])
        run -= 2560
    if run >= 64:
        mk = (run // 64) * 64
        w.put(_EXT.get(mk) or table[mk])
        run -= mk
    w.put(table[run])


def _row_runs(row: bytes) -> list[int]:
    """Alternating run lengths starting with white (possibly 0)."""
    runs = []
    cur = 0
    n = 0
    for v in row:
        if v == cur:
            n += 1
        else:
            runs.append(n)
            cur = v
            n = 1
    runs.append(n)
    return runs


def _rows(pixels: bytes, width: int, height: int) -> list[bytes]:
    if len(pixels) != width * height:
        raise CcittError("encoder: pixel plane size mismatch")
    if any(v not in (0, 1) for v in pixels):
        raise CcittError("encoder: bilevel plane must be 0/1 bytes")
    return [pixels[y * width : (y + 1) * width] for y in range(height)]


def encode_mh(pixels: bytes, width: int, height: int) -> bytes:
    w = _BitWriter()
    for row in _rows(pixels, width, height):
        black = False
        for run in _row_runs(row):
            _put_run(w, run, black)
            black = not black
        w.align()
    return w.bytes()


def _encode_2d_row(w: _BitWriter, row: bytes, ref: bytes | None) -> None:
    width = len(row)
    ch_ref = _changes(bytearray(ref) if ref is not None else None, width)
    ch_cur = _changes(bytearray(row), width)
    a0 = -1
    black = False
    while a0 < width:
        b1, b2 = _b1_b2(ch_ref, a0, black, width)
        # a1 = first change on the coding line right of a0 (ends the
        # current run); a2 = the one after
        a1 = width
        a1_idx = len(ch_cur)
        for i, p in enumerate(ch_cur):
            if p > a0:
                a1 = p
                a1_idx = i
                break
        a2 = ch_cur[a1_idx + 1] if a1_idx + 1 < len(ch_cur) else width
        if b2 < a1:
            w.put(_MODE_PASS)
            a0 = b2
        elif abs(a1 - b1) <= 3:
            w.put(_MODE_V[a1 - b1])
            a0 = a1
            black = not black
        else:
            w.put(_MODE_HORIZ)
            start = max(a0, 0)
            _put_run(w, a1 - start, black)
            _put_run(w, a2 - a1, not black)
            a0 = a2


def encode_g3(
    pixels: bytes, width: int, height: int, *, two_d: bool = False
) -> bytes:
    """T.4 Group 3.  With ``two_d``, row 0 is 1D-coded and every later
    row 2D-coded (K unbounded — legal; decoders must follow tag bits)."""
    w = _BitWriter()
    prev: bytes | None = None
    for y, row in enumerate(_rows(pixels, width, height)):
        w.put(_EOL)
        if two_d:
            if y == 0:
                w.put("1")
                black = False
                for run in _row_runs(row):
                    _put_run(w, run, black)
                    black = not black
            else:
                w.put("0")
                _encode_2d_row(w, row, prev)
        else:
            black = False
            for run in _row_runs(row):
                _put_run(w, run, black)
                black = not black
        prev = row
    return w.bytes()


def encode_g4(pixels: bytes, width: int, height: int) -> bytes:
    w = _BitWriter()
    prev: bytes | None = None
    for row in _rows(pixels, width, height):
        _encode_2d_row(w, row, prev)
        prev = row
    w.put(_EOL)  # EOFB = two EOLs
    w.put(_EOL)
    return w.bytes()
