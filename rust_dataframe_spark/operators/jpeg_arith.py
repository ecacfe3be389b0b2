"""Arithmetic-coded JPEG (ITU-T T.81 Annex D QM-coder + Annex F
sequential DC/AC statistical models) — round 8, VERDICT r7 #4.

Closes the largest remaining public-spec-feasible JPEG gate: SOF9
(extended sequential, arithmetic entropy coding).  Two halves:

* **QM coder** (T.81 Annex D): the adaptive binary arithmetic coder —
  113-state probability estimation table (Table D.3) plus the fixed
  ~0.5 state the sign decisions use (index 113, self-looping), MPS/LPS
  conditional exchange, renormalization-gated adaptation, carry
  propagation into emitted bytes, and the Huffman-compatible
  0xFF-0x00 byte stuffing of section D.1.6 (a marker byte after 0xFF
  legally terminates the entropy segment; the decoder then feeds zero
  bits, F.2.2.5).
* **Statistical model** (T.81 F.1.4 / F.2): DC differences conditioned
  on the previous diff's five-category classification under the (L, U)
  conditioning bounds (default 0, 1), AC coefficients on a per-index
  three-bin ladder (EOB decision, run decision, first magnitude) with
  the Kx low/high-frequency split (default 5) — 64 DC + 256 AC bins per
  conditioning table, signs on the fixed bin.  DAC markers (0xFFCC)
  override the defaults.

EXACTNESS CONTRACT: encoder and decoder are exact inverses — pinned by
randomized bin-stream round-trips and full-image round-trips in
tests/test_llm_ops.py::TestJpegArithmetic, and by q409's closed-form
pixel-checksum oracle (block-constant content at quant=1 is DC-exact,
the q387/q395 discipline).  The Qe state table is transcribed from the
public T.81 Table D.3; since the container offers no external
arithmetic-JPEG codec to cross-check byte streams against, external
interop rests on that transcription while ALL in-repo correctness is
independent of it (both halves share the table).

Reference parity: /root/reference has no arithmetic path at all — its
decoder hard-rejects SOF9 (this repo's previous rounds did the same at
jpeg.py:310).  This removes that gate for the sequential case;
progressive-arithmetic (SOF10) and 12-bit remain documented gates.
"""

from __future__ import annotations

import struct

from .jpeg import (
    JpegError,
    _ZIGZAG,
    _assemble,
    _build_component_planes,
    _fdct2,
    _idct2,
    _seg,
)

__all__ = [
    "QE_TABLE",
    "ArithEncoder",
    "ArithDecoder",
    "encode_jpeg_arithmetic",
    "decode_scan_arith",
]

# T.81 Table D.3 — Qe values and probability estimation state machine:
# (Qe, Next_Index_MPS, Next_Index_LPS, Switch_MPS).  Entry 113 is the
# conventional FIXED ~0.5 bin (self-looping, never adapts) used for sign
# decisions (F.1.4.4.1.2 "fixed equiprobable" convention).
QE_TABLE = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1),
    (0x5A1D, 113, 113, 0),  # 113: fixed ~0.5, self-looping (sign bin)
)

FIXED_BIN = 113


class ArithEncoder:
    """QM arithmetic encoder (T.81 Annex D structure).

    Interval/code discipline: the pending byte list is the big-endian
    binary expansion of the final code value (the interval's lower
    bound); carries propagate backward through pending bytes; the
    FF-00 byte stuffing of D.1.6 is applied by :meth:`flush`.  The
    initial bit-countdown of 11 aligns the first emitted byte with
    fraction bits 1..8 (the Annex D register layout)."""

    def __init__(self) -> None:
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.pending = bytearray()

    def _byte_out(self) -> None:
        t = self.c >> 19
        if t > 0xFF:  # carry: propagate into already-pending bytes
            i = len(self.pending) - 1
            while i >= 0 and self.pending[i] == 0xFF:
                self.pending[i] = 0x00
                i -= 1
            if i < 0:
                raise JpegError("arithmetic encoder carry underflow")
            self.pending[i] += 1
            t &= 0xFF
        self.pending.append(t)
        self.c &= 0x7FFFF

    def _renorm(self) -> None:
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byte_out()
                self.ct = 8

    def encode(self, st: bytearray, i: int, bit: int) -> None:
        """Encode one binary decision against adaptive bin ``st[i]``
        (packed ``(index << 1) | mps``)."""
        state = st[i]
        idx, mps = state >> 1, state & 1
        qe, nmps, nlps, switch = QE_TABLE[idx]
        a_new = self.a - qe
        if bit == mps:
            if a_new >= 0x8000:
                self.a = a_new
                return  # no renorm -> no adaptation (QM rule)
            if a_new < qe:  # conditional exchange: MPS takes the top
                self.c += a_new
                self.a = qe
            else:
                self.a = a_new
            st[i] = (nmps << 1) | mps
        else:
            if a_new < qe:  # conditional exchange: LPS keeps the bottom
                self.a = a_new
            else:
                self.c += a_new
                self.a = qe
            if switch:
                mps ^= 1
            st[i] = (nlps << 1) | mps
        self._renorm()

    def flush(self) -> bytes:
        """Drain the full code window (ct + 24 single-bit shifts so every
        window bit reaches a byte boundary), then FF-00 byte-stuff."""
        for _ in range(self.ct + 24):
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byte_out()
                self.ct = 8
        out = bytearray()
        for b in self.pending:
            out.append(b)
            if b == 0xFF:
                out.append(0x00)  # D.1.6 byte stuffing
        # trailing zero bytes carry no information (decoder feeds zeros
        # at the entropy segment's end) — trim them
        while out and out[-1] == 0x00 and (len(out) < 2 or out[-2] != 0xFF):
            out.pop()
        return bytes(out)


class ArithDecoder:
    """QM arithmetic decoder — exact inverse of :class:`ArithEncoder`.

    Consumes the entropy segment starting at ``pos``; FF-00 unstuffs;
    a marker (FF followed by non-zero) terminates the segment, after
    which zero bits feed in (T.81 F.2.2.5).  ``end_pos`` reports where
    the terminating marker begins."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.end: int | None = None
        self._bits: list[int] = []
        self._bitpos = 0
        self.a = 0x10000
        self.cw = (self._next_byte() << 8) | self._next_byte()

    def _next_byte(self) -> int:
        if self.end is not None:
            return 0
        if self.pos >= len(self.data):
            self.end = self.pos
            return 0
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
            if nxt == 0x00:
                self.pos += 2
                return 0xFF
            self.end = self.pos  # marker terminates the segment
            return 0
        self.pos += 1
        return b

    def _next_bit(self) -> int:
        if self._bitpos == 0:
            self._cur = self._next_byte()
            self._bitpos = 8
        self._bitpos -= 1
        return (self._cur >> self._bitpos) & 1

    def decode(self, st: bytearray, i: int) -> int:
        state = st[i]
        idx, mps = state >> 1, state & 1
        qe, nmps, nlps, switch = QE_TABLE[idx]
        a_new = self.a - qe
        if self.cw < a_new:
            if a_new >= 0x8000:
                self.a = a_new
                return mps
            if a_new < qe:  # exchange: bottom region is the LPS
                bit = mps ^ 1
                if switch:
                    mps ^= 1
                st[i] = (nlps << 1) | mps
            else:
                bit = mps
                st[i] = (nmps << 1) | mps
            self.a = a_new
        else:
            self.cw -= a_new
            self.a = qe
            if a_new < qe:  # exchange: top region is the MPS
                bit = mps
                st[i] = (nmps << 1) | mps
            else:
                bit = mps ^ 1
                if switch:
                    mps ^= 1
                st[i] = (nlps << 1) | mps
        while self.a < 0x8000:
            self.a <<= 1
            self.cw = (self.cw << 1) | self._next_bit()
        return bit

    def end_pos(self) -> int:
        return self.end if self.end is not None else self.pos


# ---------------------------------------------------------------------------
# T.81 Annex F sequential statistical model (DC: F.1.4.4.1, AC: F.1.4.4.2)
# ---------------------------------------------------------------------------

DC_STAT_BINS = 64
AC_STAT_BINS = 256


def _dc_category(m: int, sign: int, lo: int, up: int) -> int:
    """F.1.4.4.1.2: classify a just-coded diff magnitude category ``m``
    into the next block's conditioning context (0 zero / 4+4*sign small /
    12+4*sign large, under bounds L, U)."""
    if m < ((1 << lo) >> 1):
        return 0
    if m > ((1 << up) >> 1):
        return 12 + 4 * sign
    return 4 + 4 * sign


def _decode_dc(dec, st, ctx, lo, up):
    """Figures F.19-F.24 DC path: returns (diff, next_context)."""
    if dec.decode(st, ctx) == 0:
        return 0, 0
    sign = dec.decode(st, ctx + 1)
    p = ctx + 2 + sign
    m = dec.decode(st, p)
    if m != 0:
        p = 20  # X1
        while dec.decode(st, p):
            m <<= 1
            if m == 0x8000:
                raise JpegError("arithmetic DC magnitude ladder overran")
            p += 1
    nxt = _dc_category(m, sign, lo, up)
    v = m
    p += 14  # magnitude bit bins ride 14 above the category bin
    while m > 1:
        m >>= 1
        if dec.decode(st, p):
            v |= m
    v += 1
    return (-v if sign else v), nxt


def _encode_dc(enc, st, ctx, lo, up, diff):
    """Figures F.4-F.9 DC path: returns the next context."""
    if diff == 0:
        enc.encode(st, ctx, 0)
        return 0
    enc.encode(st, ctx, 1)
    sign = 1 if diff < 0 else 0
    v = -diff if sign else diff
    enc.encode(st, ctx + 1, sign)
    p = ctx + 2 + sign
    v -= 1
    m = 0
    if v:
        enc.encode(st, p, 1)
        m = 1
        p = 20
        v2 = v
        while v2 > 1:
            v2 >>= 1
            enc.encode(st, p, 1)
            m <<= 1
            p += 1
    enc.encode(st, p, 0)
    nxt = _dc_category(m, sign, lo, up)
    p += 14
    while m > 1:
        m >>= 1
        enc.encode(st, p, 1 if (v & m) else 0)
    return nxt


def _decode_ac(dec, st, fixed, kx):
    """F.2.4.2 AC path for one block: returns zigzag-order coefficient
    list positions 1..63 (values, unquantized)."""
    out = [0] * 64
    k = 1
    while k <= 63:
        base = 3 * (k - 1)
        if dec.decode(st, base):  # EOB
            break
        while dec.decode(st, base + 1) == 0:
            k += 1
            if k > 63:
                raise JpegError("arithmetic AC run past block end")
            base = 3 * (k - 1)
        sign = dec.decode(fixed, 0)
        p = base + 2
        m = dec.decode(st, p)
        if m != 0:
            if dec.decode(st, p):
                m = 2
                p = 189 if k <= kx else 217
                while dec.decode(st, p):
                    m <<= 1
                    if m == 0x8000:
                        raise JpegError(
                            "arithmetic AC magnitude ladder overran"
                        )
                    p += 1
        v = m
        p += 14
        while m > 1:
            m >>= 1
            if dec.decode(st, p):
                v |= m
        v += 1
        out[k] = -v if sign else v
        k += 1
    return out


def _encode_ac(enc, st, fixed, kx, zz):
    """F.1.4.4.2 AC path for one block (zigzag coefficients 1..63)."""
    ke = 63
    while ke > 0 and zz[ke] == 0:
        ke -= 1
    k = 1
    while k <= ke:
        base = 3 * (k - 1)
        enc.encode(st, base, 0)  # not EOB
        while zz[k] == 0:
            enc.encode(st, base + 1, 0)
            k += 1
            base = 3 * (k - 1)
        enc.encode(st, base + 1, 1)
        v = zz[k]
        sign = 1 if v < 0 else 0
        if sign:
            v = -v
        enc.encode(fixed, 0, sign)
        p = base + 2
        v -= 1
        m = 0
        if v:
            enc.encode(st, p, 1)
            m = 1
            if v > 1:
                enc.encode(st, p, 1)
                m = 2
                p = 189 if k <= kx else 217
                v2 = v
                v2 >>= 1
                while v2 > 1:
                    v2 >>= 1
                    enc.encode(st, p, 1)
                    m <<= 1
                    p += 1
        enc.encode(st, p, 0)
        p += 14
        while m > 1:
            m >>= 1
            enc.encode(st, p, 1 if (v & m) else 0)
        k += 1
    if k <= 63:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


# ---------------------------------------------------------------------------
# scan decode / full-image encode (sequential interleaved, SOF9)
# ---------------------------------------------------------------------------


def decode_scan_arith(
    data: bytes,
    pos: int,
    frame: tuple,
    scan: list[tuple[int, int, int]],
    qtables: dict[int, list[int]],
    dac: dict[tuple[int, int], int],
    restart_interval: int,
) -> tuple[int, int, int, bytes]:
    """Sequential arithmetic scan decode — the SOF9 twin of
    jpeg._decode_scan, dispatched from jpeg.decode_jpeg.  ``dac`` maps
    (class, table_id) -> conditioning byte from DAC segments (class 0:
    (U << 4) | L, class 1: Kx); defaults L=0, U=1, Kx=5 per T.81.
    RSTn markers re-initialize the coder, every statistics bin, the DC
    contexts and predictions (F.2.4.3)."""
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        bytearray(mcux * ch * 8 * mcuy * cv * 8) for _cid, ch, cv, _tq in comps
    ]

    def fresh_stats():
        dc = {td: bytearray(DC_STAT_BINS) for _ci, td, _ta in scan}
        ac = {ta: bytearray(AC_STAT_BINS) for _ci, _td, ta in scan}
        return dc, ac

    def conditioning(td: int, ta: int) -> tuple[int, int, int]:
        b = dac.get((0, td), 0x10)  # default L=0, U=1
        lo, up = b & 0x0F, b >> 4
        if not (0 <= lo <= up <= 15):
            raise JpegError(f"bad DC conditioning L={lo} U={up}")
        kx = dac.get((1, ta), 5)
        if not 1 <= kx <= 63:
            raise JpegError(f"bad AC conditioning Kx={kx}")
        return lo, up, kx

    dec = ArithDecoder(data, pos)
    dc_stats, ac_stats = fresh_stats()
    fixed = bytearray([FIXED_BIN << 1])
    dc_ctx = [0] * len(comps)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                # F.2.4.3: byte-aligned RSTn, then full re-init
                rp = dec.end_pos()
                if rp + 2 > len(data) or data[rp] != 0xFF or not (
                    0xD0 <= data[rp + 1] <= 0xD7
                ):
                    raise JpegError("expected RST marker in arithmetic scan")
                want = (mcu_count // restart_interval - 1) % 8
                if data[rp + 1] - 0xD0 != want:
                    raise JpegError(
                        f"RST index {data[rp + 1] - 0xD0} != expected {want}"
                    )
                dec = ArithDecoder(data, rp + 2)
                dc_stats, ac_stats = fresh_stats()
                fixed = bytearray([FIXED_BIN << 1])
                dc_ctx = [0] * len(comps)
                preds = [0] * len(comps)
            for ci, td, ta in scan:
                _cid, ch, cv, tq = comps[ci]
                if tq not in qtables:
                    raise JpegError(f"missing quant table {tq}")
                qt = qtables[tq]
                lo, up, kx = conditioning(td, ta)
                for by in range(cv):
                    for bx in range(ch):
                        diff, dc_ctx[ci] = _decode_dc(
                            dec, dc_stats[td], dc_ctx[ci], lo, up
                        )
                        preds[ci] += diff
                        zz = _decode_ac(dec, ac_stats[ta], fixed, kx)
                        coef = [0.0] * 64
                        coef[0] = preds[ci] * qt[0]
                        for k in range(1, 64):
                            if zz[k]:
                                coef[_ZIGZAG[k]] = zz[k] * qt[k]
                        px = _idct2(coef)
                        pw = mcux * ch * 8
                        ox = (mx * ch + bx) * 8
                        oy = (my * cv + by) * 8
                        plane = planes[ci]
                        for yy in range(8):
                            row = (oy + yy) * pw + ox
                            for xx in range(8):
                                v = int(round(px[yy * 8 + xx])) + 128
                                plane[row + xx] = (
                                    0 if v < 0 else (255 if v > 255 else v)
                                )
            mcu_count += 1
    return _assemble(w, h, comps, planes, mcux, hmax, vmax)


def encode_jpeg_arithmetic(
    width: int,
    height: int,
    pixels: bytes,
    *,
    channels: int = 1,
    quant: int = 1,
    subsample: bool = False,
) -> bytes:
    """Arithmetic-coded (SOF9) sequential JPEG encoder — the fixture half
    of the decode path, mirroring jpeg.encode_jpeg's structure: uniform
    quant table, interleaved single scan, DAC segment carrying the
    default conditioning (L=0, U=1, Kx=5) explicitly.  With ``quant=1``
    block-constant grayscale round-trips pixel-exactly (the q387/q395
    discipline q409 relies on)."""
    if channels not in (1, 3):
        raise JpegError(f"channels must be 1 or 3, got {channels}")
    if len(pixels) != width * height * channels:
        raise JpegError("pixel buffer size mismatch")
    if quant < 1 or quant > 255:
        raise JpegError("quant must be 1..255")
    qt = [quant] * 64
    planes, samp = _build_component_planes(
        width, height, pixels, channels, subsample
    )
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    dims = []
    for sh, sv in samp:
        pw = (width * sh + hmax - 1) // hmax
        ph = (height * sv + vmax - 1) // vmax
        dims.append((pw, ph))
    out = bytearray(b"\xff\xd8")
    out += _seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += _seg(0xDB, bytes([0x00]) + bytes(qt))
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([len(planes)])
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
    out += _seg(0xC9, sof)  # SOF9: extended sequential, arithmetic
    # DAC: DC table 0 conditioning (U=1, L=0), AC table 0 Kx=5
    out += _seg(0xCC, bytes([0x00, 0x10, 0x10, 5]))
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    enc = ArithEncoder()
    dc_stats = bytearray(DC_STAT_BINS)
    ac_stats = bytearray(AC_STAT_BINS)
    fixed = bytearray([FIXED_BIN << 1])
    dc_ctx = [0] * len(planes)
    preds = [0] * len(planes)
    from .jpeg import _plane_blocks

    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (sh, sv) in enumerate(samp):
                pw, ph = dims[ci]
                for by in range(sv):
                    for bx in range(sh):
                        blk = _plane_blocks(
                            planes[ci], pw, ph,
                            (mx * sh + bx) * 8, (my * sv + by) * 8,
                        )
                        coef = _fdct2(blk)
                        zz = [
                            int(round(coef[_ZIGZAG[k]] / qt[k]))
                            for k in range(64)
                        ]
                        diff = zz[0] - preds[ci]
                        preds[ci] = zz[0]
                        dc_ctx[ci] = _encode_dc(
                            enc, dc_stats, dc_ctx[ci], 0, 1, diff
                        )
                        _encode_ac(enc, ac_stats, fixed, 5, zz)
    out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)
