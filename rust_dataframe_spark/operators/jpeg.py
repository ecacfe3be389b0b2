"""Pure-stdlib baseline JPEG codec (ITU T.81 sequential DCT, JFIF) — the
last fake-decode surface closed for real.

The container has no PIL/ffmpeg, but BASELINE JPEG needs neither: markers
are length-framed segments, entropy coding is canonical Huffman over
(run, size) symbols, and the transform is the 8x8 type-II DCT — all
implementable on the stdlib (struct + math).  This module covers the
subset that dominates real corpora:

* decode — baseline sequential (SOF0), 8-bit, 1 or 3 components,
  interleaved single scan, arbitrary DHT/DQT tables (incl. the Annex K
  defaults real encoders emit), 4:4:4 / 4:2:2 / 4:2:0 chroma sampling
  (H, V in {1, 2}), restart intervals (DRI + RSTn with DC-predictor
  reset).  Progressive (SOF2), arithmetic coding, 12-bit precision,
  CMYK, and hierarchical modes raise :class:`JpegError`, and the
  multimodal layer falls back to its documented deterministic fake —
  same policy as the PNG/GIF/WAV codecs.
* encode — a minimal conformant encoder for test fixtures (the q327
  pattern: synthesize REAL byte-accurate payloads deterministically
  instead of checking in binaries): uniform quant tables, flat-length
  canonical Huffman tables (12 DC categories at 4 bits, all 162 AC
  run/size symbols at 8 bits — valid, prefix-free, just less compact
  than Annex K; any spec decoder reads them fine), optional 2x2 chroma
  subsampling so the decoder's 4:2:0 upsampling path is testable.

Exactness contract the catalog oracle leans on: with the all-ones quant
table, a block-constant grayscale image round-trips PIXEL-EXACTLY —
the FDCT of a constant block has one DC coefficient (the AC sums cancel
to ~1e-13 and quantize to zero) and the DC-only IDCT reproduces the
constant to within ~2e-13 before the integer round.  That makes the
decoded pixel checksum a closed-form function of the synthesis params,
DuckDB-replayable (q387).  General content round-trips within a small
bounded error (unit-pinned in tests/test_llm_ops.py::TestJpegReal).

Scale note: like png.py/gif.py, decoding runs executor-side inside
Arrow-batched mapInPandas (operators/multimodal.py) — the driver never
touches pixel bytes; this module is plain per-payload Python on workers.
"""

from __future__ import annotations

import math
import struct

__all__ = ["JpegError", "decode_jpeg", "encode_jpeg", "is_jpeg"]


class JpegError(ValueError):
    """Raised for malformed input or a JPEG variant outside the supported
    baseline subset (progressive / 12-bit / arithmetic / CMYK) — callers
    fall back to the documented fake-decode stand-in."""


def is_jpeg(data: bytes) -> bool:
    return bytes(data[:2]) == b"\xff\xd8"


# zigzag scan order: _ZIGZAG[k] = raster index of the k-th zigzag position
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# orthogonal 8-point DCT-II matrix: _A[u][x] = c(u)/2 * cos((2x+1)u*pi/16),
# c(0) = 1/sqrt(2), else 1.  Forward: S = A s; inverse: s = A^T S.
_A = [
    [
        (math.sqrt(0.5) if u == 0 else 1.0)
        / 2.0
        * math.cos((2 * x + 1) * u * math.pi / 16.0)
        for x in range(8)
    ]
    for u in range(8)
]


def _fdct2(block: list[float]) -> list[float]:
    tmp = [0.0] * 64
    for r in range(8):  # rows
        for u in range(8):
            tmp[r * 8 + u] = sum(_A[u][x] * block[r * 8 + x] for x in range(8))
    out = [0.0] * 64
    for c in range(8):  # columns
        for u in range(8):
            out[u * 8 + c] = sum(_A[u][y] * tmp[y * 8 + c] for y in range(8))
    return out


def _idct2(coef: list[float]) -> list[float]:
    tmp = [0.0] * 64
    for c in range(8):  # columns
        for y in range(8):
            tmp[y * 8 + c] = sum(_A[u][y] * coef[u * 8 + c] for u in range(8))
    out = [0.0] * 64
    for r in range(8):  # rows
        for x in range(8):
            out[r * 8 + x] = sum(_A[u][x] * tmp[r * 8 + u] for u in range(8))
    return out


def _build_huff(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman from a DHT (bits[1..16], values) to
    {(length, code): symbol} — the generic decode map (T.81 C.2)."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 byte-unstuffing and RSTn
    awareness (T.81 F.2.2.5)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0
        self.marker_hit = False

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise JpegError("entropy data truncated")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                # a real marker terminates entropy data; feed 0 bits so a
                # final partial MCU's padding reads cleanly, flag it
                self.marker_hit = True
                self.buf = (self.buf << 8) & 0xFFFFFFFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.buf = ((self.buf << 8) | b) & 0xFFFFFFFF
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if (length, code) in table:
                return table[(length, code)]
        raise JpegError("invalid Huffman code in entropy data")

    def restart(self, expected: int) -> None:
        """Byte-align and consume the RSTn marker whose index is
        ``expected`` (mod 8, T.81 F.2.2.5).  RSTm markers cycle m = 0..7;
        a dropped or duplicated restart interval therefore shows up as an
        index mismatch — raise :class:`JpegError` instead of silently
        resynchronizing to the wrong interval and decoding misaligned
        pixels (round-6 ADVICE; matches the parser's fail-loud posture).
        The forward scan is bounded to a few padding bytes: between the
        end of an entropy segment and its RSTn only 0xFF fill bytes are
        legal (B.2.4.x)."""
        self.buf = 0
        self.nbits = 0
        self.marker_hit = False
        skipped = 0
        while (
            self.pos + 1 < len(self.data)
            and not (
                self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7
            )
        ):
            self.pos += 1
            skipped += 1
            if skipped > 8:
                raise JpegError(
                    "restart marker not found within padding bounds "
                    "(corrupt entropy segment)"
                )
        if self.pos + 1 >= len(self.data):
            raise JpegError("missing restart marker")
        got = self.data[self.pos + 1] - 0xD0
        if got != expected % 8:
            raise JpegError(
                f"restart marker out of sequence: expected RST{expected % 8}, "
                f"got RST{got} (dropped or duplicated restart interval)"
            )
        self.pos += 2


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG to ``(width, height, channels, pixels)``.

    ``pixels`` is ``height * width * channels`` bytes, row-major
    (channels = 1 gray or 3 RGB via JFIF BT.601).  Raises
    :class:`JpegError` for anything outside baseline sequential 8-bit.
    """
    data = bytes(data)
    if not is_jpeg(data):
        raise JpegError("not a JPEG (bad SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (W, H, comps) with comps = [(cid, h, v, tq)]
    restart_interval = 0
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at offset {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(data):
            break
        marker = data[pos + 1]
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # standalone markers (stray SOI, TEM, RSTn): no length field
            pos += 2
            continue
        if marker == 0xD9:  # EOI before SOS
            raise JpegError("EOI before scan data")
        if pos + 4 > len(data):
            raise JpegError("truncated marker segment header")
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if seglen < 2:
            raise JpegError("invalid segment length")
        body = data[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise JpegError("truncated segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise JpegError("16-bit quant tables unsupported (8-bit only)")
                qtables[tq] = list(body[p + 1 : p + 65])
                if len(qtables[tq]) != 64:
                    raise JpegError("short DQT")
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p + 17 <= len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                if len(vals) != n:
                    raise JpegError("short DHT")
                htables[(tc, th)] = _build_huff(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (both sequential 8-bit ok)
            if len(body) < 6:
                raise JpegError("short SOF segment")
            prec, h, w, nf = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise JpegError(f"{prec}-bit precision unsupported (8 only)")
            if w == 0 or h == 0:
                raise JpegError("zero-dimension frame")
            if nf not in (1, 3):
                raise JpegError(f"{nf}-component images unsupported (1 or 3)")
            if len(body) < 6 + 3 * nf:
                raise JpegError("short SOF component list")
            comps = []
            for i in range(nf):
                cid = body[6 + 3 * i]
                hv = body[7 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, body[8 + 3 * i]))
                if not (1 <= hv >> 4 <= 2 and 1 <= hv & 0x0F <= 2):
                    raise JpegError("sampling factors beyond 2 unsupported")
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError("non-baseline SOF (progressive/lossless/arithmetic)")
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise JpegError("short DRI segment")
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise JpegError("SOS before SOF")
            if len(body) < 1:
                raise JpegError("short SOS segment")
            ns = body[0]
            if len(body) < 1 + 2 * ns:
                raise JpegError("short SOS component list")
            scan = []  # (comp_idx, dc_table, ac_table)
            comp_ids = [c[0] for c in frame[2]]
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                if cs not in comp_ids:
                    raise JpegError("scan references unknown component")
                scan.append((comp_ids.index(cs), tdta >> 4, tdta & 0x0F))
            if ns != len(comp_ids):
                raise JpegError("non-interleaved multi-scan unsupported")
            return _decode_scan(
                data, pos + 2 + seglen, frame, scan, qtables, htables,
                restart_interval,
            )
        # APPn / COM / others: skip
        pos += 2 + seglen
    raise JpegError("no scan data (missing SOS)")


def _decode_scan(
    data: bytes,
    pos: int,
    frame: tuple,
    scan: list[tuple[int, int, int]],
    qtables: dict[int, list[int]],
    htables: dict,
    restart_interval: int,
) -> tuple[int, int, int, bytes]:
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # per-component padded planes
    planes = []
    for cid, ch, cv, tq in comps:
        planes.append(bytearray(mcux * ch * 8 * mcuy * cv * 8))
    r = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r.restart(mcu_count // restart_interval - 1)
                preds = [0] * len(comps)
            for ci, td, ta in scan:
                cid, ch, cv, tq = comps[ci]
                if tq not in qtables:
                    raise JpegError(f"missing quant table {tq}")
                qt = qtables[tq]
                dc_tab = htables.get((0, td))
                ac_tab = htables.get((1, ta))
                if dc_tab is None or ac_tab is None:
                    raise JpegError("missing Huffman table")
                for by in range(cv):
                    for bx in range(ch):
                        coef = [0.0] * 64
                        t = r.decode_huff(dc_tab)
                        diff = _extend(r.receive(t), t)
                        preds[ci] += diff
                        coef[0] = preds[ci] * qt[0]
                        k = 1
                        while k < 64:
                            rs = r.decode_huff(ac_tab)
                            rr, ss = rs >> 4, rs & 0x0F
                            if ss == 0:
                                if rr == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                raise JpegError("AC run past block end")
                            coef[_ZIGZAG[k]] = _extend(r.receive(ss), ss) * qt[k]
                            k += 1
                        px = _idct2(coef)
                        pw = mcux * ch * 8
                        ox = (mx * ch + bx) * 8
                        oy = (my * cv + by) * 8
                        plane = planes[ci]
                        for yy in range(8):
                            row = (oy + yy) * pw + ox
                            for xx in range(8):
                                v = int(round(px[yy * 8 + xx])) + 128
                                plane[row + xx] = 0 if v < 0 else (255 if v > 255 else v)
            mcu_count += 1
    # upsample to full resolution + color convert
    nch = len(comps)
    out = bytearray(w * h * nch)
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        pw = mcux * ch * 8
        plane = planes[ci]
        for y in range(h):
            sy = y * cv // vmax
            dst = y * w * nch + ci
            src = sy * pw
            for x in range(w):
                out[dst + x * nch] = plane[src + x * ch // hmax]
    if nch == 3:
        # JFIF YCbCr -> RGB (BT.601), rounded and clamped
        for i in range(0, len(out), 3):
            y, cb, cr = out[i], out[i + 1] - 128, out[i + 2] - 128
            rr = int(round(y + 1.402 * cr))
            gg = int(round(y - 0.344136 * cb - 0.714136 * cr))
            bb = int(round(y + 1.772 * cb))
            out[i] = 0 if rr < 0 else (255 if rr > 255 else rr)
            out[i + 1] = 0 if gg < 0 else (255 if gg > 255 else gg)
            out[i + 2] = 0 if bb < 0 else (255 if bb > 255 else bb)
    return w, h, nch, bytes(out)


# ---------------------------------------------------------------------------
# encoder (test-fixture half, the encode_png pattern)
# ---------------------------------------------------------------------------

# flat-length canonical tables: valid, prefix-free, decoder-agnostic.
# DC: categories 0..11 at 4 bits; AC: all 162 (run, size) symbols at 8 bits.
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = list(range(12))
_AC_VALS = [
    rs
    for rs in (
        [0x00, 0xF0]
        + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    )
]
_AC_BITS = [0] * 7 + [len(_AC_VALS)] + [0] * 8


def _encode_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODES = _encode_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _encode_codes(_AC_BITS, _AC_VALS)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, length: int, code: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.put(8 - self.n, (1 << (8 - self.n)) - 1)  # pad with 1s
        return bytes(self.out)


def _size_cat(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _encode_block(
    bw: _BitWriter, block: list[float], qt: list[int], pred: int
) -> int:
    coef = _fdct2(block)
    zz = [int(round(coef[_ZIGZAG[k]] / qt[k])) for k in range(64)]
    diff = zz[0] - pred
    t = _size_cat(diff)
    bw.put(*_DC_CODES[t])
    if t:
        bw.put(t, diff if diff >= 0 else diff + (1 << t) - 1)
    run = 0
    for k in range(1, 64):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            bw.put(*_AC_CODES[0xF0])  # ZRL
            run -= 16
        s = _size_cat(zz[k])
        bw.put(*_AC_CODES[(run << 4) | s])
        v = zz[k]
        bw.put(s, v if v >= 0 else v + (1 << s) - 1)
        run = 0
    if run:
        bw.put(*_AC_CODES[0x00])  # EOB
    return zz[0]


def _plane_blocks(
    plane: list[int], pw: int, ph: int, ox: int, oy: int
) -> list[float]:
    """8x8 block at (ox, oy) with edge replication, level-shifted."""
    blk = [0.0] * 64
    for y in range(8):
        sy = min(ph - 1, oy + y)
        for x in range(8):
            sx = min(pw - 1, ox + x)
            blk[y * 8 + x] = plane[sy * pw + sx] - 128.0
    return blk


def encode_jpeg(
    width: int,
    height: int,
    pixels: bytes,
    *,
    channels: int = 1,
    quant: int = 1,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Minimal baseline JPEG encoder: uniform quant table of ``quant``,
    flat canonical Huffman tables, interleaved single scan.  ``channels``
    1 (gray) or 3 (RGB; JFIF BT.601 to YCbCr); ``subsample=True`` emits
    4:2:0 (2x2 averaged chroma) so decoders' upsampling path is
    exercised.  ``restart_interval > 0`` emits a DRI segment and RSTn
    markers every that-many MCUs (T.81 B.2.4.4) with the mandated DC
    predictor reset — the fixture path for the decoder's restart-index
    validation.  With ``quant=1`` a block-constant grayscale image
    round-trips pixel-exactly (see module docstring)."""
    if channels not in (1, 3):
        raise JpegError(f"channels must be 1 or 3, got {channels}")
    if len(pixels) != width * height * channels:
        raise JpegError("pixel buffer size mismatch")
    if quant < 1 or quant > 255:
        raise JpegError("quant must be 1..255")
    if restart_interval < 0 or restart_interval > 0xFFFF:
        raise JpegError("restart_interval must be 0..65535")
    qt = [quant] * 64
    # build component planes
    if channels == 1:
        planes = [list(pixels)]
        samp = [(1, 1)]
    else:
        ys, cbs, crs = [], [], []
        for i in range(0, len(pixels), 3):
            r, g, b = pixels[i], pixels[i + 1], pixels[i + 2]
            ys.append(min(255, max(0, round(0.299 * r + 0.587 * g + 0.114 * b))))
            cbs.append(
                min(255, max(0, round(-0.168736 * r - 0.331264 * g + 0.5 * b + 128)))
            )
            crs.append(
                min(255, max(0, round(0.5 * r - 0.418688 * g - 0.081312 * b + 128)))
            )
        if subsample:
            cw, chh = (width + 1) // 2, (height + 1) // 2
            def down(p: list[int]) -> list[int]:
                out = []
                for y2 in range(chh):
                    for x2 in range(cw):
                        acc = cnt = 0
                        for dy in (0, 1):
                            for dx in (0, 1):
                                yy, xx = 2 * y2 + dy, 2 * x2 + dx
                                if yy < height and xx < width:
                                    acc += p[yy * width + xx]
                                    cnt += 1
                        out.append(round(acc / cnt))
                return out
            planes = [ys, down(cbs), down(crs)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [ys, cbs, crs]
            samp = [(1, 1), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    dims = []
    for ci, (sh, sv) in enumerate(samp):
        pw = (width * sh + hmax - 1) // hmax
        ph = (height * sv + vmax - 1) // vmax
        dims.append((pw, ph))
    # headers
    out = bytearray(b"\xff\xd8")
    out += _seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += _seg(0xDB, bytes([0x00]) + bytes(qt))
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([len(planes)])
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    # interleaved entropy scan
    bw = _BitWriter()
    preds = [0] * len(planes)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # byte-align (1-padding), emit RSTn with n cycling mod 8,
                # reset DC predictors — mirror of _BitReader.restart
                out += bw.flush()
                bw = _BitWriter()
                out += bytes(
                    [0xFF, 0xD0 + (mcu_count // restart_interval - 1) % 8]
                )
                preds = [0] * len(planes)
            mcu_count += 1
            for ci, (sh, sv) in enumerate(samp):
                pw, ph = dims[ci]
                for by in range(sv):
                    for bx in range(sh):
                        blk = _plane_blocks(
                            planes[ci], pw, ph, (mx * sh + bx) * 8, (my * sv + by) * 8
                        )
                        preds[ci] = _encode_block(bw, blk, qt, preds[ci])
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)
