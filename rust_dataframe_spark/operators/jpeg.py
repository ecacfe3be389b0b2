"""Pure-stdlib baseline JPEG codec (ITU T.81 sequential DCT, JFIF) — the
last fake-decode surface closed for real.

The container has no PIL/ffmpeg, but BASELINE JPEG needs neither: markers
are length-framed segments, entropy coding is canonical Huffman over
(run, size) symbols, and the transform is the 8x8 type-II DCT — all
implementable on the stdlib (struct + math).  This module covers the
subset that dominates real corpora:

* decode — baseline sequential (SOF0) AND progressive (SOF2, round 7 —
  VERDICT r6 #4), 8-bit, 1 or 3 components, arbitrary DHT/DQT tables
  (incl. the Annex K defaults real encoders emit), 4:4:4 / 4:2:2 /
  4:2:0 chroma sampling (H, V in {1, 2}), restart intervals (DRI +
  RSTn with DC-predictor/EOB-run reset and marker-index validation).
  Progressive covers the full T.81 Annex G Huffman scan matrix:
  interleaved and non-interleaved DC first scans, DC successive-
  approximation refinement (1 bit/block), AC spectral-selection first
  scans with EOB-run coding, and AC successive-approximation
  refinement (correction bits) — coefficients accumulate across scans
  and run through the same dequant + IDCT + upsample tail as baseline.
  Arithmetic coding, 12-bit precision, CMYK, and hierarchical modes
  raise :class:`JpegError`, and the multimodal layer falls back to its
  documented deterministic fake — same policy as the PNG/GIF/WAV codecs.
* encode — a minimal conformant encoder for test fixtures (the q327
  pattern: synthesize REAL byte-accurate payloads deterministically
  instead of checking in binaries): uniform quant tables, flat-length
  canonical Huffman tables (12 DC categories at 4 bits, all 162 AC
  run/size symbols at 8 bits — valid, prefix-free, just less compact
  than Annex K; any spec decoder reads them fine), optional 2x2 chroma
  subsampling so the decoder's 4:2:0 upsampling path is testable.
  :func:`encode_jpeg_progressive` emits a 7-scan SOF2 script (DC Al=1 +
  DC refine, luma AC split 1-5/6-63 at Al=1 + two AC refine scans,
  chroma AC at Al=0) exercising every decoder scan kind above.

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

__all__ = [
    "JpegError",
    "decode_jpeg",
    "decode_jpeg_ext",
    "encode_jpeg",
    "encode_jpeg_progressive",
    "is_jpeg",
]


class JpegError(ValueError):
    """Raised for malformed input or a JPEG variant outside the
    supported subset (hierarchical / progressive-arithmetic / CMYK) —
    callers fall back to the documented fake-decode stand-in.
    Sequential arithmetic (SOF9, operators/jpeg_arith.py), 12-bit
    extended sequential (SOF1 via :func:`decode_jpeg_ext`), and
    lossless (SOF3, operators/jpeg_lossless.py) decode for real since
    round 8."""


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
    """Decode a JPEG to ``(width, height, channels, pixels)``.

    ``pixels`` is ``height * width * channels`` bytes, row-major
    (channels = 1 gray or 3 RGB via JFIF BT.601).  This entry keeps the
    historical 8-bit byte contract: 12/16-bit frames (SOF1 12-bit,
    SOF3 lossless at precision > 8) decode for real but must go through
    :func:`decode_jpeg_ext`, which returns the sample depth; asking this
    function for them raises :class:`JpegError` rather than silently
    truncating 16-bit samples to bytes.
    """
    w, h, nch, depth, px = decode_jpeg_ext(data)
    if depth != 8:
        raise JpegError(
            f"{depth}-bit samples: use decode_jpeg_ext (8-bit byte "
            "contract would truncate)"
        )
    return w, h, nch, px


def decode_jpeg_ext(data: bytes) -> tuple[int, int, int, int, bytes]:
    """Decode a JPEG to ``(width, height, channels, depth, pixels)``.

    ``depth`` is the sample precision (8, 12, or the SOF3 lossless
    precision 2..16); ``pixels`` is one byte per sample for depth <= 8,
    else little-endian uint16 per sample.  Dispatches baseline (SOF0),
    extended sequential Huffman at 8 and 12 bits (SOF1), progressive
    (SOF2), sequential arithmetic (SOF9 via jpeg_arith), and lossless
    (SOF3 via jpeg_lossless).  Raises :class:`JpegError` for the
    remaining gates (hierarchical, progressive/lossless arithmetic,
    CMYK)."""
    data = bytes(data)
    if not is_jpeg(data):
        raise JpegError("not a JPEG (bad SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (W, H, comps) with comps = [(cid, h, v, tq)]
    prec = 8
    progressive = False
    arithmetic = False
    lossless = False
    dac: dict[tuple[int, int], int] = {}  # (class, table) -> conditioning
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
        if marker == 0xDB:  # DQT (Pq=0: 8-bit entries, Pq=1: 16-bit)
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq == 0:
                    qtables[tq] = list(body[p + 1 : p + 65])
                    p += 65
                elif pq == 1:
                    raw = body[p + 1 : p + 129]
                    qtables[tq] = [
                        (raw[i] << 8) | raw[i + 1]
                        for i in range(0, len(raw) - 1, 2)
                    ]
                    p += 129
                else:
                    raise JpegError(f"invalid DQT precision {pq}")
                if len(qtables[tq]) != 64:
                    raise JpegError("short DQT")
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
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9):
            # SOF0/1 sequential (SOF1 also at 12-bit, round 8), SOF2
            # progressive, SOF3 lossless (round 8,
            # operators/jpeg_lossless.py), SOF9 sequential arithmetic
            # (operators/jpeg_arith.py)
            progressive = marker == 0xC2
            arithmetic = marker == 0xC9
            lossless = marker == 0xC3
            if len(body) < 6:
                raise JpegError("short SOF segment")
            prec, h, w, nf = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if lossless:
                if not 2 <= prec <= 16:
                    raise JpegError(f"lossless precision {prec} out of 2..16")
            elif prec == 12:
                if marker != 0xC1:
                    raise JpegError(
                        "12-bit precision only supported for extended "
                        "sequential Huffman (SOF1)"
                    )
            elif prec != 8:
                raise JpegError(
                    f"{prec}-bit precision unsupported for this process"
                )
            if w == 0 or h == 0:
                raise JpegError("zero-dimension frame")
            if lossless:
                if not 1 <= nf <= 4:
                    raise JpegError("lossless frames support 1..4 components")
            elif prec == 12:
                if nf != 1:
                    raise JpegError(
                        "12-bit DCT decode is grayscale-only (1 component)"
                    )
            elif nf not in (1, 3):
                raise JpegError(f"{nf}-component images unsupported (1 or 3)")
            if len(body) < 6 + 3 * nf:
                raise JpegError("short SOF component list")
            comps = []
            for i in range(nf):
                cid = body[6 + 3 * i]
                hv = body[7 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, body[8 + 3 * i]))
                if lossless:
                    if hv != 0x11:
                        raise JpegError(
                            "subsampled lossless unsupported (1x1 only)"
                        )
                elif not (1 <= hv >> 4 <= 2 and 1 <= hv & 0x0F <= 2):
                    raise JpegError("sampling factors beyond 2 unsupported")
            frame = (w, h, comps)
        elif marker == 0xDE:  # DHP: hierarchical pyramid (round 9)
            from .jpeg_hier import decode_jpeg_hier

            return decode_jpeg_hier(data)
        elif marker in (0xC5, 0xC6, 0xC7, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(
                "unsupported SOF (progressive/lossless-arithmetic or "
                "hierarchical differential outside a DHP pyramid)"
            )
        elif marker == 0xCC:  # DAC: arithmetic conditioning (T.81 B.2.4.3)
            p = 0
            while p + 2 <= len(body):
                dac[(body[p] >> 4, body[p] & 0x0F)] = body[p + 1]
                p += 2
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise JpegError("short DRI segment")
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise JpegError("SOS before SOF")
            if progressive:
                # the progressive loop owns the rest of the stream (scans
                # interleave with DHT/DQT/DRI segments until EOI)
                w, h, nch, px = _decode_progressive(
                    data, pos, frame, qtables, htables, restart_interval
                )
                return w, h, nch, 8, px
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
            if lossless:
                if len(body) < 4 + 2 * ns:
                    raise JpegError("short lossless SOS tail")
                ss = body[1 + 2 * ns]
                al = body[3 + 2 * ns] & 0x0F
                from .jpeg_lossless import decode_scan_lossless

                w, h, nch, depth, samples = decode_scan_lossless(
                    data, pos + 2 + seglen, frame,
                    [(ci, td) for ci, td, _ta in scan], htables,
                    prec, ss, al, restart_interval,
                )
                if depth <= 8:
                    return w, h, nch, depth, bytes(samples)
                return w, h, nch, depth, struct.pack(
                    f"<{len(samples)}H", *samples
                )
            if ns != len(comp_ids):
                raise JpegError("non-interleaved multi-scan unsupported")
            if arithmetic:
                from .jpeg_arith import decode_scan_arith

                w, h, nch, px = decode_scan_arith(
                    data, pos + 2 + seglen, frame, scan, qtables, dac,
                    restart_interval,
                )
                return w, h, nch, 8, px
            return _decode_scan(
                data, pos + 2 + seglen, frame, scan, qtables, htables,
                restart_interval, prec,
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
    prec: int = 8,
) -> tuple[int, int, int, int, bytes]:
    w, h, comps = frame
    level = 1 << (prec - 1)
    maxval = (1 << prec) - 1
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # per-component padded planes (list-of-int for deep precisions)
    planes = []
    for cid, ch, cv, tq in comps:
        n = mcux * ch * 8 * mcuy * cv * 8
        planes.append(bytearray(n) if prec == 8 else [0] * n)
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
                                v = int(round(px[yy * 8 + xx])) + level
                                plane[row + xx] = (
                                    0 if v < 0 else (maxval if v > maxval else v)
                                )
            mcu_count += 1
    if prec == 8:
        w2, h2, nch, out = _assemble(w, h, comps, planes, mcux, hmax, vmax)
        return w2, h2, nch, 8, out
    # deep (12-bit) path: grayscale-only (enforced at SOF), crop the
    # padded plane and emit little-endian uint16 samples
    pw = mcux * comps[0][1] * 8
    plane = planes[0]
    vals = [plane[y * pw + x] for y in range(h) for x in range(w)]
    return w, h, 1, prec, struct.pack(f"<{len(vals)}H", *vals)


def _assemble(
    w: int,
    h: int,
    comps: list,
    planes: list[bytearray],
    mcux: int,
    hmax: int,
    vmax: int,
) -> tuple[int, int, int, bytes]:
    """Upsample per-component padded planes to full resolution and color
    convert (shared tail of the baseline and progressive decode paths)."""
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
# progressive decode (T.81 Annex G, Huffman coding procedures)
# ---------------------------------------------------------------------------


def _decode_progressive(
    data: bytes,
    pos: int,
    frame: tuple,
    qtables: dict[int, list[int]],
    htables: dict,
    restart_interval: int,
) -> tuple[int, int, int, bytes]:
    """Drive the multi-scan progressive stream from the first SOS marker
    (``pos`` points at its 0xFF) to EOI: coefficients accumulate in
    zigzag order across DC/AC first+refinement scans, then one dequant +
    IDCT + upsample pass produces pixels.  DHT/DQT/DRI segments between
    scans update the live tables, as real encoders emit them."""
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # per-component coefficient store on the PADDED block grid (interleaved
    # DC scans index MCU-padded positions; non-interleaved AC scans index
    # the true grid, a prefix of it).  Values are zigzag-ordered ints.
    dims = []  # (bw_pad, bh_pad, bw_true, bh_true)
    coefs: list[list[list[int]]] = []
    for cid, ch, cv, tq in comps:
        bw_pad, bh_pad = mcux * ch, mcuy * cv
        bw_true = (w * ch + 8 * hmax - 1) // (8 * hmax)
        bh_true = (h * cv + 8 * vmax - 1) // (8 * vmax)
        dims.append((bw_pad, bh_pad, bw_true, bh_true))
        coefs.append([[0] * 64 for _ in range(bw_pad * bh_pad)])
    comp_ids = [c[0] for c in comps]
    saw_scan = False
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at offset {pos}")
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(data):
            break
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > len(data):
            raise JpegError("truncated marker segment header")
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if seglen < 2:
            raise JpegError("invalid segment length")
        body = data[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise JpegError("truncated segment")
        if marker == 0xDB:
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise JpegError("16-bit quant tables unsupported (8-bit only)")
                qtables[tq] = list(body[p + 1 : p + 65])
                if len(qtables[tq]) != 64:
                    raise JpegError("short DQT")
                p += 65
        elif marker == 0xC4:
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
        elif marker == 0xDD:
            if len(body) < 2:
                raise JpegError("short DRI segment")
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            if len(body) < 4:
                raise JpegError("short SOS segment")
            ns = body[0]
            if len(body) < 4 + 2 * ns:
                raise JpegError("short SOS component list")
            scan = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                if cs not in comp_ids:
                    raise JpegError("scan references unknown component")
                scan.append((comp_ids.index(cs), tdta >> 4, tdta & 0x0F))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
            pos = _decode_prog_scan(
                data, pos + 2 + seglen, comps, dims, coefs, scan,
                htables, ss, se, ah, al, mcux, mcuy, restart_interval,
            )
            saw_scan = True
            continue
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):
            raise JpegError("second SOF in progressive stream")
        pos += 2 + seglen
    if not saw_scan:
        raise JpegError("no scan data in progressive stream")
    # dequantize + IDCT every block into padded byte planes, then the
    # shared upsample/color tail
    planes = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        if tq not in qtables:
            raise JpegError(f"missing quant table {tq}")
        qt = qtables[tq]
        bw_pad, bh_pad, _bw, _bh = dims[ci]
        pw = bw_pad * 8
        plane = bytearray(pw * bh_pad * 8)
        for bi, zz in enumerate(coefs[ci]):
            coef = [0.0] * 64
            for k in range(64):
                if zz[k]:
                    coef[_ZIGZAG[k]] = zz[k] * qt[k]
            px = _idct2(coef)
            ox = (bi % bw_pad) * 8
            oy = (bi // bw_pad) * 8
            for yy in range(8):
                row = (oy + yy) * pw + ox
                for xx in range(8):
                    v = int(round(px[yy * 8 + xx])) + 128
                    plane[row + xx] = 0 if v < 0 else (255 if v > 255 else v)
        planes.append(plane)
    return _assemble(w, h, comps, planes, mcux, hmax, vmax)


def _skip_to_marker(data: bytes, pos: int) -> int:
    """Advance past any entropy padding to the next true marker (not a
    stuffed 0xFF00, not a fill 0xFF)."""
    while pos + 1 < len(data):
        if data[pos] == 0xFF and data[pos + 1] not in (0x00,):
            # collapse fill bytes: point at the LAST 0xFF before the code
            while pos + 2 < len(data) and data[pos + 1] == 0xFF:
                pos += 1
            return pos
        pos += 1
    return len(data)


def _decode_prog_scan(
    data: bytes,
    pos: int,
    comps: list,
    dims: list,
    coefs: list,
    scan: list[tuple[int, int, int]],
    htables: dict,
    ss: int,
    se: int,
    ah: int,
    al: int,
    mcux: int,
    mcuy: int,
    restart_interval: int,
) -> int:
    """Decode ONE progressive scan's entropy data into ``coefs``; returns
    the stream position of the terminating marker."""
    r = _BitReader(data, pos)
    if ss == 0:
        if se != 0:
            raise JpegError("progressive DC scan must have Se=0")
        _prog_dc_scan(r, comps, dims, coefs, scan, htables, ah, al,
                      mcux, mcuy, restart_interval)
    else:
        if len(scan) != 1:
            raise JpegError("progressive AC scan must be single-component")
        if not (1 <= ss <= se <= 63):
            raise JpegError("invalid spectral selection")
        _prog_ac_scan(r, dims, coefs, scan[0], htables, ss, se, ah, al,
                      restart_interval)
    return _skip_to_marker(data, r.pos)


def _prog_dc_scan(
    r: "_BitReader",
    comps: list,
    dims: list,
    coefs: list,
    scan: list[tuple[int, int, int]],
    htables: dict,
    ah: int,
    al: int,
    mcux: int,
    mcuy: int,
    restart_interval: int,
) -> None:
    """DC first (Ah=0: Huffman diffs, value << Al) or refinement (Ah>0:
    one bit per block ORed at Al) — interleaved over the MCU grid when the
    scan has every component, else over the component's true block grid
    (G.1.1/G.1.2.1)."""
    preds = [0] * len(comps)
    interleaved = len(scan) > 1 or len(comps) == 1
    if ah == 0:
        tabs = {}
        for ci, td, _ta in scan:
            tab = htables.get((0, td))
            if tab is None:
                raise JpegError("missing DC Huffman table")
            tabs[ci] = tab
    if interleaved:
        mcu_count = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    r.restart(mcu_count // restart_interval - 1)
                    preds = [0] * len(comps)
                for ci, td, _ta in scan:
                    _cid, ch, cv, _tq = comps[ci]
                    bw_pad = dims[ci][0]
                    for by in range(cv):
                        for bx in range(ch):
                            zz = coefs[ci][(my * cv + by) * bw_pad + mx * ch + bx]
                            if ah == 0:
                                t = r.decode_huff(tabs[ci])
                                preds[ci] += _extend(r.receive(t), t)
                                zz[0] = preds[ci] << al
                            else:
                                if r.read_bit():
                                    zz[0] |= 1 << al
                mcu_count += 1
    else:
        ci, td, _ta = scan[0]
        bw_pad, _bh_pad, bw_true, bh_true = dims[ci]
        blk_count = 0
        for by in range(bh_true):
            for bx in range(bw_true):
                if restart_interval and blk_count and blk_count % restart_interval == 0:
                    r.restart(blk_count // restart_interval - 1)
                    preds[ci] = 0
                zz = coefs[ci][by * bw_pad + bx]
                if ah == 0:
                    t = r.decode_huff(tabs[ci])
                    preds[ci] += _extend(r.receive(t), t)
                    zz[0] = preds[ci] << al
                else:
                    if r.read_bit():
                        zz[0] |= 1 << al
                blk_count += 1


def _prog_ac_scan(
    r: "_BitReader",
    dims: list,
    coefs: list,
    comp_scan: tuple[int, int, int],
    htables: dict,
    ss: int,
    se: int,
    ah: int,
    al: int,
    restart_interval: int,
) -> None:
    """AC scans over one component's true block grid: first scans use
    EOB-run coding (G.1.2.2), refinement scans add correction bits
    (G.1.2.3 — the libjpeg-documented procedure from the public spec)."""
    ci, _td, ta = comp_scan
    tab = htables.get((1, ta))
    if tab is None:
        raise JpegError("missing AC Huffman table")
    bw_pad, _bh_pad, bw_true, bh_true = dims[ci]
    eobrun = 0
    p1, m1 = 1 << al, -1 << al
    blk_count = 0
    for by in range(bh_true):
        for bx in range(bw_true):
            if restart_interval and blk_count and blk_count % restart_interval == 0:
                r.restart(blk_count // restart_interval - 1)
                eobrun = 0
            blk_count += 1
            zz = coefs[ci][by * bw_pad + bx]
            if ah == 0:
                # first scan at this Al: plain EOB-run coding
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = r.decode_huff(tab)
                    rr, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if rr == 15:
                            k += 16  # ZRL
                            continue
                        eobrun = (1 << rr) - 1
                        if rr:
                            eobrun += r.receive(rr)
                        break
                    k += rr
                    if k > se:
                        raise JpegError("AC run past spectral band end")
                    zz[k] = _extend(r.receive(s), s) << al
                    k += 1
            else:
                # refinement: correction bits on nonzero history, newly
                # significant coefficients at +-1<<Al
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = r.decode_huff(tab)
                        rr, s = rs >> 4, rs & 0x0F
                        newval = 0
                        if s == 0:
                            if rr != 15:
                                eobrun = 1 << rr
                                if rr:
                                    eobrun += r.receive(rr)
                                break
                            # ZRL: skip 16 zero-history slots (rr = 15)
                        else:
                            if s != 1:
                                raise JpegError(
                                    "invalid size in AC refinement scan"
                                )
                            newval = p1 if r.read_bit() else m1
                        while k <= se:
                            if zz[k] != 0:
                                if r.read_bit() and (zz[k] & p1) == 0:
                                    zz[k] += p1 if zz[k] >= 0 else m1
                            else:
                                if rr == 0:
                                    break
                                rr -= 1
                            k += 1
                        if newval and k <= se:
                            zz[k] = newval
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        if zz[k] != 0:
                            if r.read_bit() and (zz[k] & p1) == 0:
                                zz[k] += p1 if zz[k] >= 0 else m1
                        k += 1
                    eobrun -= 1


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
        # EOBn codes (r<<4, size 0) for r = 1..14: progressive EOB-run
        # lengths 2^1..2^14 (T.81 G.1.2.2) — harmless extras for baseline
        + [r << 4 for r in range(1, 15)]
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

# 12-bit process tables (T.81 Table F.1 extends the ladders: DC SSSS
# 0..15, AC SSSS 1..14).  Flat-length canonical again: DC 16 categories
# at 5 bits, AC 226 symbols (EOB + ZRL + 16 runs x 14 sizes) at 8 bits.
_DC12_BITS = [0, 0, 0, 0, 16] + [0] * 11
_DC12_VALS = list(range(16))
_AC12_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 15)
]
_AC12_BITS = [0] * 7 + [len(_AC12_VALS)] + [0] * 8
_DC12_CODES = _encode_codes(_DC12_BITS, _DC12_VALS)
_AC12_CODES = _encode_codes(_AC12_BITS, _AC12_VALS)


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
    bw: _BitWriter,
    block: list[float],
    qt: list[int],
    pred: int,
    dc_codes: dict | None = None,
    ac_codes: dict | None = None,
) -> int:
    dc_codes = _DC_CODES if dc_codes is None else dc_codes
    ac_codes = _AC_CODES if ac_codes is None else ac_codes
    coef = _fdct2(block)
    zz = [int(round(coef[_ZIGZAG[k]] / qt[k])) for k in range(64)]
    diff = zz[0] - pred
    t = _size_cat(diff)
    bw.put(*dc_codes[t])
    if t:
        bw.put(t, diff if diff >= 0 else diff + (1 << t) - 1)
    run = 0
    for k in range(1, 64):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            bw.put(*ac_codes[0xF0])  # ZRL
            run -= 16
        s = _size_cat(zz[k])
        bw.put(*ac_codes[(run << 4) | s])
        v = zz[k]
        bw.put(s, v if v >= 0 else v + (1 << s) - 1)
        run = 0
    if run:
        bw.put(*ac_codes[0x00])  # EOB
    return zz[0]


def _plane_blocks(
    plane: list[int], pw: int, ph: int, ox: int, oy: int, level: float = 128.0
) -> list[float]:
    """8x8 block at (ox, oy) with edge replication, level-shifted."""
    blk = [0.0] * 64
    for y in range(8):
        sy = min(ph - 1, oy + y)
        for x in range(8):
            sx = min(pw - 1, ox + x)
            blk[y * 8 + x] = plane[sy * pw + sx] - level
    return blk


def _build_component_planes(
    width: int, height: int, pixels: bytes, channels: int, subsample: bool
) -> tuple[list[list[int]], list[tuple[int, int]]]:
    """Gray passthrough or BT.601 RGB->YCbCr with optional 4:2:0 chroma
    downsampling — shared by the baseline and progressive encoders."""
    if channels == 1:
        return [list(pixels)], [(1, 1)]
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

        return [ys, down(cbs), down(crs)], [(2, 2), (1, 1), (1, 1)]
    return [ys, cbs, crs], [(1, 1), (1, 1), (1, 1)]


def encode_jpeg(
    width: int,
    height: int,
    pixels,
    *,
    channels: int = 1,
    quant: int = 1,
    subsample: bool = False,
    restart_interval: int = 0,
    precision: int = 8,
) -> bytes:
    """Minimal baseline JPEG encoder: uniform quant table of ``quant``,
    flat canonical Huffman tables, interleaved single scan.  ``channels``
    1 (gray) or 3 (RGB; JFIF BT.601 to YCbCr); ``subsample=True`` emits
    4:2:0 (2x2 averaged chroma) so decoders' upsampling path is
    exercised.  ``restart_interval > 0`` emits a DRI segment and RSTn
    markers every that-many MCUs (T.81 B.2.4.4) with the mandated DC
    predictor reset — the fixture path for the decoder's restart-index
    validation.  With ``quant=1`` a block-constant grayscale image
    round-trips pixel-exactly (see module docstring).

    ``precision=12`` (round 8) emits the EXTENDED SEQUENTIAL process
    (SOF1, T.81 12-bit): grayscale only, ``pixels`` a sequence of ints
    in 0..4095, level shift 2048, Pq=1 16-bit DQT, and the extended
    Table F.1 code ladders (DC SSSS to 15, AC SSSS to 14).  The
    block-constant exactness contract carries over unchanged at
    quant=1 (decode via :func:`decode_jpeg_ext`)."""
    if precision not in (8, 12):
        raise JpegError("precision must be 8 or 12")
    if precision == 12 and channels != 1:
        raise JpegError("12-bit encode is grayscale-only")
    if channels not in (1, 3):
        raise JpegError(f"channels must be 1 or 3, got {channels}")
    if len(pixels) != width * height * channels:
        raise JpegError("pixel buffer size mismatch")
    if quant < 1 or quant > (255 if precision == 8 else 65535):
        raise JpegError("quant out of range for DQT precision")
    if restart_interval < 0 or restart_interval > 0xFFFF:
        raise JpegError("restart_interval must be 0..65535")
    if precision == 12:
        for v in pixels:
            if not 0 <= int(v) <= 4095:
                raise JpegError(f"sample {v} out of range for 12-bit")
    qt = [quant] * 64
    planes, samp = _build_component_planes(
        width, height, pixels, channels, subsample
    )
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
    if precision == 8:
        out += _seg(0xDB, bytes([0x00]) + bytes(qt))
    else:
        out += _seg(
            0xDB, bytes([0x10]) + b"".join(struct.pack(">H", q) for q in qt)
        )
    sof = bytes([precision]) + struct.pack(">HH", height, width)
    sof += bytes([len(planes)])
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
    out += _seg(0xC0 if precision == 8 else 0xC1, sof)
    if precision == 8:
        dc_codes, ac_codes = _DC_CODES, _AC_CODES
        out += _seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
        out += _seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    else:
        dc_codes, ac_codes = _DC12_CODES, _AC12_CODES
        out += _seg(0xC4, bytes([0x00]) + bytes(_DC12_BITS) + bytes(_DC12_VALS))
        out += _seg(0xC4, bytes([0x10]) + bytes(_AC12_BITS) + bytes(_AC12_VALS))
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
                            planes[ci], pw, ph, (mx * sh + bx) * 8,
                            (my * sv + by) * 8,
                            float(1 << (precision - 1)),
                        )
                        preds[ci] = _encode_block(
                            bw, blk, qt, preds[ci], dc_codes, ac_codes
                        )
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (fixture half for the SOF2 decode path)
# ---------------------------------------------------------------------------


def _emit_eobrun(bw: "_BitWriter", state: dict) -> None:
    """Flush a pending EOB run plus its buffered correction bits
    (T.81 G.1.2.2-3; the encoder mirror of the decoder's eobrun state)."""
    if state["eobrun"] > 0:
        nbits = state["eobrun"].bit_length() - 1
        bw.put(*_AC_CODES[nbits << 4])
        if nbits:
            bw.put(nbits, state["eobrun"] - (1 << nbits))
        state["eobrun"] = 0
    for bit in state["bits"]:
        bw.put(1, bit)
    state["bits"] = []


def _enc_ac_first(
    bw: "_BitWriter", zz: list[int], ss: int, se: int, al: int, state: dict
) -> None:
    """One block of an AC spectral-selection first scan (Ah=0): point
    transform by Al, run-length + EOB-run coding."""
    vals = []
    for k in range(ss, se + 1):
        v = zz[k]
        t = (abs(v) >> al)
        vals.append(t if v >= 0 else -t)
    if not any(vals):
        state["eobrun"] += 1
        if state["eobrun"] == 0x7FFF:
            _emit_eobrun(bw, state)
        return
    _emit_eobrun(bw, state)
    run = 0
    last_nz = max(i for i, v in enumerate(vals) if v)
    for i, v in enumerate(vals):
        if i > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.put(*_AC_CODES[0xF0])
            run -= 16
        s = _size_cat(v)
        bw.put(*_AC_CODES[(run << 4) | s])
        bw.put(s, v if v >= 0 else v + (1 << s) - 1)
        run = 0
    if last_nz < len(vals) - 1:
        state["eobrun"] += 1
        if state["eobrun"] == 0x7FFF:
            _emit_eobrun(bw, state)


def _enc_ac_refine(
    bw: "_BitWriter", zz: list[int], ss: int, se: int, al: int, state: dict
) -> None:
    """One block of an AC successive-approximation refinement scan
    (Ah = Al+1 -> Al): correction bits for history-nonzero coefficients,
    run + sign for newly significant ones (T.81 G.1.2.3)."""
    absv = [abs(zz[k]) >> al for k in range(ss, se + 1)]
    eob = 0  # index AFTER the last newly-significant coefficient
    for i, t in enumerate(absv):
        if t == 1:
            eob = i + 1
    run = 0
    # two correction-bit segments, emitted at different points (the BE/BR
    # split of T.81 G.1.2.3): state["bits"] rides the PENDING EOB RUN and
    # is emitted right after its EOB code; ``br`` holds the current
    # block's bits and is emitted after the NEXT symbol (ZRL or run+1)
    br: list[int] = []
    for i, t in enumerate(absv):
        if t == 0:
            run += 1
            continue
        while run > 15 and i < eob:
            _emit_eobrun(bw, state)
            bw.put(*_AC_CODES[0xF0])
            run -= 16
            for bit in br:
                bw.put(1, bit)
            br = []
        if t > 1:
            # history-nonzero: buffered correction bit (bit Al of magnitude)
            br.append((abs(zz[ss + i]) >> al) & 1)
            continue
        # newly significant (magnitude exactly 1 at this precision)
        _emit_eobrun(bw, state)
        bw.put(*_AC_CODES[(run << 4) | 1])
        bw.put(1, 1 if zz[ss + i] > 0 else 0)
        for bit in br:
            bw.put(1, bit)
        br = []
        run = 0
    if run > 0 or br:
        state["eobrun"] += 1
        state["bits"].extend(br)
        if state["eobrun"] == 0x7FFF:
            _emit_eobrun(bw, state)


def encode_jpeg_progressive(
    width: int,
    height: int,
    pixels: bytes,
    *,
    channels: int = 1,
    quant: int = 1,
    subsample: bool = False,
) -> bytes:
    """Progressive (SOF2) encoder for deterministic test fixtures — the
    q387 discipline extended to the multi-scan case.  Scan script (covers
    every decoder scan kind: interleaved DC first, DC refinement, AC
    spectral-selection first, AC successive-approximation refinement):

    1. DC all components, Ah=0, Al=1
    2. DC all components, Ah=1, Al=0   (refinement bit per block)
    3. AC luma  1..5,  Ah=0, Al=1
    4. AC luma  6..63, Ah=0, Al=1
    5. AC luma  1..5,  Ah=1, Al=0      (correction bits)
    6. AC luma  6..63, Ah=1, Al=0
    7+. AC chroma 1..63, Ah=0, Al=0 per chroma component

    With ``quant=1`` a block-constant grayscale image round-trips
    PIXEL-EXACTLY, same closed form as baseline: the DC path carries
    (dc>>1)<<1 after scan 1 and restores the low bit in scan 2; AC
    coefficients are all zero so the AC scans are pure EOB runs."""
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
    # FDCT + quantize every block up front, padded MCU grid, zigzag order
    zzs: list[list[list[int]]] = []
    grid: list[tuple[int, int, int, int]] = []  # bw_pad, bh_pad, bw_true, bh_true
    for ci, (sh, sv) in enumerate(samp):
        pw, ph = dims[ci]
        bw_pad, bh_pad = mcux * sh, mcuy * sv
        bw_true, bh_true = (pw + 7) // 8, (ph + 7) // 8
        grid.append((bw_pad, bh_pad, bw_true, bh_true))
        blocks = []
        for by in range(bh_pad):
            for bx in range(bw_pad):
                coef = _fdct2(_plane_blocks(planes[ci], pw, ph, bx * 8, by * 8))
                blocks.append(
                    [int(round(coef[_ZIGZAG[k]] / qt[k])) for k in range(64)]
                )
        zzs.append(blocks)
    out = bytearray(b"\xff\xd8")
    out += _seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += _seg(0xDB, bytes([0x00]) + bytes(qt))
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([len(planes)])
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
    out += _seg(0xC2, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))

    def sos_header(comp_list: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comp_list)])
        for ci in comp_list:
            body += bytes([ci + 1, 0x00])
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    # scan 1: interleaved DC first, Al=1
    out += sos_header(list(range(len(planes))), 0, 0, 0, 1)
    bw = _BitWriter()
    preds = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (sh, sv) in enumerate(samp):
                bw_pad = grid[ci][0]
                for by in range(sv):
                    for bx in range(sh):
                        zz = zzs[ci][(my * sv + by) * bw_pad + mx * sh + bx]
                        val = zz[0] >> 1  # arithmetic shift: floor toward -inf, matches decoder <<
                        diff = val - preds[ci]
                        preds[ci] = val
                        t = _size_cat(diff)
                        bw.put(*_DC_CODES[t])
                        if t:
                            bw.put(t, diff if diff >= 0 else diff + (1 << t) - 1)
    out += bw.flush()
    # scan 2: DC refinement, bit 0 of the true DC value
    out += sos_header(list(range(len(planes))), 0, 0, 1, 0)
    bw = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (sh, sv) in enumerate(samp):
                bw_pad = grid[ci][0]
                for by in range(sv):
                    for bx in range(sh):
                        zz = zzs[ci][(my * sv + by) * bw_pad + mx * sh + bx]
                        bw.put(1, zz[0] & 1)
    out += bw.flush()

    def true_blocks(ci: int):
        bw_pad, _bh_pad, bw_true, bh_true = grid[ci]
        for by in range(bh_true):
            for bx in range(bw_true):
                yield zzs[ci][by * bw_pad + bx]

    # scans 3-6: luma AC spectral split at Al=1, then the two refinements
    for ss, se in ((1, 5), (6, 63)):
        out += sos_header([0], ss, se, 0, 1)
        bw, state = _BitWriter(), {"eobrun": 0, "bits": []}
        for zz in true_blocks(0):
            _enc_ac_first(bw, zz, ss, se, 1, state)
        _emit_eobrun(bw, state)
        out += bw.flush()
    for ss, se in ((1, 5), (6, 63)):
        out += sos_header([0], ss, se, 1, 0)
        bw, state = _BitWriter(), {"eobrun": 0, "bits": []}
        for zz in true_blocks(0):
            _enc_ac_refine(bw, zz, ss, se, 0, state)
        _emit_eobrun(bw, state)
        out += bw.flush()
    # chroma AC in one full-band pass each (no approximation)
    for ci in range(1, len(planes)):
        out += sos_header([ci], 1, 63, 0, 0)
        bw, state = _BitWriter(), {"eobrun": 0, "bits": []}
        for zz in true_blocks(ci):
            _enc_ac_first(bw, zz, 1, 63, 0, state)
        _emit_eobrun(bw, state)
        out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)
