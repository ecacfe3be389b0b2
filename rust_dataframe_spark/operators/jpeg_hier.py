"""Hierarchical JPEG (T.81 Annex K) — the LAST JPEG mode gate: DHP
pyramid framing, EXP reference expansion, and differential Huffman
sequential frames (SOF5), pure stdlib.

Hierarchical streams carry an image pyramid: a DHP segment (frame-header
syntax) declares the FINAL dimensions, then a sequence of frames refines
a reference image — the first frame is non-differential (SOF0/SOF1 here)
at reduced resolution; each later frame may be preceded by an EXP marker
that upsamples the reference by 2 horizontally and/or vertically with
the spec's interpolation filter

    out[2i] = in[i];  out[2i+1] = (in[i] + in[i+1] + 1) >> 1
    (last odd sample replicates the edge),

and a DIFFERENTIAL frame (SOF5) then codes ``image - reference`` with
the ordinary DCT/Huffman machinery but NO level shift and DC prediction
starting at 0; the decoder adds the decoded difference to the reference
and clamps to [0, 2^P - 1] (K.4/K.5).  This module implements exactly
that surface for single-component (grayscale) pyramids, reusing the
battle-tested primitives of :mod:`operators.jpeg` (bit I/O, canonical
Huffman, IDCT, zigzag).

Honest gates (raise loud): multi-component hierarchical frames,
differential progressive/lossless (SOF6/7), arithmetic differential
(SOF13-15), DRI inside hierarchical frames, odd-dimension expansion
(the fixture discipline uses even dims so EXP doubles exactly).

The fixture encoder (:func:`encode_jpeg_hier`) emits a 2-level pyramid
— SOF0 half-resolution frame, EXP(1,1), SOF5 difference frame — and
requires both the half image and the difference plane to be
8x8-block-constant so the DCT round-trips bit-exactly (the q387
discipline): decode is then EXACT and closed-form oracle-checkable.
The interpolation filter itself is pinned by hand-built vectors in
tests (a shared-helper round trip could never catch an upsample bug —
encoder and decoder would cancel)."""

from __future__ import annotations

import struct

from .jpeg import (
    _AC_CODES,
    _DC_CODES,
    _ZIGZAG,
    _BitReader,
    _BitWriter,
    _build_huff,
    _encode_block,
    _extend,
    _idct2,
    _plane_blocks,
    _seg,
    _skip_to_marker,
    JpegError,
)

__all__ = ["decode_jpeg_hier", "encode_jpeg_hier", "upsample_2x"]


def upsample_2x(plane: list[int], w: int, h: int, eh: int, ev: int):
    """T.81 hierarchical interpolation: double horizontally when ``eh``,
    then vertically when ``ev``.  Returns (plane, new_w, new_h)."""
    if eh:
        out = []
        for y in range(h):
            row = plane[y * w : (y + 1) * w]
            for x in range(w):
                out.append(row[x])
                nxt = row[x + 1] if x + 1 < w else row[x]
                out.append((row[x] + nxt + 1) >> 1)
        plane, w = out, 2 * w
    if ev:
        out = [0] * (w * h * 2)
        for y in range(h):
            row = plane[y * w : (y + 1) * w]
            nrow = plane[(y + 1) * w : (y + 2) * w] if y + 1 < h else row
            for x in range(w):
                out[(2 * y) * w + x] = row[x]
                out[(2 * y + 1) * w + x] = (row[x] + nrow[x] + 1) >> 1
        plane, h = out, 2 * h
    return plane, w, h


def _parse_frame_header(data: bytes, pos: int):
    ln = struct.unpack_from(">H", data, pos)[0]
    prec = data[pos + 2]
    h, w = struct.unpack_from(">HH", data, pos + 3)
    nf = data[pos + 7]
    comps = []
    at = pos + 8
    for _ in range(nf):
        cid, hv, tq = data[at], data[at + 1], data[at + 2]
        comps.append((cid, hv >> 4, hv & 0xF, tq))
        at += 3
    return ln, prec, w, h, comps


def _decode_scan_1comp(
    data: bytes, pos: int, w: int, h: int, qt: list[int],
    dc_tab, ac_tab, *, differential: bool, prec: int,
) -> tuple[list[int], int]:
    """Sequential Huffman scan for one component: returns (plane, pos
    after entropy data).  Non-differential: +2^(P-1) level shift and
    clamp; differential: raw signed IDCT output (K.4: no shift)."""
    bw, bh = (w + 7) // 8, (h + 7) // 8
    plane = [0] * (w * h)
    r = _BitReader(data, pos)
    pred = 0
    half = 1 << (prec - 1)
    top = (1 << prec) - 1
    for by in range(bh):
        for bx in range(bw):
            t = r.decode_huff(dc_tab)
            if t > 15:
                raise JpegError("bad DC category in hierarchical scan")
            diff = _extend(r.receive(t), t) if t else 0
            pred += diff
            zz = [0] * 64
            zz[0] = pred * qt[0]
            k = 1
            while k < 64:
                rs = r.decode_huff(ac_tab)
                rr, s = rs >> 4, rs & 0xF
                if s == 0:
                    if rr == 15:
                        k += 16
                        continue
                    break  # EOB
                k += rr
                if k > 63:
                    raise JpegError("AC run overflows block")
                zz[k] = _extend(r.receive(s), s) * qt[k]
                k += 1
            coef = [0.0] * 64
            for k2 in range(64):
                coef[_ZIGZAG[k2]] = zz[k2]
            px = _idct2(coef)
            for yy in range(8):
                oy = by * 8 + yy
                if oy >= h:
                    break
                for xx in range(8):
                    ox = bx * 8 + xx
                    if ox >= w:
                        continue
                    v = int(round(px[yy * 8 + xx]))
                    if differential:
                        plane[oy * w + ox] = v
                    else:
                        plane[oy * w + ox] = min(top, max(0, v + half))
    return plane, _skip_to_marker(data, r.pos)


def decode_jpeg_hier(data: bytes) -> tuple[int, int, int, int, bytes]:
    """Decode a hierarchical (DHP) JPEG to ``(w, h, nch, depth,
    samples)`` — same contract as ``decode_jpeg_ext``.  Single-component
    pyramids; SOF0/SOF1 first frame, EXP + SOF5 differential refinement
    frames; everything else gates loud."""
    data = bytes(data)
    if data[:2] != b"\xff\xd8":
        raise JpegError("missing SOI")
    pos = 2
    qts: dict[int, list[int]] = {}
    hts: dict[tuple[int, int], dict] = {}
    dhp = None
    ref: list[int] | None = None
    rw = rh = 0
    pending_exp = None
    frame = None  # set between SOFn and SOS
    while pos < len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if dhp is None or ref is None:
                raise JpegError("EOI before a decoded hierarchical frame")
            _ln, prec, fw, fh, _comps = dhp
            if (rw, rh) != (fw, fh):
                raise JpegError(
                    f"final reference {rw}x{rh} != DHP dims {fw}x{fh}"
                )
            out = bytes(
                v & 0xFF for v in ref
            ) if prec == 8 else b"".join(
                struct.pack("<H", v) for v in ref
            )
            return fw, fh, 1, prec, out
        if marker in (0x01, *range(0xD0, 0xD8)):
            continue
        ln = struct.unpack_from(">H", data, pos)[0]
        if marker == 0xDE:  # DHP
            if dhp is not None:
                raise JpegError("second DHP")
            dhp = _parse_frame_header(data, pos)
            if len(dhp[4]) != 1:
                raise JpegError(
                    "multi-component hierarchical unsupported (fail-loud)"
                )
        elif marker == 0xDF:  # EXP
            e = data[pos + 2]
            pending_exp = (e >> 4, e & 0xF)
            if pending_exp == (0, 0):
                raise JpegError("EXP with no expansion")
        elif marker == 0xDB:  # DQT
            at = pos + 2
            while at < pos + ln:
                pq, tq = data[at] >> 4, data[at] & 0xF
                if pq:
                    vals = [
                        struct.unpack_from(">H", data, at + 1 + 2 * k)[0]
                        for k in range(64)
                    ]
                    at += 1 + 128
                else:
                    vals = list(data[at + 1 : at + 65])
                    at += 65
                qts[tq] = vals
        elif marker == 0xC4:  # DHT
            at = pos + 2
            while at < pos + ln:
                tc, th = data[at] >> 4, data[at] & 0xF
                bits = list(data[at + 1 : at + 17])
                n = sum(bits)
                vals = list(data[at + 17 : at + 17 + n])
                if len(vals) < n or at + 17 + n > pos + ln:
                    raise JpegError(
                        "DHT declares more codes than the segment carries"
                    )
                hts[(tc, th)] = _build_huff(bits, vals)
                at += 17 + n
        elif marker in (0xC0, 0xC1, 0xC5):
            if dhp is None:
                raise JpegError("hierarchical frame before DHP")
            differential = marker == 0xC5
            if differential and ref is None:
                raise JpegError("differential frame without a reference")
            if not differential and ref is not None:
                raise JpegError(
                    "second non-differential frame unsupported (fail-loud)"
                )
            frame = (_parse_frame_header(data, pos), differential)
            if len(frame[0][4]) != 1:
                raise JpegError("multi-component hierarchical frame")
        elif marker in (0xC2, 0xC3, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegError(
                "hierarchical frame type unsupported (progressive/"
                "lossless/arithmetic differential gate; fail-loud)"
            )
        elif marker == 0xDD:
            raise JpegError("DRI inside hierarchical stream unsupported")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("SOS without a frame header")
            (fln, prec, fw, fh, comps), differential = frame
            ns = data[pos + 2]
            if ns != 1:
                raise JpegError("hierarchical scan must cover 1 component")
            td, ta = data[pos + 4] >> 4, data[pos + 4] & 0xF
            dc_tab, ac_tab = hts.get((0, td)), hts.get((1, ta))
            if dc_tab is None or ac_tab is None:
                raise JpegError("missing Huffman table for scan")
            qt = qts.get(comps[0][3])
            if qt is None:
                raise JpegError("missing quantization table")
            if differential and pending_exp:
                eh, ev = pending_exp
                ref, rw, rh = upsample_2x(ref, rw, rh, eh, ev)
                pending_exp = None
            if differential and (fw, fh) != (rw, rh):
                raise JpegError(
                    f"differential frame {fw}x{fh} != reference "
                    f"{rw}x{rh} (odd-dimension expansion gate)"
                )
            plane, pos2 = _decode_scan_1comp(
                data, pos + ln, fw, fh, qt, dc_tab, ac_tab,
                differential=differential, prec=prec,
            )
            if differential:
                top = (1 << prec) - 1
                ref = [
                    min(top, max(0, r0 + d))
                    for r0, d in zip(ref, plane)
                ]
            else:
                ref, rw, rh = plane, fw, fh
            frame = None
            pos = pos2
            continue
        else:
            pass  # APPn/COM: skip
        pos += ln
    raise JpegError("missing EOI")


# ---------------------------------------------------------------------------
# fixture encoder: 2-level pyramid, block-constant discipline
# ---------------------------------------------------------------------------


def _block_constant(plane: list[int], w: int, h: int) -> bool:
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            v = plane[by * w + bx]
            for y in range(by, min(by + 8, h)):
                for x in range(bx, min(bx + 8, w)):
                    if plane[y * w + x] != v:
                        return False
    return True


def encode_jpeg_hier(
    w: int, h: int, half: list[int], diff: list[int]
) -> bytes:
    """Two-level hierarchical grayscale fixture: SOF0 frame carrying the
    ``w/2 x h/2`` ``half`` image, EXP(1,1), SOF5 differential frame
    carrying ``diff`` (full resolution, signed).  Decode returns exactly
    ``clamp(upsample(half) + diff)``.  Both planes must be
    8x8-block-constant and ``w``/``h`` even (q387 exactness
    discipline)."""
    if w % 2 or h % 2:
        raise JpegError("hierarchical fixture needs even dims")
    hw, hh = w // 2, h // 2
    if len(half) != hw * hh or len(diff) != w * h:
        raise JpegError("plane sizes mismatch")
    if not _block_constant(half, hw, hh):
        raise JpegError("half plane not 8x8-block-constant")
    if not _block_constant(diff, w, h):
        raise JpegError("diff plane not 8x8-block-constant")
    if any(not -255 <= d <= 255 for d in diff):
        raise JpegError("diff out of [-255, 255]")
    from .jpeg import (
        _AC_BITS,
        _AC_VALS,
        _DC12_BITS,
        _DC12_CODES,
        _DC12_VALS,
        _DC_BITS,
        _DC_VALS,
    )

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes([1] * 64))  # qt 0, all ones
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    # differential DC: the prediction chain over diffs in [-255,255]
    # spans +-4080, which needs categories up to 12 — use the 16-category
    # ladder as DC table 1 (T.81 lets the DHT declare it)
    out += _seg(0xC4, bytes([0x01]) + bytes(_DC12_BITS) + bytes(_DC12_VALS))
    frame_hdr = lambda ww, hh2: (
        bytes([8]) + struct.pack(">HH", hh2, ww) + bytes([1, 1, 0x11, 0])
    )
    out += _seg(0xDE, frame_hdr(w, h))  # DHP: final dims
    # frame 1: non-differential SOF0 at half resolution
    out += _seg(0xC0, frame_hdr(hw, hh))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    bw = _BitWriter()
    pred = 0
    for by in range(0, hh, 8):
        for bx in range(0, hw, 8):
            blk = _plane_blocks(half, hw, hh, bx, by)  # level shift 128
            pred = _encode_block(bw, blk, [1] * 64, pred)
    out += bw.flush()
    # frame 2: EXP(1,1) + differential SOF5 at full resolution
    out += _seg(0xDF, bytes([0x11]))
    out += _seg(0xC5, frame_hdr(w, h))
    out += _seg(0xDA, bytes([1, 1, 0x10, 0, 63, 0]))  # Td=1: wide DC ladder
    bw = _BitWriter()
    pred = 0
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            blk = _plane_blocks(diff, w, h, bx, by, level=0.0)  # no shift
            pred = _encode_block(bw, blk, [1] * 64, pred, dc_codes=_DC12_CODES)
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)
