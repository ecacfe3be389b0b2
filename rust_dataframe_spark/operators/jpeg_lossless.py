"""Lossless JPEG (ITU T.81 Annex H, SOF3) — predictive Huffman coding,
no DCT, EXACT round-trip.

Reference parity note: the reference engine treats images as opaque
binary payloads (it has no codec layer at all); this module extends the
repo's multimodal decode surface the same way png.py/gif.py/jpeg.py do,
per SURVEY §2's multimodal addendum.  Lossless JPEG is what DNG raw
files, DICOM medical images, and 16-bit scientific corpora actually
carry — a crawl-scale pipeline hits it long before exotic DCT variants.

Decode subset (all of Annex H's Huffman process except DRI):

* SOF3, precision 2..16, 1..4 components, sampling factors 1x1 (the
  layout every real lossless writer emits; subsampled lossless raises).
* All seven predictors (Ss = 1..7) and any point transform Pt = Al.
* The Annex H.1.2.1 prediction boundary rules: the very first sample is
  predicted with 1 << (P - Pt - 1); the rest of line 0 with Ra; column 0
  with Rb; everything else with the scan's selected predictor.
* Differences are decoded through the DC-style SSSS category ladder with
  the lossless-only SSSS = 16 code (diff = 32768, no appended bits), and
  reconstruction is modulo-2^16 (H.1.2.1) so any conformant stream
  round-trips bit-exactly.
* Interleaved (Ns = Nf) and single-component scans.  DRI in a lossless
  frame raises :class:`~.jpeg.JpegError` (vanishingly rare in practice;
  fail-loud beats a guessed restart prediction-reset semantic).

The encoder half (:func:`encode_jpeg_lossless`) is the usual fixture
mirror — flat 5-bit canonical Huffman table over the 17 SSSS categories
— so catalog oracles can pin EXACT sample checksums: lossless means the
decoded samples equal the synthesized samples identically, no
block-constant trick needed (contrast jpeg.py's q387 closed form).

Scale note: like every codec here, decode runs executor-side inside
Arrow-batched mapInPandas (operators/multimodal.py); the driver never
touches sample bytes.
"""

from __future__ import annotations

import struct

from .jpeg import (
    JpegError,
    _BitReader,
    _build_huff,
    _encode_codes,
    _extend,
    _seg,
)

__all__ = ["decode_scan_lossless", "encode_jpeg_lossless"]


def _predict(
    plane: list[int], w: int, x: int, y: int, sel: int, default: int
) -> int:
    """Annex H.1.2.1 sample prediction (boundary rules + predictors 1-7).

    ``plane`` holds the already-reconstructed point-transformed samples.
    """
    if y == 0:
        return default if x == 0 else plane[x - 1]
    if x == 0:
        return plane[(y - 1) * w]
    ra = plane[y * w + x - 1]
    rb = plane[(y - 1) * w + x]
    rc = plane[(y - 1) * w + x - 1]
    if sel == 1:
        return ra
    if sel == 2:
        return rb
    if sel == 3:
        return rc
    if sel == 4:
        return ra + rb - rc
    if sel == 5:
        return ra + ((rb - rc) >> 1)
    if sel == 6:
        return rb + ((ra - rc) >> 1)
    return (ra + rb) >> 1  # sel == 7


def decode_scan_lossless(
    data: bytes,
    pos: int,
    frame: tuple,
    scan: list[tuple[int, int]],
    htables: dict,
    prec: int,
    sel: int,
    pt: int,
    restart_interval: int,
) -> tuple[int, int, int, int, list[int]]:
    """Decode a lossless scan.  ``frame`` is ``(w, h, comps)`` with all
    sampling factors 1; ``scan`` is ``[(comp_idx, dc_table), ...]``;
    ``sel``/``pt`` are the SOS Ss/Al fields.  Returns
    ``(w, h, nch, depth, samples)`` with ``samples`` row-major and
    channel-interleaved, ``depth = prec`` (samples already shifted left
    by ``pt``, i.e. full-precision output domain)."""
    w, h, comps = frame
    if restart_interval:
        raise JpegError(
            "DRI in a lossless frame unsupported (restart prediction "
            "reset not implemented; fail-loud)"
        )
    if not 1 <= sel <= 7:
        raise JpegError(f"lossless predictor Ss={sel} out of range 1..7")
    if pt >= prec:
        raise JpegError(f"point transform {pt} >= precision {prec}")
    if len(scan) != len(comps):
        # decode_jpeg_ext returns after the first SOS, so a partial scan in
        # a multi-component frame would leave the other channels silently
        # zeroed — fail loud, mirroring the sequential non-interleaved gate.
        raise JpegError(
            "non-interleaved multi-scan lossless JPEG unsupported: scan "
            f"covers {len(scan)} of {len(comps)} components (fail-loud)"
        )
    tabs = []
    for ci, td in scan:
        t = htables.get((0, td))
        if t is None:
            raise JpegError(f"missing Huffman table {td} for lossless scan")
        tabs.append(t)
    default = 1 << (prec - pt - 1)
    planes = {ci: [0] * (w * h) for ci, _ in scan}
    r = _BitReader(data, pos)
    for y in range(h):
        for x in range(w):
            for (ci, _td), tab in zip(scan, tabs):
                t = r.decode_huff(tab)
                if t == 16:  # lossless-only: diff = 32768, no bits
                    diff = 32768
                elif t > 16:
                    raise JpegError("SSSS category > 16 in lossless scan")
                else:
                    diff = _extend(r.receive(t), t)
                plane = planes[ci]
                px = _predict(plane, w, x, y, sel, default)
                plane[y * w + x] = (px + diff) & 0xFFFF
    nch = len(comps)
    out = [0] * (w * h * nch)
    for ci, _ in scan:
        plane = planes[ci]
        for i in range(w * h):
            out[i * nch + ci] = plane[i] << pt
    return w, h, nch, prec, out


# ---------------------------------------------------------------------------
# encoder (fixture half) — flat 5-bit table over SSSS 0..16
# ---------------------------------------------------------------------------

_DCL_BITS = [0, 0, 0, 0, 17] + [0] * 11
_DCL_VALS = list(range(17))
_DCL_CODES = _encode_codes(_DCL_BITS, _DCL_VALS)
# decode-side map (for direct unit testing of table round-trips)
_DCL_TABLE = _build_huff(_DCL_BITS, _DCL_VALS)


class _LsBitWriter:
    """Big-endian bit writer with FF-00 stuffing (same contract as
    jpeg._BitWriter; duplicated locally to keep the import surface
    one-directional)."""

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
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.put(8 - self.n, (1 << (8 - self.n)) - 1)
        return bytes(self.out)


def encode_jpeg_lossless(
    width: int,
    height: int,
    samples,
    *,
    channels: int = 1,
    precision: int = 8,
    predictor: int = 1,
    point_transform: int = 0,
) -> bytes:
    """Encode ``samples`` (sequence of ints, row-major channel-
    interleaved, each in ``0 .. 2**precision - 1``) as a conformant
    SOF3 lossless JPEG: one interleaved scan, predictor ``Ss``
    = ``predictor`` (1..7), ``Al`` = ``point_transform``.  Decoding the
    result reproduces ``(s >> point_transform) << point_transform`` for
    every sample — with ``point_transform=0``, EXACT round-trip."""
    if not 2 <= precision <= 16:
        raise JpegError("precision must be 2..16")
    if not 1 <= channels <= 4:
        raise JpegError("channels must be 1..4")
    if not 1 <= predictor <= 7:
        raise JpegError("predictor must be 1..7")
    if not 0 <= point_transform < precision:
        raise JpegError("point transform must be 0..precision-1")
    if len(samples) != width * height * channels:
        raise JpegError("sample buffer size mismatch")
    maxv = (1 << precision) - 1
    pt = point_transform
    default = 1 << (precision - pt - 1)
    out = bytearray(b"\xff\xd8")
    sof = bytes([precision]) + struct.pack(">HH", height, width)
    sof += bytes([channels])
    for ci in range(channels):
        sof += bytes([ci + 1, 0x11, 0])
    out += _seg(0xC3, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(_DCL_BITS) + bytes(_DCL_VALS))
    sos = bytes([channels])
    for ci in range(channels):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([predictor, 0, pt])
    out += _seg(0xDA, sos)
    planes = []
    for ci in range(channels):
        p = [0] * (width * height)
        for i in range(width * height):
            v = int(samples[i * channels + ci])
            if not 0 <= v <= maxv:
                raise JpegError(
                    f"sample {v} out of range for {precision}-bit"
                )
            p[i] = v >> pt
        planes.append(p)
    bw = _LsBitWriter()
    for y in range(height):
        for x in range(width):
            for ci in range(channels):
                plane = planes[ci]
                px = _predict(plane, width, x, y, predictor, default)
                d = (plane[y * width + x] - px) & 0xFFFF
                if d == 32768:
                    bw.put(*_DCL_CODES[16])
                    continue
                sd = d - 65536 if d > 32768 else d
                t = sd.bit_length() if sd >= 0 else (-sd).bit_length()
                bw.put(*_DCL_CODES[t])
                if t:
                    bw.put(t, sd if sd >= 0 else sd + (1 << t) - 1)
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)
