"""EXIF metadata parse + orientation correction — the highest-frequency
real-corpus image fix (phone cameras store sensor-order pixels and an
Orientation tag; a pipeline that ignores it trains on rotated images).

- :func:`parse_exif` walks the JPEG marker stream for the APP1 segment
  with the ``Exif\\x00\\x00`` prefix and reads the embedded TIFF
  structure with the round-9 IFD walker (:mod:`operators.tiff`) — both
  byte orders, IFD0 tags (Orientation 274, Make 271, Model 272,
  DateTime 306) and the Exif sub-IFD (34665 -> DateTimeOriginal 36867,
  PixelXDimension 40962, PixelYDimension 40963).  Returns a dict;
  missing APP1 returns ``{}`` (absence is data, not an error);
  malformed TIFF inside APP1 raises (corrupt metadata should not be
  silently dropped).
- :func:`apply_orientation` performs the eight exact pixel transforms
  (identity, flip-H, rot180, flip-V, transpose, rot90CW, transverse,
  rot270CW) on the decoded plane, returning ``(w, h, pixels)`` with
  swapped dims for the transposing four.  Pure index shuffles — exact,
  closed-form oracle-checkable.

The fixture half (:func:`embed_exif`) splices a hand-built conformant
APP1 (either byte order) into an existing JPEG right after SOI.

Reference parity: no image surface in the reference; extends the
multimodal matrix (SURVEY §8).
"""

from __future__ import annotations

import struct

from .tiff import TiffError, _read_ifd

__all__ = ["parse_exif", "apply_orientation", "embed_exif"]


_IFD0_TAGS = {274: "orientation", 271: "make", 272: "model",
              306: "datetime"}
_EXIF_TAGS = {36867: "datetime_original", 40962: "pixel_x",
              40963: "pixel_y"}


def _ascii(vals: list[int]) -> str:
    return bytes(vals).split(b"\x00", 1)[0].decode("latin-1")


def parse_exif(jpeg: bytes) -> dict:
    """Extract EXIF fields from a JPEG's APP1 segment (see module
    docstring).  ``{}`` when no Exif APP1 exists."""
    data = bytes(jpeg)
    if data[:2] != b"\xff\xd8":
        raise TiffError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise TiffError(f"expected marker at {pos}")
        marker = data[pos + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        ln = struct.unpack_from(">H", data, pos + 2)[0]
        if marker == 0xDA:  # SOS: no APP1 seen
            return {}
        if marker == 0xE1 and data[pos + 4 : pos + 10] == b"Exif\x00\x00":
            tiff = data[pos + 10 : pos + 2 + ln]
            return _parse_tiff_exif(tiff)
        pos += 2 + ln
    return {}


def _parse_tiff_exif(tiff: bytes) -> dict:
    if tiff[:4] not in (b"II*\x00", b"MM\x00*"):
        raise TiffError("APP1 Exif without a TIFF header")
    e = "<" if tiff[:2] == b"II" else ">"
    off = struct.unpack_from(e + "I", tiff, 4)[0]
    ifd0, _nxt = _read_ifd(tiff, off, e)
    out: dict = {}
    for tag, name in _IFD0_TAGS.items():
        if tag in ifd0:
            v = ifd0[tag]
            out[name] = _ascii(v) if name in ("make", "model",
                                              "datetime") else v[0]
    if 34665 in ifd0:
        sub, _ = _read_ifd(tiff, ifd0[34665][0], e)
        for tag, name in _EXIF_TAGS.items():
            if tag in sub:
                v = sub[tag]
                out[name] = (
                    _ascii(v) if name == "datetime_original" else v[0]
                )
    o = out.get("orientation")
    if o is not None and not 1 <= o <= 8:
        raise TiffError(f"EXIF orientation {o} out of range 1..8")
    return out


def apply_orientation(
    w: int, h: int, channels: int, pixels: bytes, orientation: int
) -> tuple[int, int, bytes]:
    """The eight EXIF display transforms, exact index shuffles."""
    if not 1 <= orientation <= 8:
        raise TiffError(f"orientation {orientation} out of range")
    if orientation == 1:
        return w, h, bytes(pixels)
    swap = orientation >= 5
    ow, oh = (h, w) if swap else (w, h)
    out = bytearray(len(pixels))
    for oy in range(oh):
        for ox in range(ow):
            if orientation == 2:      # flip horizontal
                sx, sy = w - 1 - ox, oy
            elif orientation == 3:    # rotate 180
                sx, sy = w - 1 - ox, h - 1 - oy
            elif orientation == 4:    # flip vertical
                sx, sy = ox, h - 1 - oy
            elif orientation == 5:    # transpose
                sx, sy = oy, ox
            elif orientation == 6:    # rotate 90 CW
                sx, sy = oy, h - 1 - ox
            elif orientation == 7:    # transverse
                sx, sy = w - 1 - oy, h - 1 - ox
            else:                     # 8: rotate 270 CW
                sx, sy = w - 1 - oy, ox
            so = (sy * w + sx) * channels
            do = (oy * ow + ox) * channels
            out[do : do + channels] = pixels[so : so + channels]
    return ow, oh, bytes(out)


def embed_exif(
    jpeg: bytes,
    *,
    orientation: int,
    datetime: str = "2026:01:01 00:00:00",
    make: str = "rdf-spark",
    big_endian: bool = False,
) -> bytes:
    """Splice a conformant APP1 Exif segment (IFD0: Make, Orientation,
    DateTime; Exif sub-IFD: DateTimeOriginal) after the JPEG's SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise TiffError("not a JPEG")
    e = ">" if big_endian else "<"
    hdr = (b"MM\x00*" if big_endian else b"II*\x00") + struct.pack(e + "I", 8)
    make_b = make.encode("latin-1") + b"\x00"
    dt_b = datetime.encode("latin-1") + b"\x00"
    # IFD0: 4 entries + next ptr; data area follows
    n0 = 4
    ifd0_at = 8
    data_at = ifd0_at + 2 + 12 * n0 + 4
    make_at = data_at
    dt_at = make_at + len(make_b)
    exif_at = dt_at + len(dt_b)

    def entry(tag: int, typ: int, cnt: int, val: int, inline: bytes = b""):
        if inline:
            raw = inline + b"\x00" * (4 - len(inline))
            v = struct.unpack(e + "I", raw)[0]
        else:
            v = val
        return struct.pack(e + "HHII", tag, typ, cnt, v)

    def short_entry(tag: int, v: int):
        raw = struct.pack(e + "H", v) + b"\x00\x00"
        return struct.pack(e + "HHI", tag, 3, 1) + raw

    ifd0 = struct.pack(e + "H", n0)
    ifd0 += entry(271, 2, len(make_b), make_at)
    ifd0 += short_entry(274, orientation)
    ifd0 += entry(306, 2, len(dt_b), dt_at)
    ifd0 += entry(34665, 4, 1, exif_at)
    ifd0 += b"\x00\x00\x00\x00"
    # Exif sub-IFD: 1 entry (DateTimeOriginal pointing back at dt_b)
    sub = struct.pack(e + "H", 1)
    sub += entry(36867, 2, len(dt_b), dt_at)
    sub += b"\x00\x00\x00\x00"
    tiff = hdr + ifd0 + make_b + dt_b + sub
    app1 = b"Exif\x00\x00" + tiff
    seg = b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1
    return jpeg[:2] + seg + jpeg[2:]
