"""Pure-stdlib PNG codec (zlib + struct) — the REAL decode path for the
multimodal pipeline.

The container has no PIL/opencv, but PNG's baseline format needs neither:
chunks are length/type/data/CRC32 frames, pixel data is zlib-compressed
scanlines with five per-line predictive filters (None/Sub/Up/Average/Paeth,
RFC 2083 §6).  This module implements exactly that subset — 8-bit,
non-interlaced, color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA) —
which covers the overwhelming majority of real-world PNGs.  Exotic inputs
(16-bit, paletted, Adam7-interlaced, other formats entirely) still raise,
and the multimodal layer falls back to its documented deterministic fake.

Also provides a minimal encoder (filter 0 scanlines) so tests can
synthesize REAL byte-accurate PNGs deterministically instead of checking
in binaries, plus the 9x8 grayscale downsample + dHash banding used by the
perceptual near-dup family (the real-pixel counterpart of
``multimodal.dhash_bands``'s oracle-replayable md5 stand-in).

Scale note: decoding runs executor-side inside Arrow-batched mapInPandas
(operators/multimodal.py) — the driver never touches pixel bytes; this
module is plain per-payload Python invoked on workers.
"""

from __future__ import annotations

import struct
import zlib

__all__ = [
    "PngError",
    "decode_png",
    "encode_png",
    "gray_9x8",
    "pack_dhash_bands",
    "dhash_bands_real",
]

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# samples per pixel by PNG color type
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class PngError(ValueError):
    """Raised for malformed input or a PNG variant outside the supported
    subset (16-bit / paletted / interlaced) — callers fall back to the
    documented fake-decode stand-in."""


def is_png(data: bytes) -> bool:
    return bytes(data[:8]) == _SIGNATURE


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline PNG to ``(width, height, channels, pixels)``.

    ``pixels`` is ``height * width * channels`` bytes, row-major, 8 bits per
    sample.  Raises :class:`PngError` for anything outside the supported
    subset; chunk CRCs are verified (a corrupt payload should fail loudly,
    not decode to garbage that poisons downstream perceptual hashes).
    """
    data = bytes(data)
    if not is_png(data):
        raise PngError("not a PNG (bad signature)")
    pos, w = 8, None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise PngError("truncated chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise PngError(f"bad CRC in {ctype!r} chunk")
        pos += 12 + length
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise PngError(f"unsupported bit depth {depth} (8 only)")
            if color not in _CHANNELS:
                raise PngError(f"unsupported color type {color} (0/2/4/6 only)")
            if interlace != 0:
                raise PngError("Adam7 interlacing unsupported")
            if comp != 0 or filt != 0:
                raise PngError("nonstandard compression/filter method")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if w is None:
        raise PngError("missing IHDR")
    ch = _CHANNELS[color]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise PngError(f"IDAT inflate failed: {e}") from None
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise PngError("decompressed size mismatch")
    out = bytearray(h * stride)
    prev = bytes(stride)
    for row in range(h):
        base = row * (stride + 1)
        ftype = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ftype != 0:
            raise PngError(f"unknown scanline filter {ftype}")
        out[row * stride : (row + 1) * stride] = line
        prev = line
    return w, h, ch, bytes(out)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes, *, channels: int = 3) -> bytes:
    """Minimal PNG encoder: 8-bit, filter-0 scanlines, one IDAT.

    ``pixels`` must be ``height * width * channels`` bytes.  Used by tests
    to build REAL decodable payloads deterministically (no binaries in the
    repo) and as the re-encode half of :func:`multimodal.resize_images`'s
    real path."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if color is None:
        raise PngError(f"channels must be 1/2/3/4, got {channels}")
    if len(pixels) != width * height * channels:
        raise PngError("pixel buffer size mismatch")
    stride = width * channels
    raw = b"".join(
        b"\x00" + bytes(pixels[r * stride : (r + 1) * stride]) for r in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def gray_9x8(width: int, height: int, channels: int, pixels: bytes) -> list[int]:
    """9-wide, 8-tall grayscale downsample — the dHash grid (point sampling
    at cell centers; deterministic, no float accumulation order issues)."""
    grid = []
    for r in range(8):
        y = min(height - 1, (2 * r + 1) * height // 16)
        for c in range(9):
            x = min(width - 1, (2 * c + 1) * width // 18)
            o = (y * width + x) * channels
            if channels >= 3:
                # integer Rec.601 luma; alpha (ch 4) ignored
                g = (299 * pixels[o] + 587 * pixels[o + 1] + 114 * pixels[o + 2]) // 1000
            else:
                g = pixels[o]
            grid.append(g)
    return grid


def pack_dhash_bands(grid: list[int]) -> tuple[int, int, int, int]:
    """Pack a 9x8 grayscale grid into four 16-bit dHash bands — the
    band-packing contract shared with ``multimodal.dhash_bands`` (bit l of
    band b compares grid pixel (2b + l//8, l%8) with its right neighbor),
    decoder-agnostic so the PNG and JPEG real paths emit identical shapes."""
    bands = []
    for b in range(4):
        val = 0
        for l in range(16):
            r, c = 2 * b + l // 8, l % 8
            if grid[r * 9 + c] > grid[r * 9 + c + 1]:
                val |= 1 << l
        bands.append(val)
    return tuple(bands)


def dhash_bands_real(payload: bytes) -> tuple[int, int, int, int]:
    """Real-pixel dHash of a PNG payload as four 16-bit bands, so the
    banded-candidate + Hamming-verify pipeline downstream is unchanged when
    this replaces the md5 stand-in."""
    return pack_dhash_bands(gray_9x8(*decode_png(payload)))
