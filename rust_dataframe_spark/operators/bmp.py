"""Pure-stdlib BMP (Windows DIB file) codec — the standalone-file twin
of the AVI ``00db`` DIB frame path (avi.py), completing the common
still-image matrix: PNG (full matrix), JPEG (all five SOF modes), GIF
(incl. compositing) — and now BMP, the format document screenshots and
legacy scans actually arrive in.

Surface (all public Windows DIB structures): BITMAPFILEHEADER ("BM",
pixel-data offset honored), BITMAPINFOHEADER/V4/V5 (size 40/108/124),
bit depths 1/4/8 (palette, BGRX quads), 24-bit BGR and 32-bit BGRX
uncompressed (BI_RGB), BI_RLE8 run-length for 8-bit (runs, absolute
mode with word padding, end-of-line 00 00, end-of-bitmap 00 01, delta
00 02), bottom-up AND top-down (negative biHeight) row order, 4-byte
row padding.  Honest gates: BI_RLE4, BI_BITFIELDS with non-default
masks, OS/2 BITMAPCOREHEADER, biPlanes != 1 — all raise loud.

Output contract matches the other image codecs: ``(width, height,
channels, pixels)`` with ``pixels`` a top-down row-major
channel-interleaved RGB (or single-channel gray when the palette is
provably grayscale-identity) byte plane.  The encoder half emits
conformant files for byte-real fixtures (24-bit BI_RGB and 8-bit
palette, bottom-up, padded).

Reference parity: the reference repo has no image surface; this
extends the multimodal matrix (SURVEY §8).
"""

from __future__ import annotations

import struct

__all__ = ["BmpError", "is_bmp", "decode_bmp", "encode_bmp", "encode_bmp8"]


class BmpError(ValueError):
    """Malformed or unsupported BMP structure."""


def is_bmp(head: bytes) -> bool:
    return head[:2] == b"BM"


def decode_bmp(data: bytes) -> tuple[int, int, int, bytes]:
    data = bytes(data)
    if not is_bmp(data):
        raise BmpError("bad magic (not a BMP)")
    if len(data) < 54:
        raise BmpError("truncated BMP headers")
    pix_off = struct.unpack_from("<I", data, 10)[0]
    hsize = struct.unpack_from("<I", data, 14)[0]
    if hsize == 12:
        raise BmpError("OS/2 BITMAPCOREHEADER unsupported (fail-loud)")
    if hsize not in (40, 52, 56, 108, 124):
        raise BmpError(f"unknown DIB header size {hsize}")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    comp = struct.unpack_from("<I", data, 30)[0]
    clr_used = struct.unpack_from("<I", data, 46)[0]
    if planes != 1:
        raise BmpError(f"biPlanes {planes} != 1")
    if w <= 0 or h_raw == 0:
        raise BmpError(f"bad dimensions {w}x{h_raw}")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if bpp not in (1, 4, 8, 24, 32):
        raise BmpError(f"bit depth {bpp} unsupported")
    if comp == 3 and bpp == 32:
        # V4/V5 writers emit BI_BITFIELDS with the default BGRX masks;
        # accept exactly those, gate anything exotic
        if hsize >= 52:
            masks = struct.unpack_from("<III", data, 54)
            if masks != (0x00FF0000, 0x0000FF00, 0x000000FF):
                raise BmpError("non-default BI_BITFIELDS masks (fail-loud)")
            comp = 0
        else:
            raise BmpError("BI_BITFIELDS without mask block")
    if comp == 2:
        raise BmpError("BI_RLE4 unsupported (fail-loud)")
    if comp not in (0, 1):
        raise BmpError(f"compression {comp} unsupported")
    if comp == 1 and bpp != 8:
        raise BmpError("BI_RLE8 requires 8-bit pixels")
    palette = None
    if bpp <= 8:
        n = clr_used or (1 << bpp)
        if n > 1 << bpp:
            raise BmpError(f"palette size {n} exceeds depth")
        pal_at = 14 + hsize
        if pal_at + 4 * n > len(data):
            raise BmpError("truncated palette")
        palette = [
            tuple(data[pal_at + 4 * i : pal_at + 4 * i + 3][::-1])  # BGRX->RGB
            for i in range(n)
        ]
    if comp == 1:
        idx = _decode_rle8(data, pix_off, w, h, top_down)
    else:
        idx = _decode_raster(data, pix_off, w, h, bpp, top_down)
    if bpp > 8:
        return w, h, 3, bytes(idx)
    gray = all(p[0] == p[1] == p[2] for p in palette) and all(
        i < len(palette) for i in idx
    )
    if any(i >= len(palette) for i in idx):
        raise BmpError("pixel index outside palette")
    if gray:
        return w, h, 1, bytes(palette[i][0] for i in idx)
    out = bytearray()
    for i in idx:
        out += bytes(palette[i])
    return w, h, 3, bytes(out)


def _decode_raster(
    data: bytes, off: int, w: int, h: int, bpp: int, top_down: bool
):
    """Uncompressed rows, 4-byte padded; returns palette indices for
    bpp<=8, RGB bytes for 24/32."""
    row_bytes = (w * bpp + 31) // 32 * 4
    if off + row_bytes * h > len(data):
        raise BmpError("pixel array overruns file")
    out = bytearray()
    for y in range(h):
        src = off + (y if top_down else h - 1 - y) * row_bytes
        row = data[src : src + row_bytes]
        if bpp == 24:
            for x in range(w):
                b, g, r = row[3 * x : 3 * x + 3]
                out += bytes((r, g, b))
        elif bpp == 32:
            for x in range(w):
                b, g, r = row[4 * x : 4 * x + 3]
                out += bytes((r, g, b))
        elif bpp == 8:
            out += row[:w]
        elif bpp == 4:
            for x in range(w):
                v = row[x >> 1]
                out.append((v >> 4) if x % 2 == 0 else (v & 0xF))
        else:  # 1-bit
            for x in range(w):
                out.append((row[x >> 3] >> (7 - (x & 7))) & 1)
    return out


def _decode_rle8(data: bytes, off: int, w: int, h: int, top_down: bool):
    """BI_RLE8: encoded runs into a bottom-up (or top-down) index grid;
    enforces grid bounds and the end-of-bitmap marker."""
    grid = bytearray(w * h)
    x = y = 0  # y counts in STORAGE order (bottom-up rows unless top_down)
    pos = off
    done = False
    while pos + 1 < len(data):
        n, v = data[pos], data[pos + 1]
        pos += 2
        if n:  # run
            if x + n > w or y >= h:
                raise BmpError("RLE8 run overruns row")
            row = y if top_down else h - 1 - y
            for k in range(n):
                grid[row * w + x + k] = v
            x += n
        elif v == 0:  # end of line
            x, y = 0, y + 1
        elif v == 1:  # end of bitmap
            done = True
            break
        elif v == 2:  # delta
            if pos + 1 >= len(data):
                raise BmpError("truncated RLE8 delta")
            x += data[pos]
            y += data[pos + 1]
            pos += 2
            if x > w or y > h:
                raise BmpError("RLE8 delta escapes bitmap")
        else:  # absolute mode, word-aligned
            if x + v > w or y >= h:
                raise BmpError("RLE8 absolute run overruns row")
            if pos + v > len(data):
                raise BmpError("truncated RLE8 absolute run")
            row = y if top_down else h - 1 - y
            grid[row * w + x : row * w + x + v] = data[pos : pos + v]
            x += v
            pos += v + (v & 1)
    if not done:
        raise BmpError("missing RLE8 end-of-bitmap marker")
    return grid


# ---------------------------------------------------------------------------
# encoder (fixture half)
# ---------------------------------------------------------------------------


def _headers(w: int, h: int, bpp: int, n_pal: int, img_size: int) -> bytes:
    pix_off = 14 + 40 + 4 * n_pal
    return (
        b"BM"
        + struct.pack("<IHHI", pix_off + img_size, 0, 0, pix_off)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, bpp, 0, img_size, 2835, 2835,
            n_pal, 0,
        )
    )


def encode_bmp(w: int, h: int, rgb: bytes) -> bytes:
    """24-bit BI_RGB bottom-up BMP from a top-down RGB plane."""
    if len(rgb) != w * h * 3:
        raise BmpError("plane size mismatch")
    row_bytes = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):
        row = bytearray()
        for x in range(w):
            r, g, b = rgb[3 * (y * w + x) : 3 * (y * w + x) + 3]
            row += bytes((b, g, r))
        row += b"\x00" * (row_bytes - len(row))
        body += row
    return _headers(w, h, 24, 0, len(body)) + bytes(body)


def encode_bmp8(
    w: int, h: int, indices: bytes, palette: list[tuple[int, int, int]]
) -> bytes:
    """8-bit palette bottom-up BMP from top-down indices."""
    if len(indices) != w * h:
        raise BmpError("index plane size mismatch")
    if not 1 <= len(palette) <= 256:
        raise BmpError("palette must hold 1..256 entries")
    row_bytes = (w + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):
        row = bytearray(indices[y * w : (y + 1) * w])
        row += b"\x00" * (row_bytes - len(row))
        body += row
    pal = b"".join(bytes((b, g, r, 0)) for r, g, b in palette)
    return (
        _headers(w, h, 8, len(palette), len(body))[:54] + pal + bytes(body)
    )
