"""Pure-stdlib baseline TIFF codec (TIFF 6.0) — the scanned-document
format real text corpora carry next to PNG/JPEG.

Surface (all public TIFF 6.0 structures): both byte orders (``II``
little / ``MM`` big endian), the IFD entry walk (BYTE/ASCII/SHORT/LONG/
RATIONAL value types, inline-vs-offset values), multi-page IFD chains
(:func:`tiff_pages` census + per-page decode), strip organization
(RowsPerStrip / StripOffsets / StripByteCounts), compressions: 1
(none), 32773 (PackBits) and 5 (TIFF LZW — MSB-first variable-width
codes with the spec's EARLY code-width change at table size 2^n - 1,
Clear=256/EOI=257, 12-bit cap) with horizontal-differencing Predictor 2;
photometrics 0 (WhiteIsZero, inverted), 1 (BlackIsZero), 2 (RGB) and 3
(palette, 16-bit ColorMap words scaled >>8); bit depths 1 and 8 per
sample.  Round-9 continuation closes the previously-documented gates:
**tiled** organization (TileWidth/TileLength/TileOffsets/TileByteCounts,
edge-tile crop), **planar configuration 2** (plane-major strip tables,
per-plane predictor, interleave on output), **16-bit samples** (both
byte orders, output scaled ``>> 8`` to the byte contract — documented
precision drop), **float SampleFormat 3** (32-bit IEEE gray, clamped
[0,1] → ``round(v*255)``), and the **CCITT fax compressions** 2
(Modified Huffman RLE, byte-aligned rows), 3 (Group 3 T.4, 1D and —
via T4Options bit 0 — 2D) and 4 (Group 4 T.6 MMR) through
``operators/ccitt.py``.  Remaining honest gates (raise loud):
JPEG-in-TIFF (6/7), planar tiles, predictor 3, uncompressed-mode CCITT.

Output contract matches the other image codecs: ``(width, height,
channels, pixels)`` — top-down row-major interleaved, 1-bit expanded to
0/255 gray.  The encoder half emits conformant single- and multi-strip
gray/RGB files with any supported compression for byte-real fixtures;
the LZW bit packing is additionally pinned by a hand-built code-level
vector in tests (not just round-trip).

Reference parity: the reference repo has no image surface; this extends
the multimodal matrix (SURVEY §8).  Scale: decode is per-payload
executor work (Arrow-batched), O(pixels) per page, no shuffle.
"""

from __future__ import annotations

import struct

__all__ = [
    "TiffError",
    "is_tiff",
    "decode_tiff",
    "tiff_pages",
    "encode_tiff",
    "lzw_decode",
    "lzw_encode",
    "packbits_decode",
    "packbits_encode",
]


class TiffError(ValueError):
    """Malformed or unsupported TIFF structure."""


def is_tiff(head: bytes) -> bool:
    return head[:4] in (b"II*\x00", b"MM\x00*")


# ---------------------------------------------------------------------------
# compressions
# ---------------------------------------------------------------------------


def packbits_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < expect:
        n = data[pos]
        pos += 1
        if n < 128:
            if pos + n + 1 > len(data):
                raise TiffError("truncated PackBits literal")
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:
            if pos >= len(data):
                raise TiffError("truncated PackBits run")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: noop
    if len(out) != expect:
        raise TiffError(f"PackBits yielded {len(out)} bytes, want {expect}")
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
        else:
            j = i + 1
            while (
                j < n
                and j - i < 128
                and not (j + 1 < n and data[j + 1] == data[j])
            ):
                j += 1
            out += bytes([j - i - 1]) + data[i:j]
            i = j
    return bytes(out)


_CLEAR, _EOI = 256, 257


def lzw_decode(data: bytes, expect: int) -> bytes:
    """TIFF 6.0 §13 LZW: MSB-first codes, width 9..12, EARLY width
    change (bump when the table holds 2^width - 1 entries — one code
    earlier than GIF's LSB variant)."""
    out = bytearray()
    bitpos = 0
    nbits = len(data) * 8
    width = 9
    table: list[bytes] = []
    prev: bytes | None = None

    def reset() -> None:
        nonlocal width, table, prev
        width = 9
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        prev = None

    reset()
    while bitpos + width <= nbits:
        code = 0
        for _ in range(width):
            code = (code << 1) | (
                (data[bitpos >> 3] >> (7 - (bitpos & 7))) & 1
            )
            bitpos += 1
        if code == _CLEAR:
            reset()
            continue
        if code == _EOI:
            break
        if prev is None:
            if code > 255:
                raise TiffError("first LZW code after clear not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise TiffError(f"LZW code {code} beyond table")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            # early change, decoder side: the decoder's table lags the
            # encoder's by one entry (it appends e_{k-1} while reading
            # code_k), so it must widen at (1<<w)-2 where the encoder
            # widens its next-free-code counter at (1<<w)-1 — the
            # classic TIFF-LZW maxcode-1 convention
            if len(table) == (1 << width) - 2 and width < 12:
                width += 1
        prev = entry
        if len(out) >= expect:
            break
    if len(out) < expect:
        raise TiffError(f"LZW yielded {len(out)} bytes, want {expect}")
    return bytes(out[:expect])


def lzw_encode(data: bytes) -> bytes:
    """Encoder twin (fixture half), early-change discipline, emits
    Clear at start and at the 4094-entry cap, EOI at end."""
    bits: list[int] = []

    def put(code: int, width: int) -> None:
        for k in range(width - 1, -1, -1):
            bits.append((code >> k) & 1)

    width = 9
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    put(_CLEAR, width)
    s = b""
    for ch in data:
        c = bytes([ch])
        if s + c in table:
            s += c
            continue
        put(table[s], width)
        table[s + c] = nxt
        nxt += 1
        if nxt == (1 << width) - 1 and width < 12:
            width += 1
        if nxt > 4093:
            put(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
        s = c
    if s:
        put(table[s], width)
    put(_EOI, width)
    while len(bits) % 8:
        bits.append(0)
    return bytes(
        sum(b << (7 - k) for k, b in enumerate(bits[i : i + 8]))
        for i in range(0, len(bits), 8)
    )


# ---------------------------------------------------------------------------
# IFD walk
# ---------------------------------------------------------------------------

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _read_ifd(data: bytes, off: int, e: str) -> tuple[dict, int]:
    if off + 2 > len(data):
        raise TiffError("truncated IFD count")
    n = struct.unpack_from(e + "H", data, off)[0]
    entries: dict[int, list[int]] = {}
    pos = off + 2
    if pos + 12 * n + 4 > len(data):
        raise TiffError("truncated IFD")
    for _ in range(n):
        tag, typ = struct.unpack_from(e + "HH", data, pos)
        cnt = struct.unpack_from(e + "I", data, pos + 4)[0]
        if typ not in _TYPE_SIZE or cnt == 0:
            # unknown types are skippable per spec; a zero-count entry
            # is malformed — treating it as absent keeps every
            # .get(tag, [default])[0] consumer safe
            pos += 12
            continue
        size = _TYPE_SIZE[typ] * cnt
        voff = (
            pos + 8
            if size <= 4
            else struct.unpack_from(e + "I", data, pos + 8)[0]
        )
        if voff + size > len(data):
            raise TiffError(f"tag {tag} value overruns file")
        if typ == 3:
            vals = list(struct.unpack_from(e + f"{cnt}H", data, voff))
        elif typ == 4:
            vals = list(struct.unpack_from(e + f"{cnt}I", data, voff))
        elif typ == 5:
            raw = struct.unpack_from(e + f"{2 * cnt}I", data, voff)
            vals = [raw[2 * i] // max(raw[2 * i + 1], 1) for i in range(cnt)]
        else:
            vals = list(data[voff : voff + size])
        entries[tag] = vals
        pos += 12
    nxt = struct.unpack_from(e + "I", data, pos)[0]
    return entries, nxt


def _ifd_offsets(data: bytes) -> tuple[str, list[int]]:
    data = bytes(data)
    if not is_tiff(data):
        raise TiffError("bad magic (not a TIFF)")
    if len(data) < 8:
        raise TiffError("truncated TIFF header")
    e = "<" if data[:2] == b"II" else ">"
    off = struct.unpack_from(e + "I", data, 4)[0]
    offs = []
    seen = set()
    while off:
        if off in seen:
            raise TiffError("IFD chain loops")
        seen.add(off)
        offs.append(off)
        _, off = _read_ifd(data, off, e)
        if len(offs) > 65535:
            raise TiffError("IFD chain unreasonably long")
    if not offs:
        raise TiffError("no IFDs")
    return e, offs


def tiff_pages(data: bytes) -> list[tuple[int, int]]:
    """Multi-page census: ``[(width, height), ...]`` per IFD — the
    O(metadata) walk (no pixel decode), what a corpus inventory runs."""
    data = bytes(data)
    e, offs = _ifd_offsets(data)
    out = []
    for off in offs:
        ifd, _ = _read_ifd(data, off, e)
        if 256 not in ifd or 257 not in ifd:
            raise TiffError("IFD missing ImageWidth/ImageLength")
        out.append((ifd[256][0], ifd[257][0]))
    return out


def _unpack_bytes(
    raw: bytes, comp: int, want: int, where: str
) -> bytes:
    """Byte-oriented decompression (compressions 1/5/32773) to exactly
    ``want`` bytes."""
    if comp == 1:
        if len(raw) < want:
            raise TiffError(f"{where} shorter than its rows")
        return raw[:want]
    if comp == 32773:
        return packbits_decode(raw, want)
    return lzw_decode(raw, want)


def _undiff(strip: bytes, nrows: int, row_bytes: int, stride: int) -> bytes:
    """Predictor 2 (horizontal differencing) inverse, 8-bit samples."""
    s = bytearray(strip)
    for r in range(nrows):
        base = r * row_bytes
        for x in range(stride, row_bytes):
            s[base + x] = (s[base + x] + s[base + x - stride]) & 0xFF
    return bytes(s)


def decode_tiff(data: bytes, page: int = 0) -> tuple[int, int, int, bytes]:
    data = bytes(data)
    e, offs = _ifd_offsets(data)
    if not 0 <= page < len(offs):
        raise TiffError(f"page {page} out of range ({len(offs)} pages)")
    ifd, _ = _read_ifd(data, offs[page], e)
    w = ifd.get(256, [0])[0]
    h = ifd.get(257, [0])[0]
    if not w or not h:
        raise TiffError("missing/zero dimensions")
    # sanity bound (TIFF carries no header checksum, so a flipped dims
    # byte must not drive 100s-of-MB row allocations): 128k per axis /
    # 64M px total covers any real scanned page with headroom
    if w > 1 << 17 or h > 1 << 17 or w * h > 1 << 26:
        raise TiffError(
            f"implausible dimensions {w}x{h} (corrupt IFD guard)"
        )
    spp = ifd.get(277, [1])[0]
    bits = ifd.get(258, [1])
    comp = ifd.get(259, [1])[0]
    photo = ifd.get(262, [None])[0]
    if photo is None:
        raise TiffError("missing PhotometricInterpretation")
    planar = ifd.get(284, [1])[0]
    pred = ifd.get(317, [1])[0]
    fmt = ifd.get(339, [1])
    tiled = 322 in ifd or 323 in ifd
    if len(bits) != spp:
        if len(bits) == 1:
            bits = bits * spp
        else:
            raise TiffError("BitsPerSample count != SamplesPerPixel")
    if planar not in (1, 2):
        raise TiffError(f"planar configuration {planar} unsupported")
    if pred not in (1, 2):
        raise TiffError(f"predictor {pred} unsupported")
    if pred == 2 and any(b != 8 for b in bits):
        raise TiffError("predictor 2 requires 8-bit samples")
    if photo not in (0, 1, 2, 3) and not (photo == 6 and comp == 7):
        raise TiffError(f"photometric {photo} unsupported")
    if photo == 2 and spp < 3:
        raise TiffError("RGB photometric with <3 samples")

    # --- sample-format / depth classes ------------------------------------
    if set(fmt) == {3}:
        if set(bits) != {32} or spp != 1:
            raise TiffError("float TIFF: only 32-bit single-sample gray")
        depth = "f32"
    elif set(fmt) <= {1, 2} and all(f == 1 for f in fmt):
        if set(bits) == {1} and spp == 1:
            depth = "1"
        elif set(bits) == {8}:
            depth = "8"
        elif set(bits) == {16}:
            depth = "16"
        else:
            raise TiffError(f"bit depths {bits} unsupported (1/8/16)")
    else:
        raise TiffError(f"SampleFormat {fmt} unsupported (uint/float32)")
    if photo == 3 and (spp != 1 or depth != "8"):
        raise TiffError("palette photometric requires one 8-bit sample")
    bps = {"1": 0, "8": 1, "16": 2, "f32": 4}[depth]

    # --- CCITT fax compressions (2 = MH, 3 = G3, 4 = G4) -------------------
    if comp in (2, 3, 4):
        from .ccitt import CcittError, decode_g3, decode_g4, decode_mh

        if depth != "1":
            raise TiffError("CCITT compression requires 1-bit samples")
        if photo not in (0, 1):
            raise TiffError("CCITT compression requires bilevel photometric")
        if planar != 1 or tiled:
            raise TiffError("CCITT tiles/planar unsupported (fail-loud)")
        t4opts = ifd.get(292, [0])[0]
        t6opts = ifd.get(293, [0])[0]
        if (comp == 3 and t4opts & 2) or (comp == 4 and t6opts & 2):
            raise TiffError("uncompressed-mode CCITT unsupported (fail-loud)")
        offsets = ifd.get(273)
        counts = ifd.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise TiffError("missing/mismatched strip tables")
        rps = ifd.get(278, [h])[0] or h
        rows_done = 0
        bit_plane = bytearray()
        for si, (so, sc) in enumerate(zip(offsets, counts)):
            nrows = min(rps, h - rows_done)
            if nrows <= 0:
                raise TiffError("more strips than rows")
            if so + sc > len(data):
                raise TiffError(f"strip {si} overruns file")
            raw = data[so : so + sc]
            try:
                if comp == 2:
                    bit_plane += decode_mh(raw, w, nrows)
                elif comp == 3:
                    bit_plane += decode_g3(
                        raw, w, nrows, two_d=bool(t4opts & 1)
                    )
                else:
                    bit_plane += decode_g4(raw, w, nrows)
            except CcittError as e:
                raise TiffError(f"strip {si} CCITT: {e}") from None
            rows_done += nrows
        if rows_done != h:
            raise TiffError(f"strips cover {rows_done} rows, want {h}")
        # fax bit 1 = black = TIFF sample value 1
        out = bytes(
            255 * (1 - b) if photo == 0 else 255 * b for b in bit_plane
        )
        return w, h, 1, out

    # --- new-style JPEG-in-TIFF (compression 7) ----------------------------
    if comp == 7:
        from .jpeg import JpegError, decode_jpeg

        if depth != "8":
            raise TiffError("JPEG-in-TIFF requires 8-bit samples")
        if photo not in (1, 2, 6):
            raise TiffError(
                f"JPEG-in-TIFF photometric {photo} unsupported"
            )
        if planar != 1 or tiled:
            raise TiffError("JPEG tiles/planar unsupported (fail-loud)")
        tables = ifd.get(347)
        tbytes = bytes(tables) if tables else b""
        if tbytes and (
            tbytes[:2] != b"\xff\xd8" or tbytes[-2:] != b"\xff\xd9"
        ):
            raise TiffError("JPEGTables is not an abbreviated stream")
        offsets = ifd.get(273)
        counts = ifd.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise TiffError("missing/mismatched strip tables")
        rps = ifd.get(278, [h])[0] or h
        rows_done = 0
        raster = bytearray()
        out_ch = None
        for si, (so, sc) in enumerate(zip(offsets, counts)):
            nrows = min(rps, h - rows_done)
            if nrows <= 0:
                raise TiffError("more strips than rows")
            if so + sc > len(data):
                raise TiffError(f"strip {si} overruns file")
            stream = data[so : so + sc]
            if stream[:2] != b"\xff\xd8":
                raise TiffError(f"strip {si} does not start with SOI")
            if tbytes:
                # abbreviated strip: splice the shared DQT/DHT segments
                # in right after the strip's SOI (T.81 abbreviated
                # format; later in-strip tables legally override)
                stream = stream[:2] + tbytes[2:-2] + stream[2:]
            try:
                jw, jh, jch, px = decode_jpeg(stream)
            except JpegError as e:
                raise TiffError(f"strip {si} JPEG: {e}") from None
            if (jw, jh) != (w, nrows):
                raise TiffError(
                    f"strip {si} JPEG dims {jw}x{jh}, want {w}x{nrows}"
                )
            if out_ch is None:
                out_ch = jch
                if jch != spp:
                    raise TiffError(
                        f"JPEG channels {jch} != SamplesPerPixel {spp}"
                    )
            elif jch != out_ch:
                raise TiffError("strips disagree on channel count")
            raster += px
            rows_done += nrows
        if rows_done != h:
            raise TiffError(f"strips cover {rows_done} rows, want {h}")
        return w, h, out_ch, bytes(raster)

    if comp not in (1, 5, 32773):
        raise TiffError(f"compression {comp} unsupported (OJPEG gate)")

    # --- raster assembly: tiles or strips, chunky or planar ----------------
    if tiled:
        if planar != 1:
            raise TiffError("planar tiles unsupported (fail-loud)")
        if depth == "1":
            raise TiffError("1-bit tiles unsupported (fail-loud)")
        tw = ifd.get(322, [0])[0]
        th = ifd.get(323, [0])[0]
        toffs = ifd.get(324)
        tcnts = ifd.get(325)
        if not tw or not th or not toffs or not tcnts:
            raise TiffError("missing tile tables")
        if len(toffs) != len(tcnts):
            raise TiffError("TileOffsets/TileByteCounts length mismatch")
        across = (w + tw - 1) // tw
        down = (h + th - 1) // th
        if len(toffs) != across * down:
            raise TiffError(
                f"{len(toffs)} tiles, want {across}x{down}"
            )
        row_bytes = w * spp * bps
        tile_row_bytes = tw * spp * bps
        raster = bytearray(row_bytes * h)
        for ti, (to, tc) in enumerate(zip(toffs, tcnts)):
            if to + tc > len(data):
                raise TiffError(f"tile {ti} overruns file")
            tile = _unpack_bytes(
                data[to : to + tc], comp, tile_row_bytes * th, f"tile {ti}"
            )
            if pred == 2:
                tile = _undiff(tile, th, tile_row_bytes, spp)
            ty, tx = divmod(ti, across)
            x0 = tx * tw
            y0 = ty * th
            ncols = min(tw, w - x0) * spp * bps
            for r in range(min(th, h - y0)):
                dst = (y0 + r) * row_bytes + x0 * spp * bps
                src = r * tile_row_bytes
                raster[dst : dst + ncols] = tile[src : src + ncols]
        raster = bytes(raster)
    else:
        offsets = ifd.get(273)
        counts = ifd.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise TiffError("missing/mismatched strip tables")
        rps = ifd.get(278, [h])[0] or h
        spl = (h + rps - 1) // rps  # strips per plane
        nplanes = spp if planar == 2 else 1
        plane_spp = 1 if planar == 2 else spp
        if len(offsets) != spl * nplanes:
            raise TiffError(
                f"{len(offsets)} strips, want {spl} x {nplanes} planes"
            )
        if depth == "1":
            row_bytes = (w * plane_spp + 7) // 8
        else:
            row_bytes = w * plane_spp * bps
        planes: list[bytes] = []
        for p in range(nplanes):
            rows_done = 0
            plane = bytearray()
            for si in range(spl):
                so = offsets[p * spl + si]
                sc = counts[p * spl + si]
                nrows = min(rps, h - rows_done)
                if nrows <= 0:
                    raise TiffError("more strips than rows")
                if so + sc > len(data):
                    raise TiffError(f"strip {p}/{si} overruns file")
                strip = _unpack_bytes(
                    data[so : so + sc], comp, row_bytes * nrows,
                    f"strip {p}/{si}",
                )
                if pred == 2:
                    strip = _undiff(strip, nrows, row_bytes, plane_spp)
                plane += strip
                rows_done += nrows
            if rows_done != h:
                raise TiffError(f"strips cover {rows_done} rows, want {h}")
            planes.append(bytes(plane))
        if nplanes == 1:
            raster = planes[0]
        else:
            # interleave plane-major samples back to chunky
            raster = bytearray(w * h * spp * bps)
            for p, plane in enumerate(planes):
                for px in range(w * h):
                    raster[
                        (px * spp + p) * bps : (px * spp + p) * bps + bps
                    ] = plane[px * bps : (px + 1) * bps]
            raster = bytes(raster)

    # --- sample conversion to the byte contract ----------------------------
    if depth == "1":
        row_bytes = (w + 7) // 8
        out = bytearray(w * h)
        for y in range(h):
            base = y * row_bytes
            for x in range(w):
                bit = (raster[base + (x >> 3)] >> (7 - (x & 7))) & 1
                # photometric 0: 0 is white
                out[y * w + x] = (
                    255 * (1 - bit) if photo == 0 else 255 * bit
                )
        return w, h, 1, bytes(out)
    if depth == "f32":
        vals = struct.unpack(e + f"{w * h}f", raster)
        # NaN is a legitimate nodata value in float rasters: map to 0
        # (min/max would propagate it into int() and crash)
        out = bytearray(
            0 if v != v else int(min(max(v, 0.0), 1.0) * 255 + 0.5)
            for v in vals
        )
        if photo == 0:
            out = bytearray(255 - v for v in out)
        return w, h, 1, bytes(out)
    if depth == "16":
        n = w * h * spp
        vals = struct.unpack(e + f"{n}H", raster)
        raster = bytes(v >> 8 for v in vals)
    if photo == 3:
        cmap = ifd.get(320)
        if not cmap or len(cmap) != 3 * 256:
            raise TiffError("palette TIFF missing 3*256 ColorMap")
        out = bytearray()
        for i in raster:
            out += bytes(
                (cmap[i] >> 8, cmap[256 + i] >> 8, cmap[512 + i] >> 8)
            )
        return w, h, 3, bytes(out)
    if photo == 0:
        raster = bytes(255 - v for v in raster)
    if spp > (1 if photo in (0, 1) else 3):
        # extra samples (alpha): keep the first 1/3 channels, honest drop
        keep = 1 if photo in (0, 1) else 3
        out = bytearray()
        for px in range(w * h):
            out += raster[px * spp : px * spp + keep]
        return w, h, keep, bytes(out)
    return w, h, spp, bytes(raster)


# ---------------------------------------------------------------------------
# encoder (fixture half)
# ---------------------------------------------------------------------------


def _split_jpeg_tables(strips: list[bytes]) -> tuple[bytes, list[bytes]]:
    """Extract the shared DQT/DHT segments out of per-strip JPEG streams
    into one abbreviated JPEGTables stream (SOI + tables + EOI), leaving
    the strips abbreviated.  All strips must carry identical tables."""
    tables: bytes | None = None
    out: list[bytes] = []
    for stream in strips:
        if stream[:2] != b"\xff\xd8":
            raise TiffError("JPEG strip missing SOI")
        segs = bytearray()
        kept = bytearray(b"\xff\xd8")
        pos = 2
        while pos + 4 <= len(stream):
            if stream[pos] != 0xFF:
                raise TiffError("JPEG marker desync in tables split")
            marker = stream[pos + 1]
            (ln,) = struct.unpack_from(">H", stream, pos + 2)
            seg = stream[pos : pos + 2 + ln]
            pos += 2 + ln
            if marker in (0xDB, 0xC4):  # DQT / DHT
                segs += seg
            else:
                kept += seg
            if marker == 0xDA:  # SOS: rest is entropy data + EOI
                kept += stream[pos:]
                break
        this = bytes(b"\xff\xd8" + segs + b"\xff\xd9")
        if tables is None:
            tables = this
        elif tables != this:
            raise TiffError("strips disagree on JPEG tables")
        out.append(bytes(kept))
    if tables is None:
        raise TiffError("no strips to split tables from")
    return tables, out


def _byte_compress(strip: bytes, compression: int) -> bytes:
    if compression == 5:
        return lzw_encode(strip)
    if compression == 32773:
        return packbits_encode(strip)
    return strip


def encode_tiff(
    w: int,
    h: int,
    channels: int,
    pixels,
    *,
    compression: int = 1,
    predictor: int = 1,
    rows_per_strip: int = 0,
    big_endian: bool = False,
    pages: list[tuple[int, int, int, bytes]] | None = None,
    tile: tuple[int, int] | None = None,
    planar: int = 1,
    bits: int = 8,
    sample_format: int = 1,
    t4_2d: bool = False,
    jpeg_tables: bool = False,
) -> bytes:
    """Conformant TIFF fixture encoder.  Base surface: gray-8 / RGB-8
    multi-strip with compression in {1, 5, 32773} and optional
    predictor 2, either byte order, extra ``pages`` chained as IFDs.
    Extensions (first image only; mutually exclusive where noted):
    ``tile=(tw, th)`` tiled layout (chunky only, edge tiles zero-padded);
    ``planar=2`` plane-major strips; ``bits=16`` with ``pixels`` a
    sequence of uint16 sample values; ``sample_format=3`` 32-bit float
    gray with ``pixels`` a sequence of floats; ``compression`` 2/3/4
    CCITT bilevel (``pixels`` gray bytes restricted to {0, 255},
    photometric 0, BitsPerSample 1, ``t4_2d`` sets T4Options bit 0)."""
    special = (
        compression in (2, 3, 4, 7)
        or tile is not None
        or planar == 2
        or bits == 16
        or sample_format == 3
    )
    if special and pages:
        raise TiffError("encoder: extra pages only with the base surface")
    imgs = [(w, h, channels, pixels)] + list(pages or [])
    e = ">" if big_endian else "<"
    blob = bytearray(b"MM\x00*" if big_endian else b"II*\x00")
    blob += b"\x00\x00\x00\x00"  # first IFD offset patched below
    ifd_ptr_at = 4
    for img_i, (pw, ph, pc, px) in enumerate(imgs):
        ccitt = compression in (2, 3, 4) and img_i == 0
        injpeg = compression == 7 and img_i == 0
        f32 = sample_format == 3 and img_i == 0
        b16 = bits == 16 and img_i == 0
        use_tile = tile if img_i == 0 else None
        use_planar = planar if img_i == 0 else 1
        if pc not in (1, 3) or len(px) != pw * ph * pc:
            raise TiffError("encoder: bad plane")
        if f32:
            if pc != 1 or compression != 1:
                raise TiffError("encoder: float gray, compression 1 only")
            raw = struct.pack(e + f"{pw * ph}f", *px)
        elif b16:
            if compression == 5 or predictor == 2:
                raise TiffError("encoder: 16-bit with LZW/predictor")
            raw = struct.pack(e + f"{pw * ph * pc}H", *px)
        else:
            raw = bytes(px)
        bps = 4 if f32 else (2 if b16 else 1)

        tags: list[tuple[int, int, int, int]] = []
        extra: list[tuple[int, int, list[int]]] = []

        if ccitt:
            from .ccitt import encode_g3, encode_g4, encode_mh

            if pc != 1 or f32 or b16 or use_tile or use_planar != 1:
                raise TiffError("encoder: CCITT is bilevel gray strips")
            if any(v not in (0, 255) for v in raw):
                raise TiffError("encoder: CCITT pixels must be 0/255")
            # photometric 0 (WhiteIsZero): gray 0 -> sample 1 -> fax black
            bil = bytes(1 if v == 0 else 0 for v in raw)
            rps = rows_per_strip or ph
            strips = []
            y = 0
            while y < ph:
                nrows = min(rps, ph - y)
                seg = bil[y * pw : (y + nrows) * pw]
                if compression == 2:
                    strips.append(encode_mh(seg, pw, nrows))
                elif compression == 3:
                    strips.append(encode_g3(seg, pw, nrows, two_d=t4_2d))
                else:
                    strips.append(encode_g4(seg, pw, nrows))
                y += nrows
            if compression == 3:
                extra.append((292, 4, [1 if t4_2d else 0]))
            elif compression == 4:
                extra.append((293, 4, [0]))
        elif injpeg:
            from .jpeg import encode_jpeg

            if pc not in (1, 3) or f32 or b16 or use_tile or use_planar != 1:
                raise TiffError("encoder: JPEG-in-TIFF is 8-bit strips")
            rps = rows_per_strip or ph
            strips = []
            y = 0
            row_bytes = pw * pc
            while y < ph:
                nrows = min(rps, ph - y)
                strips.append(
                    encode_jpeg(
                        pw, nrows,
                        raw[y * row_bytes : (y + nrows) * row_bytes],
                        channels=pc, quant=1,
                    )
                )
                y += nrows
            if jpeg_tables:
                tbl, strips = _split_jpeg_tables(strips)
                extra.append((347, 1, list(tbl)))
        elif use_tile:
            tw, th = use_tile
            if use_planar != 1:
                raise TiffError("encoder: planar tiles unsupported")
            if f32 or b16 or compression not in (1, 5, 32773):
                raise TiffError("encoder: tiles are 8-bit byte-compressed")
            across = (pw + tw - 1) // tw
            down = (ph + th - 1) // th
            tile_row_bytes = tw * pc
            strips = []
            for ty in range(down):
                for tx in range(across):
                    t = bytearray(tile_row_bytes * th)
                    ncols = min(tw, pw - tx * tw) * pc
                    for r in range(min(th, ph - ty * th)):
                        src = ((ty * th + r) * pw + tx * tw) * pc
                        t[r * tile_row_bytes : r * tile_row_bytes + ncols] = (
                            raw[src : src + ncols]
                        )
                    t = bytes(t)
                    if predictor == 2:
                        s = bytearray(t)
                        for r in range(th):
                            base = r * tile_row_bytes
                            for x in range(tile_row_bytes - 1, pc - 1, -1):
                                s[base + x] = (
                                    s[base + x] - s[base + x - pc]
                                ) & 0xFF
                        t = bytes(s)
                    strips.append(_byte_compress(t, compression))
        else:
            rps = rows_per_strip or ph
            plane_pc = 1 if use_planar == 2 else pc
            row_bytes = pw * plane_pc * bps
            strips = []
            nplanes = pc if use_planar == 2 else 1
            for p in range(nplanes):
                if nplanes == 1:
                    plane = raw
                else:
                    plane = bytes(
                        b
                        for i in range(pw * ph)
                        for b in raw[
                            (i * pc + p) * bps : (i * pc + p) * bps + bps
                        ]
                    )
                y = 0
                while y < ph:
                    nrows = min(rps, ph - y)
                    strip = bytes(
                        plane[y * row_bytes : (y + nrows) * row_bytes]
                    )
                    if predictor == 2:
                        s = bytearray(strip)
                        for r in range(nrows):
                            base = r * row_bytes
                            for x in range(
                                row_bytes - 1, plane_pc - 1, -1
                            ):
                                s[base + x] = (
                                    s[base + x] - s[base + x - plane_pc]
                                ) & 0xFF
                        strip = bytes(s)
                    strips.append(_byte_compress(strip, compression))
                    y += nrows
        soffs = []
        for s in strips:
            soffs.append(len(blob))
            blob += s
        if len(blob) % 2:
            blob += b"\x00"

        def arr(vals: list[int], typ: int) -> tuple[int, int, int]:
            """Return (type, count, value-or-offset), spilling >4-byte
            arrays into the blob."""
            size = _TYPE_SIZE[typ] * len(vals)
            fmt = {1: "B", 3: "H", 4: "I"}[typ]
            if size <= 4:
                raw = struct.pack(e + f"{len(vals)}{fmt}", *vals)
                raw += b"\x00" * (4 - len(raw))
                return typ, len(vals), struct.unpack(e + "I", raw)[0]
            at = len(blob)
            blob.extend(struct.pack(e + f"{len(vals)}{fmt}", *vals))
            return typ, len(vals), at

        def tag(t: int, typ: int, vals: list[int]) -> None:
            ty, cnt, v = arr(vals, typ)
            tags.append((t, ty, cnt, v))

        tag(256, 4, [pw])
        tag(257, 4, [ph])
        if ccitt:
            tag(258, 3, [1])
        elif f32:
            tag(258, 3, [32])
            tag(339, 3, [3])
        else:
            tag(258, 3, [16 if b16 else 8] * pc)
        tag(259, 3, [compression])
        if ccitt:
            tag(262, 3, [0])
        elif injpeg and pc == 3:
            tag(262, 3, [6])  # YCbCr: the JPEG stream owns the transform
        else:
            tag(262, 3, [1 if pc == 1 else 2])
        tag(277, 3, [pc])
        if use_tile:
            tw, th = use_tile
            tag(322, 4, [tw])
            tag(323, 4, [th])
            tag(324, 4, soffs)
            tag(325, 4, [len(s) for s in strips])
        else:
            tag(273, 4, soffs)
            tag(278, 4, [rps])
            tag(279, 4, [len(s) for s in strips])
        if use_planar == 2:
            tag(284, 3, [2])
        if predictor == 2:
            tag(317, 3, [2])
        for t, typ, vals in extra:
            tag(t, typ, vals)
        tags.sort()
        ifd_at = len(blob)
        struct.pack_into(e + "I", blob, ifd_ptr_at, ifd_at)
        blob += struct.pack(e + "H", len(tags))
        for t, ty, cnt, v in tags:
            blob += struct.pack(e + "HHI", t, ty, cnt)
            blob += struct.pack(e + "I", v)
        ifd_ptr_at = len(blob)
        blob += b"\x00\x00\x00\x00"  # next-IFD pointer (patched or final)
    return bytes(blob)
