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
sample.  Honest gates (raise loud): tiles, planar configuration 2,
16-bit samples, CCITT/JPEG-in-TIFF compressions, float sample formats.

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
        if typ not in _TYPE_SIZE:
            pos += 12
            continue  # unknown types are skippable per spec
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


def decode_tiff(data: bytes, page: int = 0) -> tuple[int, int, int, bytes]:
    data = bytes(data)
    e, offs = _ifd_offsets(data)
    if not 0 <= page < len(offs):
        raise TiffError(f"page {page} out of range ({len(offs)} pages)")
    ifd, _ = _read_ifd(data, offs[page], e)
    if 322 in ifd or 323 in ifd:
        raise TiffError("tiled TIFF unsupported (fail-loud)")
    w = ifd.get(256, [0])[0]
    h = ifd.get(257, [0])[0]
    if not w or not h:
        raise TiffError("missing/zero dimensions")
    spp = ifd.get(277, [1])[0]
    bits = ifd.get(258, [1])
    comp = ifd.get(259, [1])[0]
    photo = ifd.get(262, [None])[0]
    if photo is None:
        raise TiffError("missing PhotometricInterpretation")
    planar = ifd.get(284, [1])[0]
    pred = ifd.get(317, [1])[0]
    fmt = ifd.get(339, [1])
    if planar != 1:
        raise TiffError("planar configuration 2 unsupported (fail-loud)")
    if any(f != 1 for f in fmt):
        raise TiffError("non-uint SampleFormat unsupported (fail-loud)")
    if len(bits) != spp:
        if len(bits) == 1:
            bits = bits * spp
        else:
            raise TiffError("BitsPerSample count != SamplesPerPixel")
    if comp not in (1, 5, 32773):
        raise TiffError(
            f"compression {comp} unsupported (CCITT/JPEG-in-TIFF gate)"
        )
    if pred not in (1, 2):
        raise TiffError(f"predictor {pred} unsupported")
    if pred == 2 and any(b != 8 for b in bits):
        raise TiffError("predictor 2 requires 8-bit samples")
    if set(bits) == {1} and spp == 1:
        depth1 = True
    elif set(bits) == {8}:
        depth1 = False
    else:
        raise TiffError(f"bit depths {bits} unsupported (1 or 8 only)")
    if photo == 2 and spp < 3:
        raise TiffError("RGB photometric with <3 samples")
    if photo == 3 and (spp != 1 or depth1):
        raise TiffError("palette photometric requires one 8-bit sample")
    if photo not in (0, 1, 2, 3):
        raise TiffError(f"photometric {photo} unsupported")
    offsets = ifd.get(273)
    counts = ifd.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise TiffError("missing/mismatched strip tables")
    rps = ifd.get(278, [h])[0] or h
    row_bytes = (w * spp * bits[0] + 7) // 8
    rows_done = 0
    raster = bytearray()
    for si, (so, sc) in enumerate(zip(offsets, counts)):
        nrows = min(rps, h - rows_done)
        if nrows <= 0:
            raise TiffError("more strips than rows")
        if so + sc > len(data):
            raise TiffError(f"strip {si} overruns file")
        raw = data[so : so + sc]
        want = row_bytes * nrows
        if comp == 1:
            if len(raw) < want:
                raise TiffError(f"strip {si} shorter than its rows")
            strip = raw[:want]
        elif comp == 32773:
            strip = packbits_decode(raw, want)
        else:
            strip = lzw_decode(raw, want)
        if pred == 2:
            strip = bytearray(strip)
            for r in range(nrows):
                base = r * row_bytes
                for x in range(spp, row_bytes):
                    strip[base + x] = (
                        strip[base + x] + strip[base + x - spp]
                    ) & 0xFF
            strip = bytes(strip)
        raster += strip
        rows_done += nrows
    if rows_done != h:
        raise TiffError(f"strips cover {rows_done} rows, want {h}")
    if depth1:
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


def encode_tiff(
    w: int,
    h: int,
    channels: int,
    pixels: bytes,
    *,
    compression: int = 1,
    predictor: int = 1,
    rows_per_strip: int = 0,
    big_endian: bool = False,
    pages: list[tuple[int, int, int, bytes]] | None = None,
) -> bytes:
    """Conformant gray-8 / RGB-8 TIFF: multi-strip, compression in
    {1, 5, 32773}, optional predictor 2 under LZW, either byte order,
    optional extra ``pages`` (same tuple shape) chained as IFDs."""
    imgs = [(w, h, channels, pixels)] + list(pages or [])
    e = ">" if big_endian else "<"
    blob = bytearray(b"MM\x00*" if big_endian else b"II*\x00")
    blob += b"\x00\x00\x00\x00"  # first IFD offset patched below
    ifd_ptr_at = 4
    for (pw, ph, pc, px) in imgs:
        if pc not in (1, 3) or len(px) != pw * ph * pc:
            raise TiffError("encoder: bad plane")
        rps = rows_per_strip or ph
        row_bytes = pw * pc
        strips: list[bytes] = []
        y = 0
        while y < ph:
            nrows = min(rps, ph - y)
            strip = bytes(px[y * row_bytes : (y + nrows) * row_bytes])
            if predictor == 2:
                s = bytearray(strip)
                for r in range(nrows):
                    base = r * row_bytes
                    for x in range(row_bytes - 1, pc - 1, -1):
                        s[base + x] = (s[base + x] - s[base + x - pc]) & 0xFF
                strip = bytes(s)
            if compression == 5:
                strip = lzw_encode(strip)
            elif compression == 32773:
                strip = packbits_encode(strip)
            strips.append(strip)
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
            fmt = {3: "H", 4: "I"}[typ]
            if size <= 4:
                raw = struct.pack(e + f"{len(vals)}{fmt}", *vals)
                raw += b"\x00" * (4 - len(raw))
                return typ, len(vals), struct.unpack(e + "I", raw)[0]
            at = len(blob)
            blob.extend(struct.pack(e + f"{len(vals)}{fmt}", *vals))
            return typ, len(vals), at

        tags: list[tuple[int, int, int, int]] = []

        def tag(t: int, typ: int, vals: list[int]) -> None:
            ty, cnt, v = arr(vals, typ)
            tags.append((t, ty, cnt, v))

        tag(256, 4, [pw])
        tag(257, 4, [ph])
        tag(258, 3, [8] * pc)
        tag(259, 3, [compression])
        tag(262, 3, [1 if pc == 1 else 2])
        tag(273, 4, soffs)
        tag(277, 3, [pc])
        tag(278, 4, [rps])
        tag(279, 4, [len(s) for s in strips])
        if predictor == 2:
            tag(317, 3, [2])
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
