"""Pure-stdlib animated-GIF codec — the REAL frame-decode path for the
video modality of the multimodal pipeline.

The container has no pyav/ffmpeg, but GIF (87a/89a) needs neither: the
container is a fixed header + logical screen descriptor + color table,
each frame is an image descriptor followed by a variable-code-width LZW
stream packed LSB-first into 255-byte sub-blocks, and animation timing
rides in Graphic Control Extension blocks (delay in centiseconds).  This
module implements exactly that — a real LZW decompressor (variable code
width 3..12 bits, clear/EOI codes, dictionary growth and reset) and a
real LZW compressor for the encoder — for the full-frame subset,
interlaced (round 7: appendix-E four-pass row reorder) or sequential.
Partial-frame images (left/top offset, sub-rectangle compositing) raise
:class:`GifError`, and the multimodal layer falls back to its documented
deterministic fake, mirroring the PNG policy (operators/png.py).

The encoder exists so tests and catalog queries can synthesize REAL
byte-accurate animated GIFs deterministically on executors instead of
checking in binaries; its output round-trips through the decoder and
through any standards-compliant GIF reader.

Reference-parity note: the reference engine (/root/reference) has no
multimodal surface at all — this is north-star scope for the
training-data pipeline (frame sampling for video corpora), with the
Spark-side plumbing in operators/multimodal.sample_frames.

Scale note: decode runs executor-side inside Arrow-batched mapInPandas —
the driver never touches frame bytes; this module is plain per-payload
Python invoked on workers, so throughput scales with executor count.
"""

from __future__ import annotations

import struct

__all__ = ["GifError", "is_gif", "decode_gif", "encode_gif"]

_SIGNATURES = (b"GIF87a", b"GIF89a")
_MAX_CODE_WIDTH = 12


class GifError(ValueError):
    """Raised for malformed input or a GIF variant outside the supported
    subset (partial-frame compositing) — callers fall back to the
    documented fake-decode stand-in."""


def is_gif(data: bytes) -> bool:
    return bytes(data[:6]) in _SIGNATURES


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, variable code width, clear/EOI)
# ---------------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytearray:
    """Decompress a GIF LZW stream to ``n_pixels`` palette indices."""
    if not 2 <= min_code_size <= 11:
        raise GifError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh():
        return {i: bytes([i]) for i in range(clear)}

    table = fresh()
    width = min_code_size + 1
    next_code = eoi + 1
    out = bytearray()
    prev: bytes | None = None

    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise GifError("LZW stream truncated (no EOI)")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = fresh()
            width = min_code_size + 1
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise GifError(f"first code {code} not a literal")
        else:
            entry = table.get(code)
            if entry is None:
                if code != next_code:
                    raise GifError(f"LZW code {code} out of sequence")
                entry = prev + prev[:1]
            if next_code < (1 << _MAX_CODE_WIDTH):
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << width) and width < _MAX_CODE_WIDTH:
                    width += 1
        out.extend(entry)
        if len(out) > n_pixels:
            raise GifError("LZW output exceeds frame size")
        prev = entry
    if len(out) != n_pixels:
        raise GifError(f"LZW produced {len(out)} of {n_pixels} pixels")
    return out


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Compress palette indices with real GIF LZW (dictionary build,
    variable width, reset at 4096) — not the clear-code-spam
    'uncompressed GIF' trick, so decoders exercise genuine dictionary
    growth."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    width = min_code_size + 1
    next_code = eoi + 1
    emit(clear, width)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        if next_code < (1 << _MAX_CODE_WIDTH):
            table[cand] = next_code
            # one-step lag vs the decoder is deliberate: the decoder only
            # inserts entry k while PROCESSING code k+1, so when the encoder
            # emits code k+1 its table is one entry ahead — growing on the
            # pre-increment boundary keeps the widths bit-for-bit in sync
            if next_code == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            width = min_code_size + 1
            next_code = eoi + 1
        run = bytes([b])
    if run:
        emit(table[run], width)
        # the decoder adds one more dictionary entry while PROCESSING this
        # final code — if that lands exactly on a width boundary it reads
        # EOI at the wider size, so mirror the bump (no entry to add)
        if next_code < (1 << _MAX_CODE_WIDTH):
            if next_code == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
            next_code += 1
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------


def decode_gif(data: bytes) -> tuple[int, int, list[tuple[int, bytes]]]:
    """Decode an animated GIF to ``(width, height, frames)`` where each
    frame is ``(delay_ms, rgb_bytes)`` with ``rgb_bytes`` of length
    ``width * height * 3`` (palette applied, row-major).

    Supported subset: full-frame images, interlaced or not (left=top=0 and
    frame dims equal to the logical screen), global and/or local color
    tables.  Transparency/disposal compositing is out of scope — each
    frame stands alone, which is exactly what the frame-sampling operator
    needs.  Anything outside the subset raises :class:`GifError`.
    """
    data = bytes(data)
    if not is_gif(data):
        raise GifError("not a GIF (bad signature)")
    if len(data) < 13:
        raise GifError("truncated header")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    global_table: list[tuple[int, int, int]] | None = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        raw = data[pos : pos + 3 * n]
        if len(raw) != 3 * n:
            raise GifError("truncated global color table")
        global_table = [(raw[3 * i], raw[3 * i + 1], raw[3 * i + 2]) for i in range(n)]
        pos += 3 * n

    frames: list[tuple[int, bytes]] = []
    pending_delay_ms = 0

    def read_subblocks(p: int) -> tuple[bytes, int]:
        chunks = bytearray()
        while True:
            if p >= len(data):
                raise GifError("truncated sub-blocks")
            ln = data[p]
            p += 1
            if ln == 0:
                return bytes(chunks), p
            chunks += data[p : p + ln]
            if len(data) < p + ln:
                raise GifError("truncated sub-block body")
            p += ln
    while True:
        if pos >= len(data):
            raise GifError("missing trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise GifError("truncated extension")
            label = data[pos]
            pos += 1
            body, pos = read_subblocks(pos)
            if label == 0xF9 and len(body) >= 3:  # graphic control
                delay_cs = struct.unpack("<H", body[1:3])[0]
                pending_delay_ms = delay_cs * 10
            continue
        if block != 0x2C:
            raise GifError(f"unknown block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        if left or top or w != sw or h != sh:
            raise GifError("partial-frame GIF not supported")
        table = global_table
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            raw = data[pos : pos + 3 * n]
            if len(raw) != 3 * n:
                raise GifError("truncated local color table")
            table = [(raw[3 * i], raw[3 * i + 1], raw[3 * i + 2]) for i in range(n)]
            pos += 3 * n
        if table is None:
            raise GifError("frame has no color table")
        min_code_size = data[pos]
        pos += 1
        lzw, pos = read_subblocks(pos)
        idx = _lzw_decode(min_code_size, lzw, w * h)
        if ipacked & 0x40:
            # GIF89a appendix E interlace: rows arrive in four passes
            # (8k, 8k+4, 4k+2, 2k+1); reorder to top-down
            deint = bytearray(w * h)
            src = 0
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                for y in range(start, h, step):
                    deint[y * w : (y + 1) * w] = idx[src : src + w]
                    src += w
            idx = bytes(deint)
        ntab = len(table)
        rgb = bytearray(w * h * 3)
        for i, v in enumerate(idx):
            if v >= ntab:
                raise GifError(f"palette index {v} out of range {ntab}")
            r, g, b = table[v]
            rgb[3 * i] = r
            rgb[3 * i + 1] = g
            rgb[3 * i + 2] = b
        frames.append((pending_delay_ms, bytes(rgb)))
        pending_delay_ms = 0
    if not frames:
        raise GifError("no frames")
    return sw, sh, frames


def encode_gif(
    width: int,
    height: int,
    frames: list[bytes],
    palette: list[tuple[int, int, int]],
    *,
    delay_ms: int = 40,
    interlace: bool = False,
) -> bytes:
    """Encode palette-index frames (each ``width*height`` bytes of indices
    into ``palette``) as a real animated GIF89a with genuine LZW streams.
    Palette is padded to the next power of two (2..256 entries).
    ``interlace=True`` writes rows in the four-pass appendix-E order and
    sets the image-descriptor flag (round 7 — fixture path for the
    decoder's deinterlacer)."""
    if not frames:
        raise GifError("need at least one frame")
    n = len(palette)
    if not 1 <= n <= 256:
        raise GifError("palette size out of range")
    bits = 1
    while (1 << bits) < n:
        bits += 1
    bits = max(bits, 1)
    size = 1 << bits
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | ((bits - 1) & 0x07), 0, 0)
    for i in range(size):
        r, g, b = palette[i] if i < n else (0, 0, 0)
        out += bytes((r, g, b))
    min_code = max(bits, 2)
    delay_cs = max(delay_ms // 10, 0)
    for idx in frames:
        if len(idx) != width * height:
            raise GifError("frame size mismatch")
        if max(idx) >= size:
            raise GifError("index outside palette")
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, width, height, 0x40 if interlace else 0
        )
        out.append(min_code)
        if interlace:
            rows = bytearray()
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                for y in range(start, height, step):
                    rows += idx[y * width : (y + 1) * width]
            idx = bytes(rows)
        lzw = _lzw_encode(min_code, bytes(idx))
        for off in range(0, len(lzw), 255):
            chunk = lzw[off : off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
