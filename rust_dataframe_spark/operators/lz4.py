"""Pure-stdlib LZ4 codec — block format + frame format, the fast
compression real corpus shards and event-log dumps ship in (``.lz4``).

Block format (the published LZ4 block spec): token nibbles with
additive 255-byte length extensions, 2-byte little-endian match
offsets, overlap-safe match copy (offset < length replays the window
byte-by-byte), end-of-block literal run.  Decoder enforces the
malformed-stream rules loudly: zero offset, offset beyond the decoded
window, truncated literals/extensions, output-size mismatch.

Frame format (LZ4 Frame spec v1.6.x): magic ``0x184D2204``, FLG/BD
descriptor with version-bits check, header checksum (XXH32 high byte),
optional content size, per-block uncompressed bit, optional block
checksums and content checksum (XXH32, enforced when present),
EndMark.  Dictionaries and linked blocks gate loudly.

The encoder half emits greedy hash-table-matched blocks honouring the
spec's end restrictions (last 5 bytes literals, no match starting
within 12 bytes of the end) so fixtures are byte-real compressed
streams, not stored-only.  Checksums ride on ``operators/xxhash.py``,
whose XXH64 twin is pinned against Spark's JVM ``xxhash64``.

Reference parity: the reference repo has no compression surface; this
extends the archive front door (SURVEY §8).  Scale: decode is
per-payload executor work, O(bytes), no shuffle.
"""

from __future__ import annotations

import struct

from .xxhash import xxh32

__all__ = [
    "Lz4Error",
    "is_lz4_frame",
    "lz4_block_decompress",
    "lz4_block_compress",
    "lz4_frame_decompress",
    "lz4_frame_compress",
]

_MAGIC = 0x184D2204


class Lz4Error(ValueError):
    """Malformed or unsupported LZ4 stream."""


def is_lz4_frame(head: bytes) -> bool:
    return len(head) >= 4 and struct.unpack_from("<I", head)[0] == _MAGIC


# ---------------------------------------------------------------------------
# block format
# ---------------------------------------------------------------------------


def lz4_block_decompress(
    data: bytes, expect: int | None = None, *, max_size: int | None = None
) -> bytes:
    """Decode one LZ4 block.  ``expect`` (when known from the frame)
    bounds and validates the output size; ``max_size`` caps growth for
    frame blocks whose exact size is unknown (a corrupt block must not
    amplify into hundreds of MB before any check fires)."""
    data = bytes(data)
    cap = expect if expect is not None else max_size
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        token = data[pos]
        pos += 1
        # literals
        lit = token >> 4
        if lit == 15:
            while True:
                if pos >= n:
                    raise Lz4Error("truncated literal-length extension")
                b = data[pos]
                pos += 1
                lit += b
                if b != 255:
                    break
        if pos + lit > n:
            raise Lz4Error("truncated literals")
        out += data[pos : pos + lit]
        pos += lit
        if pos == n:
            break  # last sequence: literals only
        # match
        if pos + 2 > n:
            raise Lz4Error("truncated match offset")
        (off,) = struct.unpack_from("<H", data, pos)
        pos += 2
        if off == 0:
            raise Lz4Error("zero match offset")
        if off > len(out):
            raise Lz4Error(
                f"match offset {off} beyond decoded window {len(out)}"
            )
        ml = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                if pos >= n:
                    raise Lz4Error("truncated match-length extension")
                b = data[pos]
                pos += 1
                ml += b
                if b != 255:
                    break
        if cap is not None and len(out) + ml > cap:
            raise Lz4Error("block inflates beyond its size bound")
        base = len(out) - off
        for i in range(ml):  # overlap-safe
            out.append(out[base + i])
    if expect is not None and len(out) != expect:
        raise Lz4Error(f"block yielded {len(out)} bytes, want {expect}")
    return bytes(out)


def lz4_block_compress(data: bytes) -> bytes:
    """Greedy single-probe hash-table matcher with the spec's end
    restrictions.  Always produces a valid block (worst case: all
    literals)."""
    data = bytes(data)
    n = len(data)
    out = bytearray()

    def put_len(first: int, rest_needed: int, length: int) -> bytes:
        if length < first:
            return b""
        length -= first
        b = bytearray()
        while length >= 255:
            b.append(255)
            length -= 255
        b.append(length)
        return bytes(b)

    def emit(lit_start: int, lit_end: int, off: int, ml: int) -> None:
        lit = lit_end - lit_start
        token = (min(lit, 15) << 4)
        if off:
            token |= min(ml - 4, 15)
        out.append(token)
        out.extend(put_len(15, 255, lit))
        out.extend(data[lit_start:lit_end])
        if off:
            out.extend(struct.pack("<H", off))
            out.extend(put_len(15, 255, ml - 4))

    if n < 13:  # too short for any legal match
        emit(0, n, 0, 0)
        return bytes(out)

    table: dict[bytes, int] = {}
    anchor = 0
    i = 0
    limit = n - 12  # no match may start past here
    while i < limit:
        key = data[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 65535 and data[cand : cand + 4] == key:
            ml = 4
            max_ml = n - 5 - i  # last 5 bytes must stay literals
            while ml < max_ml and data[cand + ml] == data[i + ml]:
                ml += 1
            if ml >= 4:
                emit(anchor, i, i - cand, ml)
                i += ml
                anchor = i
                continue
        i += 1
    emit(anchor, n, 0, 0)
    return bytes(out)


# ---------------------------------------------------------------------------
# frame format
# ---------------------------------------------------------------------------

_BD_SIZES = {4: 1 << 16, 5: 1 << 18, 6: 1 << 20, 7: 1 << 22}


def lz4_frame_decompress(data: bytes) -> bytes:
    data = bytes(data)
    if not is_lz4_frame(data):
        raise Lz4Error("bad magic (not an LZ4 frame)")
    pos = 4
    if pos + 2 > len(data):
        raise Lz4Error("truncated frame descriptor")
    flg = data[pos]
    bd = data[pos + 1]
    if (flg >> 6) != 0b01:
        raise Lz4Error(f"unsupported frame version {flg >> 6}")
    if flg & 0x02:
        raise Lz4Error("reserved FLG bit set")
    b_indep = bool(flg & 0x20)
    b_checksum = bool(flg & 0x10)
    c_size = bool(flg & 0x08)
    c_checksum = bool(flg & 0x04)
    dict_id = bool(flg & 0x01)
    if dict_id:
        raise Lz4Error("dictionary frames unsupported (fail-loud)")
    if not b_indep:
        raise Lz4Error("linked blocks unsupported (fail-loud)")
    bmax_code = (bd >> 4) & 0x7
    if bd & 0x8F:
        raise Lz4Error("reserved BD bits set")
    if bmax_code not in _BD_SIZES:
        raise Lz4Error(f"reserved block-max-size code {bmax_code}")
    bmax = _BD_SIZES[bmax_code]
    desc_start = pos
    pos += 2
    content_size = None
    if c_size:
        if pos + 8 > len(data):
            raise Lz4Error("truncated content size")
        (content_size,) = struct.unpack_from("<Q", data, pos)
        pos += 8
    if pos >= len(data):
        raise Lz4Error("truncated header checksum")
    hc = data[pos]
    want_hc = (xxh32(data[desc_start:pos]) >> 8) & 0xFF
    if hc != want_hc:
        raise Lz4Error(
            f"header checksum mismatch: {hc:#x} != {want_hc:#x}"
        )
    pos += 1
    out = bytearray()
    while True:
        if pos + 4 > len(data):
            raise Lz4Error("truncated block size")
        (bsize,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if bsize == 0:
            break  # EndMark
        stored = bool(bsize & 0x80000000)
        bsize &= 0x7FFFFFFF
        if bsize > bmax:
            raise Lz4Error(f"block size {bsize} exceeds declared max {bmax}")
        if pos + bsize > len(data):
            raise Lz4Error("truncated block")
        block = data[pos : pos + bsize]
        pos += bsize
        if b_checksum:
            if pos + 4 > len(data):
                raise Lz4Error("truncated block checksum")
            (bc,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if bc != xxh32(block):
                raise Lz4Error("block checksum mismatch")
        if stored:
            out += block
        else:
            dec = lz4_block_decompress(block, max_size=bmax)
            if len(dec) > bmax:
                raise Lz4Error("block decompresses beyond block max")
            out += dec
    if c_checksum:
        if pos + 4 > len(data):
            raise Lz4Error("truncated content checksum")
        (cc,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if cc != xxh32(bytes(out)):
            raise Lz4Error("content checksum mismatch")
    if content_size is not None and content_size != len(out):
        raise Lz4Error(
            f"content size {content_size} != decoded {len(out)}"
        )
    return bytes(out)


def lz4_frame_compress(
    data: bytes,
    *,
    block_max: int = 1 << 16,
    block_checksum: bool = False,
    content_checksum: bool = True,
    content_size: bool = True,
) -> bytes:
    data = bytes(data)
    code = {v: k for k, v in _BD_SIZES.items()}.get(block_max)
    if code is None:
        raise Lz4Error("block_max must be 64KB/256KB/1MB/4MB")
    flg = 0x40 | 0x20  # version 01, independent blocks
    if block_checksum:
        flg |= 0x10
    if content_size:
        flg |= 0x08
    if content_checksum:
        flg |= 0x04
    desc = bytes([flg, code << 4])
    if content_size:
        desc += struct.pack("<Q", len(data))
    out = bytearray(struct.pack("<I", _MAGIC))
    out += desc
    out.append((xxh32(desc) >> 8) & 0xFF)
    for at in range(0, len(data), block_max):
        chunk = data[at : at + block_max]
        comp = lz4_block_compress(chunk)
        if len(comp) < len(chunk):
            out += struct.pack("<I", len(comp))
            body = comp
        else:
            out += struct.pack("<I", len(chunk) | 0x80000000)
            body = chunk
        out += body
        if block_checksum:
            out += struct.pack("<I", xxh32(body))
    out += struct.pack("<I", 0)  # EndMark
    if content_checksum:
        out += struct.pack("<I", xxh32(data))
    return bytes(out)
