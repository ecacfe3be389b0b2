"""Pure-stdlib Snappy codec — the default block compression of the
Hadoop-era columnar stack (Avro/Parquet/ORC "snappy" codecs) plus the
streaming framing format (``.sz``, Kafka).

Block format (the published Snappy format description):

* a varint preamble carrying the uncompressed length;
* literal elements (tag ``00``, 6-bit length with 1-4 extension bytes
  for lengths > 60);
* copy elements: 1-byte-offset (tag ``01``, lengths 4-11, offsets
  1-2047 with 3 bits riding in the tag), 2-byte-offset (tag ``10``)
  and 4-byte-offset (tag ``11``), all overlap-safe.

Framing format (framing_format.txt): the ``sNaPpY`` stream identifier
chunk, compressed (0x00) and uncompressed (0x01) data chunks whose
**masked CRC-32C** over the uncompressed data is verified, padding
(0xFE) and reserved-skippable chunks, loud on reserved-unskippable.
CRC-32C (Castagnoli) is implemented here and pinned by the standard
check value ``crc32c(b"123456789") == 0xE3069283``; the mask is the
spec's ``((crc >> 15) | (crc << 17)) + 0xa282ead8``.

The encoder half emits real hash-matched copies (not all-literals), so
fixtures exercise every element kind.  The Avro container
(``sources/avro.py``) uses the block codec with the Avro-spec 4-byte
big-endian CRC-32 (zlib's) of the uncompressed block appended.

Reference parity: the reference repo has no compression surface; this
extends the source-format matrix (SURVEY §2.1/§8).  Scale: decode is
per-payload executor work, O(bytes), no shuffle.
"""

from __future__ import annotations

import struct

__all__ = [
    "SnappyError",
    "crc32c",
    "snappy_compress",
    "snappy_uncompress",
    "snappy_frame_compress",
    "snappy_frame_decompress",
]


class SnappyError(ValueError):
    """Malformed or unsupported Snappy stream."""


# ---------------------------------------------------------------------------
# CRC-32C (Castagnoli), reflected, for the framing format
# ---------------------------------------------------------------------------

_CRC32C_TABLE: list[int] = []


def _crc_table() -> list[int]:
    if not _CRC32C_TABLE:
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
            _CRC32C_TABLE.append(c)
    return _CRC32C_TABLE


def crc32c(data: bytes, crc: int = 0) -> int:
    table = _crc_table()
    c = crc ^ 0xFFFFFFFF
    for b in data:
        c = table[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# block format
# ---------------------------------------------------------------------------


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    for _ in range(5):
        if pos >= len(data):
            raise SnappyError("truncated length varint")
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
    raise SnappyError("length varint longer than 5 bytes")


def snappy_uncompress(data: bytes) -> bytes:
    data = bytes(data)
    expect, pos = _read_varint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                extra = ln - 59
                if pos + extra > n:
                    raise SnappyError("truncated literal length")
                ln = int.from_bytes(data[pos : pos + extra], "little")
                pos += extra
            ln += 1
            if pos + ln > n:
                raise SnappyError("literal overruns input")
            out += data[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:
            ln = 4 + ((tag >> 2) & 7)
            if pos >= n:
                raise SnappyError("truncated copy-1 offset")
            off = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:
            ln = (tag >> 2) + 1
            if pos + 2 > n:
                raise SnappyError("truncated copy-2 offset")
            (off,) = struct.unpack_from("<H", data, pos)
            pos += 2
        else:
            ln = (tag >> 2) + 1
            if pos + 4 > n:
                raise SnappyError("truncated copy-4 offset")
            (off,) = struct.unpack_from("<I", data, pos)
            pos += 4
        if off == 0:
            raise SnappyError("zero copy offset")
        if off > len(out):
            raise SnappyError(
                f"copy offset {off} beyond decoded window {len(out)}"
            )
        base = len(out) - off
        for k in range(ln):  # overlap-safe
            out.append(out[base + k])
        if len(out) > expect:
            raise SnappyError("output exceeds declared length")
    if len(out) != expect:
        raise SnappyError(f"decoded {len(out)} bytes, declared {expect}")
    return bytes(out)


def _put_varint(out: bytearray, v: int) -> None:
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _emit_literal(out: bytearray, lit: bytes) -> None:
    if not lit:
        return
    ln = len(lit) - 1
    if ln < 60:
        out.append(ln << 2)
    elif ln < 1 << 8:
        out.append(60 << 2)
        out.append(ln)
    elif ln < 1 << 16:
        out.append(61 << 2)
        out += ln.to_bytes(2, "little")
    elif ln < 1 << 24:
        out.append(62 << 2)
        out += ln.to_bytes(3, "little")
    else:
        out.append(63 << 2)
        out += ln.to_bytes(4, "little")
    out += lit


def snappy_compress(data: bytes) -> bytes:
    """Greedy hash matcher emitting copy-1/copy-2 elements (copy-4 for
    far offsets), min match 4."""
    data = bytes(data)
    n = len(data)
    out = bytearray()
    _put_varint(out, n)
    table: dict[bytes, int] = {}
    anchor = 0
    i = 0
    while i + 4 <= n:
        key = data[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and data[cand : cand + 4] == key:
            if anchor < i:
                _emit_literal(out, data[anchor:i])
            ml = 4
            while i + ml < n and data[cand + ml] == data[i + ml]:
                ml += 1
            off = i - cand
            rest = ml
            while rest:
                if 4 <= rest <= 11 and off < 2048:
                    out.append(1 | ((rest - 4) << 2) | ((off >> 8) << 5))
                    out.append(off & 0xFF)
                    rest = 0
                elif rest >= 4:
                    take = min(rest, 64)
                    if rest - take in (1, 2, 3):
                        take -= 4  # keep a legal >= 4 tail
                    if off < 1 << 16:
                        out.append(2 | ((take - 1) << 2))
                        out += off.to_bytes(2, "little")
                    else:
                        out.append(3 | ((take - 1) << 2))
                        out += off.to_bytes(4, "little")
                    rest -= take
                else:
                    # tail shorter than a legal copy: emit as literal
                    _emit_literal(
                        out, data[i + ml - rest : i + ml]
                    )
                    rest = 0
            i += ml
            anchor = i
            continue
        i += 1
    if anchor < n:
        _emit_literal(out, data[anchor:n])
    return bytes(out)


# ---------------------------------------------------------------------------
# framing format
# ---------------------------------------------------------------------------

_STREAM_ID = b"\xff\x06\x00\x00sNaPpY"


def snappy_frame_decompress(data: bytes) -> bytes:
    data = bytes(data)
    if data[: len(_STREAM_ID)] != _STREAM_ID:
        raise SnappyError("missing sNaPpY stream identifier")
    pos = len(_STREAM_ID)
    out = bytearray()
    while pos < len(data):
        if pos + 4 > len(data):
            raise SnappyError("truncated chunk header")
        ctype = data[pos]
        ln = int.from_bytes(data[pos + 1 : pos + 4], "little")
        pos += 4
        if pos + ln > len(data):
            raise SnappyError("chunk overruns stream")
        body = data[pos : pos + ln]
        pos += ln
        if ctype == 0x00 or ctype == 0x01:
            if ln < 4:
                raise SnappyError("data chunk missing CRC")
            (crc,) = struct.unpack_from("<I", body)
            payload = body[4:]
            raw = (
                snappy_uncompress(payload) if ctype == 0x00 else payload
            )
            if _masked_crc(raw) != crc:
                raise SnappyError("chunk CRC-32C mismatch")
            out += raw
        elif ctype == 0xFF:
            if body != b"sNaPpY":
                raise SnappyError("bad repeated stream identifier")
        elif ctype == 0xFE or 0x80 <= ctype <= 0xFD:
            continue  # padding / reserved skippable
        else:
            raise SnappyError(
                f"reserved unskippable chunk type {ctype:#x}"
            )
    return bytes(out)


def snappy_frame_compress(data: bytes, *, chunk: int = 65536) -> bytes:
    data = bytes(data)
    out = bytearray(_STREAM_ID)
    for at in range(0, len(data), chunk) or ([0] if not data else []):
        raw = data[at : at + chunk]
        comp = snappy_compress(raw)
        crc = struct.pack("<I", _masked_crc(raw))
        if len(comp) < len(raw):
            body = crc + comp
            out.append(0x00)
        else:
            body = crc + raw
            out.append(0x01)
        out += len(body).to_bytes(3, "little")
        out += body
    return bytes(out)
