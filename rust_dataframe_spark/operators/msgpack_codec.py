"""Pure-stdlib MessagePack codec — the compact JSON-superset wire
format event logs and feature pipelines commonly ship.

Full type matrix from the published MessagePack spec: positive/negative
fixint, fixmap/fixarray/fixstr, nil/false/true, bin 8/16/32,
float 32/64, uint 8-64, int 8-64, str 8/16/32, array 16/32, map 16/32,
ext 8/16/32 + fixext 1/2/4/8/16 (returned as ``(type, bytes)`` tuples),
and the official timestamp extension (type -1, all three layouts:
32-bit seconds, 64-bit nanos-packed, 96-bit) decoded to
``(seconds, nanos)``.

Decode is strict: truncation, trailing bytes (in :func:`msgpack_loads`)
and the never-used 0xC1 byte raise :class:`MsgpackError`.  The encoder
twin emits the canonical smallest encoding (what ``msgpack-c`` and the
reference packers produce), so fixtures are byte-real.  Maps decode to
dicts (string keys stay strings; non-hashable keys raise loudly).

Reference parity: the reference repo has no binary-log surface; this
extends corpus ingestion (SURVEY §8).  Scale: decode is per-payload
executor work, O(bytes), no shuffle.
"""

from __future__ import annotations

import struct

__all__ = [
    "MsgpackError",
    "msgpack_loads",
    "msgpack_dumps",
]


class MsgpackError(ValueError):
    """Malformed MessagePack payload."""


def _decode(data: bytes, pos: int):
    if pos >= len(data):
        raise MsgpackError("truncated payload")
    b = data[pos]
    pos += 1
    if b <= 0x7F:
        return b, pos
    if b >= 0xE0:
        return b - 256, pos
    if 0x80 <= b <= 0x8F:
        return _map(data, pos, b & 0xF)
    if 0x90 <= b <= 0x9F:
        return _array(data, pos, b & 0xF)
    if 0xA0 <= b <= 0xBF:
        return _str(data, pos, b & 0x1F)
    if b == 0xC0:
        return None, pos
    if b == 0xC1:
        raise MsgpackError("0xC1 is never used (corrupt payload)")
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b in (0xC4, 0xC5, 0xC6):  # bin 8/16/32
        n, pos = _uint(data, pos, 1 << (b - 0xC4))
        return _bin(data, pos, n)
    if b in (0xC7, 0xC8, 0xC9):  # ext 8/16/32
        n, pos = _uint(data, pos, 1 << (b - 0xC7))
        return _ext(data, pos, n)
    if b == 0xCA:
        if pos + 4 > len(data):
            raise MsgpackError("truncated float32")
        return struct.unpack_from(">f", data, pos)[0], pos + 4
    if b == 0xCB:
        if pos + 8 > len(data):
            raise MsgpackError("truncated float64")
        return struct.unpack_from(">d", data, pos)[0], pos + 8
    if b in (0xCC, 0xCD, 0xCE, 0xCF):  # uint 8/16/32/64
        return _uint(data, pos, 1 << (b - 0xCC))
    if b in (0xD0, 0xD1, 0xD2, 0xD3):  # int 8/16/32/64
        w = 1 << (b - 0xD0)
        v, pos = _uint(data, pos, w)
        bits = 8 * w
        return (v - (1 << bits) if v >= 1 << (bits - 1) else v), pos
    if b in (0xD4, 0xD5, 0xD6, 0xD7, 0xD8):  # fixext 1/2/4/8/16
        return _ext(data, pos, 1 << (b - 0xD4))
    if b in (0xD9, 0xDA, 0xDB):  # str 8/16/32
        n, pos = _uint(data, pos, 1 << (b - 0xD9))
        return _str(data, pos, n)
    if b in (0xDC, 0xDD):  # array 16/32
        n, pos = _uint(data, pos, 2 << (b - 0xDC))
        return _array(data, pos, n)
    # map 16/32
    n, pos = _uint(data, pos, 2 << (b - 0xDE))
    return _map(data, pos, n)


def _uint(data: bytes, pos: int, width: int) -> tuple[int, int]:
    if pos + width > len(data):
        raise MsgpackError("truncated length/integer field")
    return int.from_bytes(data[pos : pos + width], "big"), pos + width


def _bin(data: bytes, pos: int, n: int):
    if pos + n > len(data):
        raise MsgpackError("bin payload overruns")
    return bytes(data[pos : pos + n]), pos + n


def _str(data: bytes, pos: int, n: int):
    if pos + n > len(data):
        raise MsgpackError("str payload overruns")
    try:
        return data[pos : pos + n].decode("utf-8"), pos + n
    except UnicodeDecodeError as e:
        raise MsgpackError(f"invalid UTF-8 in str: {e}") from None


def _ext(data: bytes, pos: int, n: int):
    if pos + 1 + n > len(data):
        raise MsgpackError("ext payload overruns")
    etype = data[pos]
    etype = etype - 256 if etype >= 128 else etype
    body = bytes(data[pos + 1 : pos + 1 + n])
    pos += 1 + n
    if etype == -1:  # official timestamp extension
        if n == 4:
            return ("timestamp", struct.unpack(">I", body)[0], 0), pos
        if n == 8:
            (v,) = struct.unpack(">Q", body)
            return ("timestamp", v & ((1 << 34) - 1), v >> 34), pos
        if n == 12:
            nanos, secs = struct.unpack(">Iq", body)
            return ("timestamp", secs, nanos), pos
        raise MsgpackError(f"timestamp ext with {n} bytes")
    return (etype, body), pos


def _array(data: bytes, pos: int, n: int):
    out = []
    for _ in range(n):
        v, pos = _decode(data, pos)
        out.append(v)
    return out, pos


def _map(data: bytes, pos: int, n: int):
    out = {}
    for _ in range(n):
        k, pos = _decode(data, pos)
        if isinstance(k, (dict, list)):
            raise MsgpackError("unhashable map key")
        v, pos = _decode(data, pos)
        out[k] = v
    return out, pos


def msgpack_loads(data: bytes):
    data = bytes(data)
    v, pos = _decode(data, 0)
    if pos != len(data):
        raise MsgpackError(f"{len(data) - pos} trailing bytes")
    return v


# ---------------------------------------------------------------------------
# encoder (canonical smallest encoding)
# ---------------------------------------------------------------------------


def msgpack_dumps(obj) -> bytes:
    out = bytearray()
    _encode(obj, out)
    return bytes(out)


def _encode(obj, out: bytearray) -> None:
    if obj is None:
        out.append(0xC0)
    elif obj is True:
        out.append(0xC3)
    elif obj is False:
        out.append(0xC2)
    elif isinstance(obj, int):
        if 0 <= obj <= 0x7F:
            out.append(obj)
        elif -32 <= obj < 0:
            out.append(obj + 256)
        elif obj > 0:
            for code, width in ((0xCC, 1), (0xCD, 2), (0xCE, 4), (0xCF, 8)):
                if obj < 1 << (8 * width):
                    out.append(code)
                    out += obj.to_bytes(width, "big")
                    return
            raise MsgpackError("integer exceeds uint64")
        else:
            for code, width in ((0xD0, 1), (0xD1, 2), (0xD2, 4), (0xD3, 8)):
                if -(1 << (8 * width - 1)) <= obj:
                    out.append(code)
                    out += (obj + (1 << (8 * width))).to_bytes(width, "big")
                    return
            raise MsgpackError("integer below int64")
    elif isinstance(obj, float):
        out.append(0xCB)
        out += struct.pack(">d", obj)
    elif isinstance(obj, str):
        body = obj.encode("utf-8")
        n = len(body)
        if n <= 31:
            out.append(0xA0 | n)
        elif n <= 0xFF:
            out += bytes((0xD9, n))
        elif n <= 0xFFFF:
            out.append(0xDA)
            out += n.to_bytes(2, "big")
        else:
            out.append(0xDB)
            out += n.to_bytes(4, "big")
        out += body
    elif isinstance(obj, (bytes, bytearray)):
        n = len(obj)
        if n <= 0xFF:
            out += bytes((0xC4, n))
        elif n <= 0xFFFF:
            out.append(0xC5)
            out += n.to_bytes(2, "big")
        else:
            out.append(0xC6)
            out += n.to_bytes(4, "big")
        out += bytes(obj)
    elif isinstance(obj, (list, tuple)) and not (
        isinstance(obj, tuple) and len(obj) == 3 and obj[0] == "timestamp"
    ):
        n = len(obj)
        if n <= 15:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out.append(0xDC)
            out += n.to_bytes(2, "big")
        else:
            out.append(0xDD)
            out += n.to_bytes(4, "big")
        for v in obj:
            _encode(v, out)
    elif isinstance(obj, tuple) and len(obj) == 3 and obj[0] == "timestamp":
        _, secs, nanos = obj
        if nanos == 0 and 0 <= secs < 1 << 32:
            out += bytes((0xD6, 0xFF)) + struct.pack(">I", secs)
        elif 0 <= secs < 1 << 34:
            out += bytes((0xD7, 0xFF)) + struct.pack(
                ">Q", (nanos << 34) | secs
            )
        else:
            out += bytes((0xC7, 12, 0xFF)) + struct.pack(">Iq", nanos, secs)
    elif isinstance(obj, dict):
        n = len(obj)
        if n <= 15:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out.append(0xDE)
            out += n.to_bytes(2, "big")
        else:
            out.append(0xDF)
            out += n.to_bytes(4, "big")
        for k, v in obj.items():
            _encode(k, out)
            _encode(v, out)
    else:
        raise MsgpackError(f"cannot encode {type(obj).__name__}")
