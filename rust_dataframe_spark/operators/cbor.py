"""Pure-stdlib CBOR codec (RFC 8949) — the binary serialization web
archives (WACZ), COSE-signed metadata and IoT event logs ship.

Full decode surface: all eight major types — unsigned/negative
integers (all four width classes), byte and text strings (definite and
**indefinite chunked**, with the RFC rule that chunks must be the same
type and themselves definite), arrays and maps (definite and
indefinite), tags (bignum tags 2/3 materialize to Python ints; other
tags pass through as ``("tag", n, item)``), and major type 7: false /
true / null / undefined, simple values, and **all three float widths**
including IEEE half precision.  Strict by default: trailing bytes,
break (0xFF) outside an indefinite context, non-UTF-8 text, unhashable
map keys and truncation all raise :class:`CborError`.

The encoder twin emits RFC 8949 §4.1 preferred serialization: smallest
integer width, definite lengths, and the shortest float width that
round-trips the value (half -> single -> double), so fixtures are
canonical bytes.  Decode(encode(x)) == x for the JSON-ish core.

Reference parity: the reference repo has no binary-log surface; this
completes the serialization trio next to protobuf and MessagePack
(SURVEY §8).  Scale: per-payload executor work, O(bytes), no shuffle.
"""

from __future__ import annotations

import math
import struct

__all__ = [
    "CborError",
    "cbor_loads",
    "cbor_dumps",
]


class CborError(ValueError):
    """Malformed CBOR payload."""


_BREAK = object()


def _head(data: bytes, pos: int) -> tuple[int, int | None, int, int]:
    """Returns (major, value-or-None-for-indefinite, ai, new pos)."""
    if pos >= len(data):
        raise CborError("truncated item head")
    b = data[pos]
    pos += 1
    major = b >> 5
    ai = b & 0x1F
    if ai < 24:
        return major, ai, ai, pos
    if ai in (24, 25, 26, 27):
        width = 1 << (ai - 24)
        if pos + width > len(data):
            raise CborError("truncated argument")
        return (
            major,
            int.from_bytes(data[pos : pos + width], "big"),
            ai,
            pos + width,
        )
    if ai == 31:
        if major in (0, 1, 6):
            raise CborError(f"indefinite length illegal for major {major}")
        return major, None, ai, pos
    raise CborError(f"reserved additional info {ai}")


def _decode(data: bytes, pos: int, depth: int = 0):
    if depth > 512:
        raise CborError("nesting too deep")
    major, val, ai, pos = _head(data, pos)
    if major == 0:
        return val, pos
    if major == 1:
        return -1 - val, pos
    if major in (2, 3):
        if val is None:  # indefinite: definite same-type chunks
            parts = []
            while True:
                if pos < len(data) and data[pos] == 0xFF:
                    pos += 1
                    break
                m2, v2, _ai2, pos = _head(data, pos)
                if m2 != major or v2 is None:
                    raise CborError(
                        "indefinite string chunk of wrong type"
                    )
                if pos + v2 > len(data):
                    raise CborError("string chunk overruns")
                parts.append(bytes(data[pos : pos + v2]))
                pos += v2
            raw = b"".join(parts)
        else:
            if pos + val > len(data):
                raise CborError("string overruns payload")
            raw = bytes(data[pos : pos + val])
            pos += val
        if major == 2:
            return raw, pos
        try:
            return raw.decode("utf-8"), pos
        except UnicodeDecodeError as e:
            raise CborError(f"invalid UTF-8 text string: {e}") from None
    if major == 4:
        out = []
        if val is None:
            while True:
                if pos < len(data) and data[pos] == 0xFF:
                    return out, pos + 1
                v, pos = _decode(data, pos, depth + 1)
                out.append(v)
        for _ in range(val):
            v, pos = _decode(data, pos, depth + 1)
            out.append(v)
        return out, pos
    if major == 5:
        out = {}

        def put(k, v):
            if isinstance(k, (dict, list, bytearray)):
                raise CborError("unhashable map key")
            out[k] = v

        if val is None:
            while True:
                if pos < len(data) and data[pos] == 0xFF:
                    return out, pos + 1
                k, pos = _decode(data, pos, depth + 1)
                v, pos = _decode(data, pos, depth + 1)
                put(k, v)
        for _ in range(val):
            k, pos = _decode(data, pos, depth + 1)
            v, pos = _decode(data, pos, depth + 1)
            put(k, v)
        return out, pos
    if major == 6:
        item, pos = _decode(data, pos, depth + 1)
        if val == 2:  # unsigned bignum
            if not isinstance(item, bytes):
                raise CborError("bignum tag without byte string")
            return int.from_bytes(item, "big"), pos
        if val == 3:  # negative bignum
            if not isinstance(item, bytes):
                raise CborError("bignum tag without byte string")
            return -1 - int.from_bytes(item, "big"), pos
        return ("tag", val, item), pos
    # major 7: simple values and floats, disambiguated by ai
    if ai < 24:
        if val == 20:
            return False, pos
        if val == 21:
            return True, pos
        if val == 22:
            return None, pos
        if val == 23:
            return ("simple", 23), pos  # undefined
        return ("simple", val), pos
    if ai == 24:
        if val < 32:
            raise CborError(f"invalid two-byte simple value {val}")
        return ("simple", val), pos
    if ai == 25:
        return struct.unpack(">e", val.to_bytes(2, "big"))[0], pos
    if ai == 26:
        return struct.unpack(">f", val.to_bytes(4, "big"))[0], pos
    if ai == 27:
        return struct.unpack(">d", val.to_bytes(8, "big"))[0], pos
    raise CborError("break (0xFF) outside an indefinite-length item")


def cbor_loads(data: bytes):
    data = bytes(data)
    v, pos = _decode(data, 0)
    if pos != len(data):
        raise CborError(f"{len(data) - pos} trailing bytes")
    return v


def cbor_dumps(obj) -> bytes:
    out = bytearray()
    _encode(obj, out)
    return bytes(out)


def _arg(out: bytearray, major: int, n: int) -> None:
    mb = major << 5
    if n < 24:
        out.append(mb | n)
    elif n < 1 << 8:
        out.append(mb | 24)
        out.append(n)
    elif n < 1 << 16:
        out.append(mb | 25)
        out += n.to_bytes(2, "big")
    elif n < 1 << 32:
        out.append(mb | 26)
        out += n.to_bytes(4, "big")
    elif n < 1 << 64:
        out.append(mb | 27)
        out += n.to_bytes(8, "big")
    else:
        raise CborError("argument exceeds 64 bits (use bignum tags)")


def _encode(obj, out: bytearray) -> None:
    if obj is False:
        out.append(0xF4)
    elif obj is True:
        out.append(0xF5)
    elif obj is None:
        out.append(0xF6)
    elif isinstance(obj, int):
        if obj >= 0:
            if obj < 1 << 64:
                _arg(out, 0, obj)
            else:  # unsigned bignum, tag 2
                body = obj.to_bytes((obj.bit_length() + 7) // 8, "big")
                _arg(out, 6, 2)
                _arg(out, 2, len(body))
                out += body
        else:
            n = -1 - obj
            if n < 1 << 64:
                _arg(out, 1, n)
            else:  # negative bignum, tag 3
                body = n.to_bytes((n.bit_length() + 7) // 8, "big")
                _arg(out, 6, 3)
                _arg(out, 2, len(body))
                out += body
    elif isinstance(obj, float):
        # preferred serialization: shortest width that round-trips
        if math.isnan(obj):
            out += b"\xf9\x7e\x00"  # canonical NaN
            return
        for code, fmt in ((0xF9, ">e"), (0xFA, ">f")):
            try:
                packed = struct.pack(fmt, obj)
            except (OverflowError, ValueError):
                continue
            if struct.unpack(fmt, packed)[0] == obj:
                out.append(code)
                out += packed
                return
        out.append(0xFB)
        out += struct.pack(">d", obj)
    elif isinstance(obj, (bytes, bytearray)):
        _arg(out, 2, len(obj))
        out += bytes(obj)
    elif isinstance(obj, str):
        body = obj.encode("utf-8")
        _arg(out, 3, len(body))
        out += body
    elif isinstance(obj, tuple) and len(obj) == 3 and obj[0] == "tag":
        _arg(out, 6, obj[1])
        _encode(obj[2], out)
    elif isinstance(obj, (list, tuple)):
        _arg(out, 4, len(obj))
        for v in obj:
            _encode(v, out)
    elif isinstance(obj, dict):
        _arg(out, 5, len(obj))
        for k, v in obj.items():
            _encode(k, out)
            _encode(v, out)
    else:
        raise CborError(f"cannot encode {type(obj).__name__}")
