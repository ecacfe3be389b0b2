"""Pure-stdlib Protocol Buffers wire-format codec — the serialization
real production logs and ML feature records ship in (the highest-
frequency structured-binary format next to JSON in training-data
pipelines).

Implements the public proto3 wire format (protobuf.dev encoding doc):

* tag varints (field number + wire type), the four live wire types —
  VARINT (0), I64 (1), LEN (2), I32 (5) — with the deprecated
  SGROUP/EGROUP (3/4) gating loudly;
* base-128 varints with the 10-byte cap, ZigZag for ``sint32/64``,
  two's-complement 64-bit for ``int32/64``;
* LEN payloads: ``string`` (UTF-8, validated), ``bytes``, nested
  messages, and **packed repeated** scalars (proto3 default; the
  decoder also accepts the unpacked spelling, per spec parsers must
  handle both);
* proto3 last-one-wins for scalar fields, accumulation for repeated
  fields, and recursive field-wise merge for repeated occurrences of a
  nested message field;
* unknown fields are preserved in a ``"#unknown"`` census (count per
  field number) rather than dropped silently.

Two layers: :func:`decode_fields` (schemaless tag walk — what a corpus
profiler runs) and :func:`decode_message` (schema-driven typed
extraction).  The encoder twin emits canonical wire bytes for byte-real
fixtures.  Fail-loud: truncated varint/LEN, varint over 10 bytes,
reserved field 0, group wire types, non-UTF-8 strings, packed payload
misalignment.

Reference parity: the reference repo has no binary-log surface; this
extends corpus ingestion (SURVEY §8).  Scale: decode is per-payload
executor work, O(bytes), no shuffle.
"""

from __future__ import annotations

import struct

__all__ = [
    "ProtoError",
    "decode_fields",
    "decode_message",
    "encode_message",
]


class ProtoError(ValueError):
    """Malformed or unsupported protobuf wire payload."""


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    for i in range(10):
        if pos >= len(data):
            raise ProtoError("truncated varint")
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            if i == 9 and b > 1:
                raise ProtoError("varint exceeds 64 bits")
            return out, pos
        shift += 7
    raise ProtoError("varint longer than 10 bytes")


def _zigzag_dec(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _zigzag_enc(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= 1 << 63 else v


def decode_fields(data: bytes) -> list[tuple[int, int, int | bytes]]:
    """Schemaless tag walk: ``[(field_no, wire_type, raw_value), ...]``.
    VARINT/I64/I32 values come back as unsigned ints, LEN as bytes."""
    data = bytes(data)
    out: list[tuple[int, int, int | bytes]] = []
    pos = 0
    while pos < len(data):
        tag, pos = _read_varint(data, pos)
        field = tag >> 3
        wt = tag & 7
        if field == 0:
            raise ProtoError("field number 0 is reserved")
        if wt == 0:
            v, pos = _read_varint(data, pos)
            out.append((field, wt, v))
        elif wt == 1:
            if pos + 8 > len(data):
                raise ProtoError("truncated I64 value")
            out.append(
                (field, wt, struct.unpack_from("<Q", data, pos)[0])
            )
            pos += 8
        elif wt == 2:
            ln, pos = _read_varint(data, pos)
            if pos + ln > len(data):
                raise ProtoError("LEN payload overruns message")
            out.append((field, wt, data[pos : pos + ln]))
            pos += ln
        elif wt == 5:
            if pos + 4 > len(data):
                raise ProtoError("truncated I32 value")
            out.append(
                (field, wt, struct.unpack_from("<I", data, pos)[0])
            )
            pos += 4
        elif wt in (3, 4):
            raise ProtoError(
                "deprecated group wire types unsupported (fail-loud)"
            )
        else:
            raise ProtoError(f"unknown wire type {wt}")
    return out


_SCALARS = {
    "int32", "int64", "uint32", "uint64", "sint32", "sint64", "bool",
    "enum", "fixed64", "sfixed64", "double", "fixed32", "sfixed32",
    "float", "string", "bytes",
}
_VARINT_KINDS = {"int32", "int64", "uint32", "uint64", "sint32",
                 "sint64", "bool", "enum"}
_I64_KINDS = {"fixed64", "sfixed64", "double"}
_I32_KINDS = {"fixed32", "sfixed32", "float"}


def _scalar_from_varint(kind: str, v: int):
    if kind in ("int32", "int64"):
        return _signed64(v)
    if kind in ("sint32", "sint64"):
        return _zigzag_dec(v)
    if kind == "bool":
        return bool(v)
    return v  # uint32/uint64/enum


def _scalar_from_fixed(kind: str, v: int):
    if kind == "double":
        return struct.unpack("<d", struct.pack("<Q", v))[0]
    if kind == "float":
        return struct.unpack("<f", struct.pack("<I", v))[0]
    if kind == "sfixed64":
        return _signed64(v)
    if kind == "sfixed32":
        return v - (1 << 32) if v >= 1 << 31 else v
    return v


def _unpack_packed(kind: str, payload: bytes) -> list:
    out = []
    pos = 0
    if kind in _VARINT_KINDS:
        while pos < len(payload):
            v, pos = _read_varint(payload, pos)
            out.append(_scalar_from_varint(kind, v))
        return out
    width = 8 if kind in _I64_KINDS else 4
    if len(payload) % width:
        raise ProtoError(
            f"packed {kind} payload not a multiple of {width} bytes"
        )
    fmt = "<Q" if width == 8 else "<I"
    while pos < len(payload):
        (v,) = struct.unpack_from(fmt, payload, pos)
        out.append(_scalar_from_fixed(kind, v))
        pos += width
    return out


def decode_message(data: bytes, schema: dict) -> dict:
    """Schema-driven decode.  ``schema`` maps field number to
    ``(name, type)`` or ``(name, type, "repeated")``; ``type`` is a
    scalar name from the proto3 set or a nested schema dict.  Unknown
    fields are tallied under ``"#unknown"``."""
    msg: dict = {}
    unknown: dict[int, int] = {}
    for field, wt, raw in decode_fields(data):
        spec = schema.get(field)
        if spec is None:
            unknown[field] = unknown.get(field, 0) + 1
            continue
        name, kind = spec[0], spec[1]
        repeated = len(spec) > 2 and spec[2] == "repeated"
        if isinstance(kind, dict):  # nested message
            if wt != 2:
                raise ProtoError(f"field {field}: message needs LEN")
            sub = decode_message(raw, kind)
            if repeated:
                msg.setdefault(name, []).append(sub)
            elif name in msg:
                # proto3 merge: later singular-field occurrences win,
                # recursively
                msg[name] = _merge(msg[name], sub)
            else:
                msg[name] = sub
            continue
        if kind not in _SCALARS:
            raise ProtoError(f"field {field}: unknown type {kind!r}")
        if kind in ("string", "bytes"):
            if wt != 2:
                raise ProtoError(f"field {field}: {kind} needs LEN")
            if kind == "string":
                try:
                    val = raw.decode("utf-8")
                except UnicodeDecodeError as e:
                    raise ProtoError(
                        f"field {field}: invalid UTF-8 string: {e}"
                    ) from None
            else:
                val = raw
            if repeated:
                msg.setdefault(name, []).append(val)
            else:
                msg[name] = val
            continue
        if repeated and wt == 2:  # packed
            msg.setdefault(name, []).extend(_unpack_packed(kind, raw))
            continue
        if kind in _VARINT_KINDS:
            if wt != 0:
                raise ProtoError(f"field {field}: {kind} needs VARINT")
            val = _scalar_from_varint(kind, raw)
        elif kind in _I64_KINDS:
            if wt != 1:
                raise ProtoError(f"field {field}: {kind} needs I64")
            val = _scalar_from_fixed(kind, raw)
        else:
            if wt != 5:
                raise ProtoError(f"field {field}: {kind} needs I32")
            val = _scalar_from_fixed(kind, raw)
        if repeated:
            msg.setdefault(name, []).append(val)
        else:
            msg[name] = val
    if unknown:
        msg["#unknown"] = unknown
    return msg


def _merge(a: dict, b: dict) -> dict:
    out = dict(a)
    for k, v in b.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _merge(out[k], v)
        elif k in out and isinstance(out[k], list) and isinstance(v, list):
            out[k] = out[k] + v
        else:
            out[k] = v
    return out


# ---------------------------------------------------------------------------
# encoder (fixture half)
# ---------------------------------------------------------------------------


def _put_varint(out: bytearray, v: int) -> None:
    if v < 0:
        v += 1 << 64  # two's complement, per int32/int64 wire rules
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def encode_message(values: dict, schema: dict) -> bytes:
    """Canonical wire bytes for ``values`` keyed by field NAME, against
    the same schema shape :func:`decode_message` takes."""
    by_name = {
        spec[0]: (field, spec[1], len(spec) > 2 and spec[2] == "repeated")
        for field, spec in schema.items()
    }
    out = bytearray()
    for name, val in values.items():
        if name not in by_name:
            raise ProtoError(f"encoder: {name!r} not in schema")
        field, kind, repeated = by_name[name]
        if repeated and not val:
            continue  # proto3 canonical: empty repeated field is absent

        def tag(wt: int) -> None:
            _put_varint(out, (field << 3) | wt)

        if isinstance(kind, dict):
            subs = val if repeated else [val]
            for sub in subs:
                body = encode_message(sub, kind)
                tag(2)
                _put_varint(out, len(body))
                out.extend(body)
            continue
        if kind in ("string", "bytes"):
            items = val if repeated else [val]
            for it in items:
                body = it.encode("utf-8") if kind == "string" else it
                tag(2)
                _put_varint(out, len(body))
                out.extend(body)
            continue
        items = val if repeated else [val]
        if repeated:  # packed
            body = bytearray()
            for it in items:
                _pack_scalar(body, kind, it, packed=True)
            tag(2)
            _put_varint(out, len(body))
            out.extend(body)
        else:
            for it in items:
                wt = 0 if kind in _VARINT_KINDS else (
                    1 if kind in _I64_KINDS else 5
                )
                tag(wt)
                _pack_scalar(out, kind, it, packed=False)
    return bytes(out)


def _pack_scalar(out: bytearray, kind: str, v, *, packed: bool) -> None:
    if kind in _VARINT_KINDS:
        if kind in ("sint32", "sint64"):
            _put_varint(out, _zigzag_enc(int(v)))
        elif kind == "bool":
            _put_varint(out, 1 if v else 0)
        else:
            _put_varint(out, int(v))
    elif kind == "double":
        out.extend(struct.pack("<d", v))
    elif kind == "float":
        out.extend(struct.pack("<f", v))
    elif kind in ("fixed64", "sfixed64"):
        out.extend(struct.pack("<q" if kind[0] == "s" else "<Q", int(v)))
    elif kind in ("fixed32", "sfixed32"):
        out.extend(struct.pack("<i" if kind[0] == "s" else "<I", int(v)))
    else:
        raise ProtoError(f"encoder: cannot pack {kind!r}")
