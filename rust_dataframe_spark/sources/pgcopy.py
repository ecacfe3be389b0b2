"""PostgreSQL COPY BINARY file codec — serverless pin of the reference's
flagship IO path (round 8, VERDICT r7 #3).

The reference engine's headline connector streams Arrow batches through
Postgres' COPY-with-(format binary) protocol: the reader decodes it
(/root/reference/src/io/sql/postgres/reader.rs:453-701, per-type layouts
reader.rs:739-837) and the writer encodes it (writer.rs:161-321, per-type
impls writer.rs:330+).  The sandbox has no Postgres server, but the FILE
FORMAT itself is fully specified (PostgreSQL docs "COPY ... BINARY
format" + the reference's byte-level code), so this module implements the
exact framing against byte fixtures:

* **19-byte header**: 11-byte signature ``PGCOPY\\n\\xff\\r\\n\\0``
  (reader.rs MAGIC, mod.rs:7), 4-byte big-endian flags (0), 4-byte
  header-extension length (0).
* **Per tuple**: int16 BE field count, then per field an int32 BE byte
  length (**-1 = NULL**, no payload) followed by the type's big-endian
  send-format payload.
* **Trailer**: int16 BE -1.

Per-type payloads (PostgreSQL send formats; matching reader.rs:739-837 /
writer.rs:330+ where the reference implements them):

====== ===========================================================
bool    1 byte, 0/1
int2    int16 BE
int4    int32 BE
int8    int64 BE
float4  IEEE-754 binary32 BE
float8  IEEE-754 binary64 BE
text    UTF-8 bytes (length-prefixed, no NUL)
bytea   raw bytes
date    int32 BE days since 2000-01-01 (Unix rebase 10957 days —
        mod.rs:8 EPOCH_DAYS; writer.rs Date32 impl subtracts it)
timestamp int64 BE microseconds since 2000-01-01 00:00:00 (Unix
        rebase 946_684_800_000_000 us — mod.rs:9 EPOCH_MICROS)
time    int64 BE microseconds since midnight.  DOCUMENTED REFERENCE
        DEVIATION: reader.rs:833-837 reads only 4 bytes ("time
        without a zone is 32-bit"), but PostgreSQL's actual time
        send format is 8-byte int64 us — a 4-byte read desyncs the
        tuple stream on real server output, so the corrected form is
        implemented here (the repo's standing policy on reference
        bugs, like min-as-max in functions/aggregate.rs:22-31).
uuid    16 raw bytes
numeric int16 BE x4 header (ndigits, weight, sign 0x0000/0x4000/
        0xC000-NaN, dscale) + ndigits x int16 BE base-10000 digits;
        value = sum(digit[i] * 10000^(weight-i))
====== ===========================================================

Spark integration follows the avro.py executor-side pattern:
``write_pgcopy_dir`` (one ``part-*.pgcopy`` per partition via
``mapInArrow`` — NULL/NaN stay distinct) and ``read_pgcopy_dir``
(binaryFile scan + distributed decode; COPY BINARY carries no schema, so
the caller passes the same (name, pgtype) schema the server's table DDL
would imply).

At 100 TB this is the bulk-load path: COPY BINARY is the fastest wire
into Postgres-family warehouses, and encoding is embarrassingly parallel
per partition — each executor emits an independent complete COPY stream
a server (or this decoder) consumes as-is.
"""

from __future__ import annotations

import os
import struct
from datetime import date, datetime, time, timedelta
from decimal import Decimal

MAGIC = b"PGCOPY\n\xff\r\n\0"
EPOCH_DAYS = 10957  # days from 1970-01-01 to 2000-01-01 (mod.rs:8)
EPOCH_MICROS = 946_684_800_000_000  # us from Unix epoch to 2000-01-01 (mod.rs:9)
_PG_EPOCH_DATE = date(2000, 1, 1)
_PG_EPOCH_TS = datetime(2000, 1, 1)

_NUMERIC_POS, _NUMERIC_NEG, _NUMERIC_NAN = 0x0000, 0x4000, 0xC000

PG_TYPES = (
    "bool", "int2", "int4", "int8", "float4", "float8",
    "text", "bytea", "date", "timestamp", "time", "uuid", "numeric",
)

__all__ = [
    "PgCopyError",
    "MAGIC",
    "EPOCH_DAYS",
    "EPOCH_MICROS",
    "PG_TYPES",
    "encode_copy_binary",
    "decode_copy_binary",
    "write_pgcopy_dir",
    "read_pgcopy_dir",
]


class PgCopyError(ValueError):
    """Malformed COPY BINARY stream or unsupported type/value."""


# ----------------------------- numeric (base 10000) ------------------------


def _numeric_encode(d: Decimal) -> bytes:
    """PG numeric send format: base-10000 digit groups with a weight for
    the most significant group (value = sum d[i] * 10000^(weight-i)) and
    the display scale.  NaN encodes as the dedicated sign code."""
    if d.is_nan():
        return struct.pack(">hhHh", 0, 0, _NUMERIC_NAN, 0)
    if d.is_infinite():
        raise PgCopyError("numeric cannot carry infinity")
    sign = _NUMERIC_NEG if d.is_signed() else _NUMERIC_POS
    t = d.copy_abs().as_tuple()  # context-free: abs() would round to prec
    dscale = max(0, -t.exponent)
    digits = "".join(map(str, t.digits))
    # align the decimal point: int part / frac part as plain digit strings
    if t.exponent >= 0:
        int_part, frac_part = digits + "0" * t.exponent, ""
    else:
        cut = len(digits) + t.exponent
        int_part = digits[:cut] if cut > 0 else ""
        frac_part = ("0" * max(0, -cut)) + digits[max(cut, 0):]
    int_part = int_part.lstrip("0")
    pad = (-len(int_part)) % 4
    int_part = "0" * pad + int_part
    frac_part = frac_part + "0" * ((-len(frac_part)) % 4)
    groups = [
        int(int_part[i:i + 4]) for i in range(0, len(int_part), 4)
    ] + [int(frac_part[i:i + 4]) for i in range(0, len(frac_part), 4)]
    weight = len(int_part) // 4 - 1
    # strip leading/trailing zero groups (PG normalizes both ends)
    while groups and groups[0] == 0:
        groups.pop(0)
        weight -= 1
    while groups and groups[-1] == 0:
        groups.pop()
    if not groups:
        weight = 0
    return struct.pack(
        ">hhHh", len(groups), weight, sign, dscale
    ) + b"".join(struct.pack(">h", g) for g in groups)


def _numeric_decode(payload: bytes) -> Decimal:
    if len(payload) < 8:
        raise PgCopyError("numeric payload shorter than its 8-byte header")
    ndigits, weight, sign, dscale = struct.unpack_from(">hhHh", payload, 0)
    if sign == _NUMERIC_NAN:
        return Decimal("NaN")
    if sign not in (_NUMERIC_POS, _NUMERIC_NEG):
        raise PgCopyError(f"numeric sign code 0x{sign:04x}")
    if len(payload) != 8 + 2 * ndigits:
        raise PgCopyError(
            f"numeric payload {len(payload)} != 8 + 2*{ndigits}"
        )
    import decimal as _decimal

    with _decimal.localcontext() as ctx:
        ctx.prec = 4 * (abs(weight) + ndigits) + dscale + 16
        total = Decimal(0)
        for i in range(ndigits):
            g = struct.unpack_from(">h", payload, 8 + 2 * i)[0]
            if not 0 <= g <= 9999:
                raise PgCopyError(f"numeric digit group {g} outside 0..9999")
            total += Decimal(g).scaleb(4 * (weight - i))
        if sign == _NUMERIC_NEG:
            total = -total
        return total.quantize(Decimal(1).scaleb(-dscale))


# ----------------------------- field codecs --------------------------------


def _encode_field(pgtype: str, v) -> bytes:
    if pgtype == "bool":
        return struct.pack(">iB", 1, 1 if v else 0)
    if pgtype == "int2":
        return struct.pack(">ih", 2, v)
    if pgtype == "int4":
        return struct.pack(">ii", 4, v)
    if pgtype == "int8":
        return struct.pack(">iq", 8, v)
    if pgtype == "float4":
        return struct.pack(">if", 4, v)
    if pgtype == "float8":
        return struct.pack(">id", 8, v)
    if pgtype == "text":
        b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
        return struct.pack(">i", len(b)) + b
    if pgtype == "bytea":
        b = bytes(v)
        return struct.pack(">i", len(b)) + b
    if pgtype == "date":
        return struct.pack(">ii", 4, (v - _PG_EPOCH_DATE).days)
    if pgtype == "timestamp":
        delta = v - _PG_EPOCH_TS
        us = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
        return struct.pack(">iq", 8, us)
    if pgtype == "time":
        us = ((v.hour * 60 + v.minute) * 60 + v.second) * 1_000_000 + v.microsecond
        return struct.pack(">iq", 8, us)
    if pgtype == "uuid":
        b = v.bytes if hasattr(v, "bytes") else bytes(v)
        if len(b) != 16:
            raise PgCopyError(f"uuid payload must be 16 bytes, got {len(b)}")
        return struct.pack(">i", 16) + b
    if pgtype == "numeric":
        b = _numeric_encode(v if isinstance(v, Decimal) else Decimal(str(v)))
        return struct.pack(">i", len(b)) + b
    raise PgCopyError(f"unsupported pg type {pgtype!r}")


def _decode_field(pgtype: str, payload: bytes):
    n = len(payload)
    if pgtype == "bool":
        if n != 1:
            raise PgCopyError(f"bool length {n}")
        return payload[0] != 0
    if pgtype == "int2":
        if n != 2:
            raise PgCopyError(f"int2 length {n}")
        return struct.unpack(">h", payload)[0]
    if pgtype == "int4":
        if n != 4:
            raise PgCopyError(f"int4 length {n}")
        return struct.unpack(">i", payload)[0]
    if pgtype == "int8":
        if n != 8:
            raise PgCopyError(f"int8 length {n}")
        return struct.unpack(">q", payload)[0]
    if pgtype == "float4":
        if n != 4:
            raise PgCopyError(f"float4 length {n}")
        return struct.unpack(">f", payload)[0]
    if pgtype == "float8":
        if n != 8:
            raise PgCopyError(f"float8 length {n}")
        return struct.unpack(">d", payload)[0]
    if pgtype == "text":
        return payload.decode("utf-8")
    if pgtype == "bytea":
        return bytes(payload)
    if pgtype == "date":
        if n != 4:
            raise PgCopyError(f"date length {n}")
        return _PG_EPOCH_DATE + timedelta(days=struct.unpack(">i", payload)[0])
    if pgtype == "timestamp":
        if n != 8:
            raise PgCopyError(f"timestamp length {n}")
        return _PG_EPOCH_TS + timedelta(
            microseconds=struct.unpack(">q", payload)[0]
        )
    if pgtype == "time":
        if n != 8:
            raise PgCopyError(
                f"time length {n} (PostgreSQL sends 8-byte int64 us; "
                f"reference reader.rs:833 reads 4 — documented deviation)"
            )
        us = struct.unpack(">q", payload)[0]
        if not 0 <= us < 86_400_000_000:
            raise PgCopyError(f"time {us}us outside a day")
        return time(
            us // 3_600_000_000,
            us // 60_000_000 % 60,
            us // 1_000_000 % 60,
            us % 1_000_000,
        )
    if pgtype == "uuid":
        if n != 16:
            raise PgCopyError(f"uuid length {n}")
        import uuid as _uuid

        return _uuid.UUID(bytes=bytes(payload))
    if pgtype == "numeric":
        return _numeric_decode(payload)
    raise PgCopyError(f"unsupported pg type {pgtype!r}")


# ----------------------------- stream framing ------------------------------


def encode_copy_binary(
    schema: list[tuple[str, str]], rows: list[tuple]
) -> bytes:
    """Encode rows to one complete COPY BINARY stream (header + tuples +
    trailer) — byte-identical to what ``COPY t TO ... (format binary)``
    emits for the same table content."""
    for _name, t in schema:
        if t not in PG_TYPES:
            raise PgCopyError(f"unsupported pg type {t!r}")
    out = bytearray(MAGIC)
    out += struct.pack(">II", 0, 0)  # flags, header-extension length
    ncols = len(schema)
    for row in rows:
        if len(row) != ncols:
            raise PgCopyError(
                f"row arity {len(row)} != schema arity {ncols}"
            )
        out += struct.pack(">h", ncols)
        for (_name, t), v in zip(schema, row):
            if v is None:
                out += struct.pack(">i", -1)
            else:
                out += _encode_field(t, v)
    out += struct.pack(">h", -1)
    return bytes(out)


def decode_copy_binary(
    data: bytes, schema: list[tuple[str, str]]
) -> list[tuple]:
    """Decode one COPY BINARY stream to Python row tuples (None = NULL).
    Fail-loud: bad magic, truncation, arity mismatch, missing trailer,
    and per-type length violations all raise :class:`PgCopyError`."""
    data = bytes(data)
    if data[: len(MAGIC)] != MAGIC:
        raise PgCopyError("bad COPY BINARY signature")
    if len(data) < len(MAGIC) + 8:
        raise PgCopyError("truncated COPY BINARY header")
    flags, ext = struct.unpack_from(">II", data, len(MAGIC))
    if flags & 0xFFFF:  # low 16 bits are critical per the format spec
        raise PgCopyError(f"critical header flags 0x{flags:08x} set")
    pos = len(MAGIC) + 8 + ext
    ncols = len(schema)
    rows: list[tuple] = []
    while True:
        if pos + 2 > len(data):
            raise PgCopyError("stream ends without the -1 trailer")
        (fc,) = struct.unpack_from(">h", data, pos)
        pos += 2
        if fc == -1:
            break
        if fc != ncols:
            raise PgCopyError(f"tuple field count {fc} != schema {ncols}")
        row = []
        for _name, t in schema:
            if pos + 4 > len(data):
                raise PgCopyError("truncated field length")
            (ln,) = struct.unpack_from(">i", data, pos)
            pos += 4
            if ln == -1:
                row.append(None)
                continue
            if ln < 0 or pos + ln > len(data):
                raise PgCopyError(f"field length {ln} overruns stream")
            row.append(_decode_field(t, data[pos:pos + ln]))
            pos += ln
        rows.append(tuple(row))
    return rows


# ----------------------------- Spark integration ----------------------------

_SPARK_TO_PG = {
    "boolean": "bool",
    "smallint": "int2",
    "int": "int4",
    "integer": "int4",
    "bigint": "int8",
    "float": "float4",
    "double": "float8",
    "string": "text",
    "binary": "bytea",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
}

_PG_TO_SPARK = {
    "bool": "boolean",
    "int2": "smallint",
    "int4": "int",
    "int8": "bigint",
    "float4": "float",
    "float8": "double",
    "text": "string",
    "bytea": "binary",
    "date": "date",
    "timestamp": "timestamp_ntz",
    "time": "string",      # Spark has no TIME type; ISO string carrier
    "uuid": "string",      # canonical hex form
    "numeric": "string",   # exact decimal string (caller casts to decimal)
}


def spark_schema_to_pg(schema) -> list[tuple[str, str]]:
    """Map a Spark StructType to the (name, pgtype) schema, the same
    table-DDL mapping the reference writer derives (writer.rs:93+)."""
    out = []
    for f in schema.fields:
        s = f.dataType.simpleString()
        if s.startswith("decimal"):
            out.append((f.name, "numeric"))
        elif s in _SPARK_TO_PG:
            out.append((f.name, _SPARK_TO_PG[s]))
        else:
            raise PgCopyError(f"no COPY BINARY mapping for Spark type {s}")
    return out


def write_pgcopy_dir(df, path: str) -> int:
    """Executor-side COPY BINARY sink: each partition writes one complete
    ``part-{pid:05d}.pgcopy`` stream (deterministic name -> idempotent
    retry; each file is independently server-loadable).  Rows cross from
    the JVM as Arrow batches (``mapInArrow`` — NULL and NaN stay
    distinct).  Returns files written."""
    import pyarrow as pa
    from pyspark import TaskContext

    os.makedirs(path, exist_ok=True)
    pg_schema = spark_schema_to_pg(df.schema)

    def _write(batches):
        pid = TaskContext.get().partitionId()
        rows: list[tuple] = []
        for batch in batches:
            cols = [batch.column(i) for i in range(batch.num_columns)]
            for i in range(batch.num_rows):
                rows.append(
                    tuple(
                        c[i].as_py() if c[i].is_valid else None for c in cols
                    )
                )
        if rows:
            blob = encode_copy_binary(pg_schema, rows)
            with open(
                os.path.join(path, f"part-{pid:05d}.pgcopy"), "wb"
            ) as fh:
                fh.write(blob)
            yield pa.RecordBatch.from_arrays(
                [pa.array([len(rows)], type=pa.int64())], names=["n_rows"]
            )

    manifest = df.mapInArrow(_write, schema="n_rows long").collect()
    return len(manifest)


def read_pgcopy_dir(spark, path: str, schema: list[tuple[str, str]]):
    """Distributed COPY BINARY read: binaryFile scan (one task per file)
    + executor-side decode.  COPY BINARY carries NO schema — the caller
    passes the (name, pgtype) list the source table's DDL implies, same
    as a real server-side COPY requires the target table to exist.
    time/uuid/numeric surface as strings (ISO / canonical hex / exact
    decimal text) since Spark lacks lossless native carriers."""
    import pyarrow as pa

    for _n, t in schema:
        if t not in PG_TYPES:
            raise PgCopyError(f"unsupported pg type {t!r}")
    ddl = ", ".join(f"{n} {_PG_TO_SPARK[t]}" for n, t in schema)

    def _decode(batches):
        for batch in batches:
            content = batch.column(0)
            for i in range(batch.num_rows):
                rows = decode_copy_binary(content[i].as_py(), schema)
                arrays, names = [], []
                for j, (n, t) in enumerate(schema):
                    vals = [r[j] for r in rows]
                    if t == "time":
                        vals = [None if v is None else v.isoformat() for v in vals]
                    elif t == "uuid":
                        vals = [None if v is None else str(v) for v in vals]
                    elif t == "numeric":
                        vals = [None if v is None else str(v) for v in vals]
                    arrays.append(pa.array(vals))
                    names.append(n)
                yield pa.RecordBatch.from_arrays(
                    arrays,
                    schema=pa.schema(
                        [
                            (n, _ARROW_TYPES[t]())
                            for n, t in schema
                        ]
                    ),
                )

    raw = spark.read.format("binaryFile").load(os.path.join(path, "*.pgcopy"))
    return raw.select("content").mapInArrow(_decode, schema=ddl)


def _arrow_types():
    import pyarrow as pa

    return {
        "bool": pa.bool_,
        "int2": pa.int16,
        "int4": pa.int32,
        "int8": pa.int64,
        "float4": pa.float32,
        "float8": pa.float64,
        "text": pa.string,
        "bytea": pa.binary,
        "date": pa.date32,
        "timestamp": lambda: pa.timestamp("us"),
        "time": pa.string,
        "uuid": pa.string,
        "numeric": pa.string,
    }


class _LazyArrowTypes:
    def __getitem__(self, k):
        return _arrow_types()[k]


_ARROW_TYPES = _LazyArrowTypes()
