"""Portable RoaringBitmap codec (the PUBLIC RoaringFormatSpec,
github.com/RoaringBitmap/RoaringFormatSpec) + the 64-bit bucket array
Delta Lake deletion vectors serialize (PROTOCOL.md "Deletion Vector
Format").

32-bit portable layout: u32 cookie LE — 12347 (runs present, high 16
bits carry container-count-1, followed by the run-flag bitset) or
12346 (no runs, next u32 = container count); then per container a
(u16 key, u16 cardinality-1) pair; an offsets table (present for the
no-run cookie, or when container count >= 4); then the containers in
key order — run (u16 n_runs then (start, length-1) pairs), array
(cardinality <= 4096, sorted u16s) or bitmap (1024 u64s).

The 64-bit wrapper ("RoaringBitmapArray native format"): u32 magic
1681511377, i64 bucket count, then per bucket a u32 high-32 key and
one 32-bit portable bitmap.  The magic is a structural tag — a
mismatch refuses loudly, it cannot decode silently wrong.

Encoder picks array/bitmap/run per container by smallest serialized
size (the reference library's rule); decode validates cardinalities,
sorted order and bounds and fails loud otherwise.
"""

from __future__ import annotations

import struct

__all__ = [
    "RoaringError",
    "roaring32_encode",
    "roaring32_decode",
    "roaring64_encode",
    "roaring64_decode",
]

_COOKIE_RUNS = 12347
_COOKIE_NORUN = 12346
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096
_MAGIC64 = 1681511377


class RoaringError(ValueError):
    """Malformed roaring bitmap serialization."""


def _containers(values: list[int]) -> list[tuple[int, list[int]]]:
    by_key: dict[int, list[int]] = {}
    for v in values:
        if not 0 <= v < 1 << 32:
            raise RoaringError(f"value {v} out of u32 range")
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    out = []
    for k in sorted(by_key):
        vs = sorted(set(by_key[k]))
        out.append((k, vs))
    return out


def _runs_of(vs: list[int]) -> list[tuple[int, int]]:
    runs = []
    start = prev = vs[0]
    for v in vs[1:]:
        if v == prev + 1:
            prev = v
            continue
        runs.append((start, prev - start))
        start = prev = v
    runs.append((start, prev - start))
    return runs


def roaring32_encode(values: list[int]) -> bytes:
    conts = _containers(values)
    n = len(conts)
    bodies: list[bytes] = []
    is_run: list[bool] = []
    for _k, vs in conts:
        card = len(vs)
        runs = _runs_of(vs)
        run_sz = 2 + 4 * len(runs)
        arr_sz = 2 * card
        bmp_sz = 8192
        best = min(run_sz, arr_sz, bmp_sz)
        if best == run_sz:
            body = struct.pack("<H", len(runs)) + b"".join(
                struct.pack("<HH", s, l) for s, l in runs
            )
            is_run.append(True)
        elif best == arr_sz:
            body = b"".join(struct.pack("<H", v) for v in vs)
            is_run.append(False)
        else:
            bits = bytearray(8192)
            for v in vs:
                bits[v >> 3] |= 1 << (v & 7)
            body = bytes(bits)
            is_run.append(False)
        bodies.append(body)
    out = bytearray()
    has_runs = any(is_run)
    if has_runs:
        out += struct.pack("<I", _COOKIE_RUNS | ((n - 1) << 16))
        flags = bytearray((n + 7) // 8)
        for i, r in enumerate(is_run):
            if r:
                flags[i >> 3] |= 1 << (i & 7)
        out += bytes(flags)
    else:
        out += struct.pack("<II", _COOKIE_NORUN, n)
    for (k, vs), _b in zip(conts, bodies):
        out += struct.pack("<HH", k, len(vs) - 1)
    if not has_runs or n >= _NO_OFFSET_THRESHOLD:
        off = len(out) + 4 * n
        for b in bodies:
            out += struct.pack("<I", off)
            off += len(b)
    for b in bodies:
        out += b
    return bytes(out)


def roaring32_decode(data: bytes, pos: int = 0) -> tuple[list[int], int]:
    """Returns (sorted values, bytes consumed from ``pos``)."""
    start = pos
    if pos + 4 > len(data):
        raise RoaringError("truncated cookie")
    (cookie,) = struct.unpack_from("<I", data, pos)
    pos += 4
    if (cookie & 0xFFFF) == _COOKIE_RUNS:
        n = (cookie >> 16) + 1
        nb = (n + 7) // 8
        if pos + nb > len(data):
            raise RoaringError("truncated run-flag bitset")
        flags = data[pos : pos + nb]
        pos += nb
        is_run = [bool(flags[i >> 3] & (1 << (i & 7))) for i in range(n)]
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _COOKIE_NORUN:
        if pos + 4 > len(data):
            raise RoaringError("truncated container count")
        (n,) = struct.unpack_from("<I", data, pos)
        pos += 4
        is_run = [False] * n
        has_offsets = True
    else:
        raise RoaringError(f"unknown roaring cookie {cookie}")
    if n > 1 << 16:
        raise RoaringError("container count out of range")
    keys: list[int] = []
    cards: list[int] = []
    for _ in range(n):
        if pos + 4 > len(data):
            raise RoaringError("truncated container descriptor")
        k, cm1 = struct.unpack_from("<HH", data, pos)
        pos += 4
        keys.append(k)
        cards.append(cm1 + 1)
    if keys != sorted(set(keys)):
        raise RoaringError("container keys not strictly increasing")
    if has_offsets:
        pos += 4 * n  # offsets are redundant for sequential decode
    out: list[int] = []
    for i in range(n):
        base = keys[i] << 16
        card = cards[i]
        if is_run[i]:
            if pos + 2 > len(data):
                raise RoaringError("truncated run container")
            (n_runs,) = struct.unpack_from("<H", data, pos)
            pos += 2
            got = 0
            prev_end = -1
            for _r in range(n_runs):
                if pos + 4 > len(data):
                    raise RoaringError("truncated run pair")
                s, lm1 = struct.unpack_from("<HH", data, pos)
                pos += 4
                if s <= prev_end:
                    raise RoaringError("run containers out of order")
                prev_end = s + lm1
                if prev_end > 0xFFFF:
                    raise RoaringError("run overflows container")
                out.extend(range(base + s, base + s + lm1 + 1))
                got += lm1 + 1
            if got != card:
                raise RoaringError("run cardinality mismatch")
        elif card <= _ARRAY_MAX:
            if pos + 2 * card > len(data):
                raise RoaringError("truncated array container")
            prev = -1
            for _j in range(card):
                (v,) = struct.unpack_from("<H", data, pos)
                pos += 2
                if v <= prev:
                    raise RoaringError("array container not sorted")
                prev = v
                out.append(base + v)
        else:
            if pos + 8192 > len(data):
                raise RoaringError("truncated bitmap container")
            bits = data[pos : pos + 8192]
            pos += 8192
            got = 0
            for byte_i, byte in enumerate(bits):
                while byte:
                    low = byte & -byte
                    out.append(base + byte_i * 8 + low.bit_length() - 1)
                    byte ^= low
                    got += 1
            if got != card:
                raise RoaringError("bitmap cardinality mismatch")
    return out, pos - start


def roaring64_encode(values: list[int]) -> bytes:
    by_high: dict[int, list[int]] = {}
    for v in values:
        if not 0 <= v < 1 << 64:
            raise RoaringError(f"value {v} out of u64 range")
        by_high.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray(struct.pack("<Iq", _MAGIC64, len(by_high)))
    for h in sorted(by_high):
        out += struct.pack("<I", h)
        out += roaring32_encode(by_high[h])
    return bytes(out)


def roaring64_decode(data: bytes) -> list[int]:
    if len(data) < 12:
        raise RoaringError("truncated 64-bit roaring header")
    magic, n = struct.unpack_from("<Iq", data, 0)
    if magic != _MAGIC64:
        raise RoaringError(
            f"RoaringBitmapArray magic mismatch ({magic}) — refusing "
            "(fail-loud; a foreign format cannot decode silently wrong)"
        )
    if not 0 <= n <= 1 << 20:
        raise RoaringError("bucket count out of range")
    pos = 12
    out: list[int] = []
    prev_h = -1
    for _ in range(n):
        if pos + 4 > len(data):
            raise RoaringError("truncated bucket key")
        (h,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if h <= prev_h:
            raise RoaringError("bucket keys not increasing")
        prev_h = h
        vals, used = roaring32_decode(data, pos)
        pos += used
        out.extend((h << 32) | v for v in vals)
    return out
