"""Pure-stdlib XXH32 / XXH64 (the xxHash fast non-cryptographic hashes)
— required by the LZ4 frame format (XXH32 content/block checksums) and
the Zstandard frame format (XXH64 low-32 content checksum).

Both follow the published xxHash specification (stripe accumulators,
merge rounds, tail lanes, final avalanche).  Correctness is pinned
three ways in tests: the spec's known empty-input digests
(``XXH32("") = 0x02CC5D05``, ``XXH64("") = 0xEF46DB3751D8E999``),
length-sweep self-consistency, and — the strong one — agreement with
the JVM implementation behind Spark SQL's ``xxhash64`` (seed 42) on
random binary payloads, which is an independent third-party
implementation of the same spec.

Reference parity: the reference repo has no compression surface; this
supports the archive front door (SURVEY §8).
"""

from __future__ import annotations

import struct

__all__ = ["xxh32", "xxh64"]

_M32 = 0xFFFFFFFF
_M64 = 0xFFFFFFFFFFFFFFFF

_P32_1 = 2654435761
_P32_2 = 2246822519
_P32_3 = 3266489917
_P32_4 = 668265263
_P32_5 = 374761393

_P64_1 = 0x9E3779B185EBCA87
_P64_2 = 0xC2B2AE3D27D4EB4F
_P64_3 = 0x165667B19E3779F9
_P64_4 = 0x85EBCA77C2B2AE63
_P64_5 = 0x27D4EB2F165667C5


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh32(data: bytes, seed: int = 0) -> int:
    data = bytes(data)
    n = len(data)
    pos = 0
    if n >= 16:
        a1 = (seed + _P32_1 + _P32_2) & _M32
        a2 = (seed + _P32_2) & _M32
        a3 = seed & _M32
        a4 = (seed - _P32_1) & _M32
        while pos + 16 <= n:
            for i, a in enumerate((a1, a2, a3, a4)):
                (lane,) = struct.unpack_from("<I", data, pos + 4 * i)
                a = _rotl32((a + lane * _P32_2) & _M32, 13)
                a = (a * _P32_1) & _M32
                if i == 0:
                    a1 = a
                elif i == 1:
                    a2 = a
                elif i == 2:
                    a3 = a
                else:
                    a4 = a
            pos += 16
        acc = (
            _rotl32(a1, 1) + _rotl32(a2, 7) + _rotl32(a3, 12)
            + _rotl32(a4, 18)
        ) & _M32
    else:
        acc = (seed + _P32_5) & _M32
    acc = (acc + n) & _M32
    while pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        acc = (_rotl32((acc + lane * _P32_3) & _M32, 17) * _P32_4) & _M32
        pos += 4
    while pos < n:
        acc = (_rotl32((acc + data[pos] * _P32_5) & _M32, 11) * _P32_1) & _M32
        pos += 1
    acc ^= acc >> 15
    acc = (acc * _P32_2) & _M32
    acc ^= acc >> 13
    acc = (acc * _P32_3) & _M32
    acc ^= acc >> 16
    return acc


def _round64(acc: int, lane: int) -> int:
    return (_rotl64((acc + lane * _P64_2) & _M64, 31) * _P64_1) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    data = bytes(data)
    n = len(data)
    pos = 0
    if n >= 32:
        a1 = (seed + _P64_1 + _P64_2) & _M64
        a2 = (seed + _P64_2) & _M64
        a3 = seed & _M64
        a4 = (seed - _P64_1) & _M64
        while pos + 32 <= n:
            l1, l2, l3, l4 = struct.unpack_from("<QQQQ", data, pos)
            a1 = _round64(a1, l1)
            a2 = _round64(a2, l2)
            a3 = _round64(a3, l3)
            a4 = _round64(a4, l4)
            pos += 32
        acc = (
            _rotl64(a1, 1) + _rotl64(a2, 7) + _rotl64(a3, 12)
            + _rotl64(a4, 18)
        ) & _M64
        for a in (a1, a2, a3, a4):
            acc ^= _round64(0, a)
            acc = (acc * _P64_1 + _P64_4) & _M64
    else:
        acc = (seed + _P64_5) & _M64
    acc = (acc + n) & _M64
    while pos + 8 <= n:
        (lane,) = struct.unpack_from("<Q", data, pos)
        acc ^= _round64(0, lane)
        acc = (_rotl64(acc, 27) * _P64_1 + _P64_4) & _M64
        pos += 8
    if pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        acc ^= (lane * _P64_1) & _M64
        acc = (_rotl64(acc, 23) * _P64_2 + _P64_3) & _M64
        pos += 4
    while pos < n:
        acc ^= (data[pos] * _P64_5) & _M64
        acc = (_rotl64(acc, 11) * _P64_1) & _M64
        pos += 1
    acc ^= acc >> 33
    acc = (acc * _P64_2) & _M64
    acc ^= acc >> 29
    acc = (acc * _P64_3) & _M64
    acc ^= acc >> 32
    return acc
