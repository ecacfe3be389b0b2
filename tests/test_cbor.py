"""CBOR codec tests (operators/cbor.py) behind q448: the RFC 8949
Appendix A test-vector matrix, indefinite-length forms, bignum tags,
half/single/double floats, preferred serialization, strictness."""

import math
import random

import pytest

from rust_dataframe_spark.operators.cbor import (
    CborError,
    cbor_dumps,
    cbor_loads,
)

# RFC 8949 Appendix A (the published examples, verbatim hex)
VECTORS = [
    (0, "00"), (1, "01"), (10, "0a"), (23, "17"), (24, "1818"),
    (25, "1819"), (100, "1864"), (1000, "1903e8"),
    (1000000, "1a000f4240"), (1000000000000, "1b000000e8d4a51000"),
    (18446744073709551615, "1bffffffffffffffff"),
    (-1, "20"), (-10, "29"), (-100, "3863"), (-1000, "3903e7"),
    (False, "f4"), (True, "f5"), (None, "f6"),
    (1.1, "fb3ff199999999999a"), (1.5, "f93e00"),
    (65504.0, "f97bff"), (100000.0, "fa47c35000"),
    (-4.1, "fbc010666666666666"),
    ("", "60"), ("a", "6161"), ("IETF", "6449455446"),
    ("ü", "62c3bc"),
    (b"", "40"), (bytes.fromhex("01020304"), "4401020304"),
    ([], "80"), ([1, 2, 3], "83010203"),
    ([1, [2, 3], [4, 5]], "8301820203820405"),
    ({}, "a0"), ({1: 2, 3: 4}, "a201020304"),
    ({"a": 1, "b": [2, 3]}, "a26161016162820203"),
    (18446744073709551616, "c249010000000000000000"),
    (-18446744073709551617, "c349010000000000000000"),
]


class TestRfcVectors:
    def test_encode_matches_appendix_a(self):
        for obj, hx in VECTORS:
            assert cbor_dumps(obj) == bytes.fromhex(hx), obj

    def test_decode_matches_appendix_a(self):
        for obj, hx in VECTORS:
            assert cbor_loads(bytes.fromhex(hx)) == obj, hx

    def test_half_precision_specials(self):
        assert cbor_loads(bytes.fromhex("f90000")) == 0.0
        assert cbor_loads(bytes.fromhex("f93c00")) == 1.0
        assert cbor_loads(bytes.fromhex("f97c00")) == math.inf
        assert cbor_loads(bytes.fromhex("f9fc00")) == -math.inf
        assert math.isnan(cbor_loads(bytes.fromhex("f97e00")))
        assert cbor_dumps(float("nan")) == bytes.fromhex("f97e00")


class TestIndefinite:
    def test_chunked_strings(self):
        assert cbor_loads(bytes.fromhex("5f42010243030405ff")) == (
            bytes.fromhex("0102030405")
        )
        assert cbor_loads(
            bytes.fromhex("7f657374726561646d696e67ff")
        ) == "streaming"

    def test_indefinite_containers(self):
        assert cbor_loads(bytes.fromhex("9f010203ff")) == [1, 2, 3]
        assert cbor_loads(
            bytes.fromhex("bf61610161629f0203ffff")
        ) == {"a": 1, "b": [2, 3]}

    def test_nested_indefinite_chunk_rejected(self):
        # an indefinite chunk inside an indefinite string is ill-formed
        with pytest.raises(CborError, match="chunk"):
            cbor_loads(bytes.fromhex("5f5f4101ffff"))


class TestTagsAndRoundtrip:
    def test_datetime_tag_passthrough(self):
        got = cbor_loads(
            bytes.fromhex("c074323031332d30332d32315432303a30343a30305a")
        )
        assert got == ("tag", 0, "2013-03-21T20:04:00Z")

    def test_bignums_materialize(self):
        assert cbor_loads(bytes.fromhex("c249010000000000000000")) == 1 << 64
        assert cbor_dumps(1 << 64) == bytes.fromhex("c249010000000000000000")

    def test_random_roundtrip(self):
        rng = random.Random(13)

        def rnd(depth=0):
            kinds = ["int", "str", "float", "bool", "nil", "bytes", "big"]
            if depth < 3:
                kinds += ["list", "map"]
            k = rng.choice(kinds)
            if k == "int":
                return rng.randrange(-(2 ** 50), 2 ** 50)
            if k == "big":
                return rng.randrange(2 ** 64, 2 ** 100) * rng.choice((1, -1))
            if k == "str":
                return "u" * rng.randrange(30)
            if k == "float":
                return rng.choice(
                    (0.5, 1.5, 3.14159, float(rng.randrange(1000)))
                )
            if k == "bool":
                return bool(rng.randrange(2))
            if k == "nil":
                return None
            if k == "bytes":
                return bytes(rng.randrange(256)
                             for _ in range(rng.randrange(15)))
            if k == "list":
                return [rnd(depth + 1) for _ in range(rng.randrange(5))]
            return {f"k{i}": rnd(depth + 1)
                    for i in range(rng.randrange(5))}

        for _ in range(200):
            obj = rnd()
            assert cbor_loads(cbor_dumps(obj)) == obj

    def test_preferred_float_widths(self):
        assert cbor_dumps(1.5)[0] == 0xF9  # half round-trips
        assert cbor_dumps(100000.0)[0] == 0xFA  # single needed
        assert cbor_dumps(1.1)[0] == 0xFB  # double needed


class TestStrictness:
    def test_loud_failures(self):
        for bad in (b"", b"\x18", b"\x62a", b"\xff", b"\x00\x00",
                    b"\xf8\x10", b"\x1f"):
            with pytest.raises(CborError):
                cbor_loads(bad)

    def test_unhashable_map_key(self):
        with pytest.raises(CborError, match="unhashable"):
            cbor_loads(bytes.fromhex("a18101"  "01"))

    def test_indefinite_uint_illegal(self):
        with pytest.raises(CborError, match="indefinite"):
            cbor_loads(b"\x1f\x00")
