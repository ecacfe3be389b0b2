"""Protobuf wire-format + MessagePack codec tests (operators/
protowire.py, msgpack_codec.py) behind q445/q446: spec-pinned hand
vectors, zigzag/two's-complement varints, packed repeated fields,
proto3 merge semantics, unknown-field census, the full MessagePack
type matrix incl. the timestamp extension, and the loud gates."""

import random
import struct

import pytest

from rust_dataframe_spark.operators.msgpack_codec import (
    MsgpackError,
    msgpack_dumps,
    msgpack_loads,
)
from rust_dataframe_spark.operators.protowire import (
    ProtoError,
    decode_fields,
    decode_message,
    encode_message,
)

SCHEMA = {
    1: ("id", "uint64"),
    2: ("name", "string"),
    3: ("scores", "sint64", "repeated"),
    4: ("meta", {1: ("lang", "string"), 2: ("quality", "double")}),
    5: ("flags", "bool"),
    6: ("weights", "double", "repeated"),
}


class TestProtoWire:
    def test_spec_hand_vectors(self):
        # protobuf.dev encoding doc: Test1{a:int32=150} -> 08 96 01
        assert decode_fields(bytes.fromhex("089601")) == [(1, 0, 150)]
        # field 2 = "testing" -> 12 07 74 65 73 74 69 6e 67
        assert decode_fields(bytes.fromhex("120774657374696e67")) == [
            (2, 2, b"testing")
        ]

    def test_zigzag(self):
        # sint: -2 encodes as varint 3, -1 as 1, 1 as 2
        sch = {1: ("s", "sint64")}
        assert decode_message(bytes.fromhex("0803"), sch) == {"s": -2}
        assert decode_message(bytes.fromhex("0801"), sch) == {"s": -1}
        assert decode_message(bytes.fromhex("0802"), sch) == {"s": 1}

    def test_negative_int32_is_ten_byte_varint(self):
        enc = encode_message({"v": -2}, {1: ("v", "int64")})
        assert len(enc) == 11  # 1 tag + 10 varint bytes
        assert decode_message(enc, {1: ("v", "int64")}) == {"v": -2}

    def test_roundtrip_matrix(self):
        rng = random.Random(41)
        for _ in range(100):
            vals = {
                "id": rng.randrange(1 << 60),
                "name": "doc-" + "x" * rng.randrange(10),
                "scores": [
                    rng.randrange(-1000, 1000)
                    for _ in range(rng.randrange(6))
                ],
                "meta": {"lang": rng.choice(["en", "de"]),
                         "quality": float(rng.randrange(100))},
                "flags": bool(rng.randrange(2)),
                "weights": [
                    float(rng.randrange(50))
                    for _ in range(rng.randrange(4))
                ],
            }
            got = decode_message(encode_message(vals, SCHEMA), SCHEMA)
            assert got == {k: v for k, v in vals.items() if v != []}

    def test_packed_and_unpacked_both_accepted(self):
        # unpacked spelling of field 3: tag wt0 per element
        raw = bytes.fromhex("1802" "1803")  # sint64 1, then -2
        assert decode_message(raw, SCHEMA)["scores"] == [1, -2]

    def test_last_wins_and_nested_merge(self):
        blob = encode_message({"id": 5, "meta": {"lang": "en"}}, SCHEMA)
        blob += encode_message(
            {"id": 9, "meta": {"quality": 2.0}}, SCHEMA
        )
        m = decode_message(blob, SCHEMA)
        assert m["id"] == 9
        assert m["meta"] == {"lang": "en", "quality": 2.0}

    def test_unknown_field_census(self):
        blob = encode_message({"id": 5}, SCHEMA) + encode_message(
            {"zz": 1}, {9: ("zz", "int32")}
        )
        assert decode_message(blob, SCHEMA)["#unknown"] == {9: 1}

    def test_group_wire_types_gate(self):
        with pytest.raises(ProtoError, match="group"):
            decode_fields(bytes([0x0B]))

    def test_truncation_loud(self):
        with pytest.raises(ProtoError, match="truncated"):
            decode_fields(bytes([0x08]))
        with pytest.raises(ProtoError, match="overruns"):
            decode_fields(bytes([0x12, 0x05, 0x61]))
        with pytest.raises(ProtoError, match="10 bytes|64 bits"):
            decode_fields(bytes([0x08]) + b"\xff" * 10)

    def test_field_zero_reserved(self):
        with pytest.raises(ProtoError, match="reserved"):
            decode_fields(bytes([0x00, 0x01]))

    def test_packed_fixed_misalignment_loud(self):
        sch = {1: ("w", "double", "repeated")}
        blob = bytes([0x0A, 0x07]) + bytes(7)
        with pytest.raises(ProtoError, match="multiple"):
            decode_message(blob, sch)


class TestMsgpack:
    def test_spec_hand_vectors(self):
        assert msgpack_dumps(None) == b"\xc0"
        assert msgpack_dumps(True) == b"\xc3"
        assert msgpack_dumps(127) == b"\x7f"
        assert msgpack_dumps(-1) == b"\xff"
        assert msgpack_dumps(-32) == b"\xe0"
        assert msgpack_dumps(128) == b"\xcc\x80"
        assert msgpack_dumps(-33) == b"\xd0\xdf"
        assert msgpack_dumps("hello") == b"\xa5hello"
        assert msgpack_dumps([1, 2]) == b"\x92\x01\x02"
        assert msgpack_dumps({"a": 1}) == b"\x81\xa1a\x01"
        assert msgpack_dumps(1.5) == b"\xcb" + struct.pack(">d", 1.5)

    def test_timestamp_extension_all_layouts(self):
        for ts in (("timestamp", 1700000000, 0),
                   ("timestamp", 1700000000, 123),
                   ("timestamp", -5, 7),
                   ("timestamp", (1 << 35), 1)):
            assert msgpack_loads(msgpack_dumps(ts)) == ts
        # fixext4 layout exactly
        blob = msgpack_dumps(("timestamp", 1700000000, 0))
        assert blob[:2] == b"\xd6\xff"

    def test_roundtrip_nested(self):
        rng = random.Random(5)

        def rnd(depth=0):
            kinds = ["int", "str", "float", "bool", "nil", "bytes"]
            if depth < 3:
                kinds += ["list", "map"]
            k = rng.choice(kinds)
            if k == "int":
                return rng.randrange(-(2 ** 40), 2 ** 40)
            if k == "str":
                return "s" * rng.randrange(40)
            if k == "float":
                return float(rng.randrange(1000))
            if k == "bool":
                return bool(rng.randrange(2))
            if k == "nil":
                return None
            if k == "bytes":
                return bytes(rng.randrange(256)
                             for _ in range(rng.randrange(20)))
            if k == "list":
                return [rnd(depth + 1) for _ in range(rng.randrange(5))]
            return {f"k{i}": rnd(depth + 1)
                    for i in range(rng.randrange(5))}

        for _ in range(200):
            obj = rnd()
            assert msgpack_loads(msgpack_dumps(obj)) == obj

    def test_wide_containers_use_16_32_bit_forms(self):
        big = {f"key{i}": i for i in range(300)}
        assert msgpack_loads(msgpack_dumps(big)) == big
        lst = list(range(70000))
        blob = msgpack_dumps(lst)
        assert blob[0] == 0xDD  # array32
        assert msgpack_loads(blob) == lst
        s = "y" * 300
        assert msgpack_dumps(s)[0] == 0xDA  # str16

    def test_loud_failures(self):
        for bad in (b"\xc1", b"\x92\x01", b"\xa5hi",
                    msgpack_dumps(1) + b"\x00", b"\xcb\x00\x00"):
            with pytest.raises(MsgpackError):
                msgpack_loads(bad)

    def test_unhashable_map_key_loud(self):
        # map with an array key
        blob = b"\x81" + b"\x91\x01" + b"\x01"
        with pytest.raises(MsgpackError, match="unhashable"):
            msgpack_loads(blob)

    def test_ext_passthrough(self):
        blob = b"\xd5\x07ab"  # fixext2, type 7
        assert msgpack_loads(blob) == (7, b"ab")
