"""Snappy codec tests (operators/snappy.py) behind q447: block format
round trips across element kinds, the CRC-32C check value, framing
format with masked checksums, the Avro snappy codec integration."""

import random
import struct

import pytest

from rust_dataframe_spark.operators.snappy import (
    SnappyError,
    crc32c,
    snappy_compress,
    snappy_frame_compress,
    snappy_frame_decompress,
    snappy_uncompress,
)


class TestCrc32c:
    def test_standard_check_value(self):
        # the canonical CRC-32C (Castagnoli) check value
        assert crc32c(b"123456789") == 0xE3069283
        assert crc32c(b"") == 0


class TestSnappyBlock:
    def test_hand_vector_literal(self):
        # varint len 5, literal tag (4<<2), "hello"
        assert snappy_uncompress(b"\x05\x10hello") == b"hello"

    def test_hand_vector_copy(self):
        # "abcd" then copy-1: len 4 (tag bits 0), offset 4
        blob = b"\x08" + b"\x0cabcd" + bytes([0b001 | (0 << 2)]) + b"\x04"
        assert snappy_uncompress(blob) == b"abcdabcd"

    def test_overlap_run(self):
        d = b"a" * 1000
        c = snappy_compress(d)
        assert len(c) < 80
        assert snappy_uncompress(c) == d

    def test_roundtrip_matrix(self):
        rng = random.Random(47)
        for n in (0, 1, 4, 10, 60, 61, 100, 300, 5000, 70000):
            for style in range(4):
                if style == 0:
                    d = bytes(rng.randrange(256) for _ in range(n))
                elif style == 1:
                    d = (b"columnar stack default codec " * (n // 29 + 1))[:n]
                elif style == 2:
                    d = (b"abcdef" * (n // 6 + 1))[:n]
                else:
                    d = bytes(n)
                assert snappy_uncompress(snappy_compress(d)) == d, (n, style)

    def test_compression_is_real(self):
        d = b"the quick brown fox jumps over " * 300
        assert len(snappy_compress(d)) < len(d) // 3

    def test_declared_length_enforced(self):
        blob = bytearray(snappy_compress(b"hello world"))
        blob[0] += 1  # declare one more byte than decodes
        with pytest.raises(SnappyError, match="declared"):
            snappy_uncompress(bytes(blob))

    def test_bad_offset_loud(self):
        with pytest.raises(SnappyError, match="beyond|zero"):
            snappy_uncompress(b"\x08\x00a\x01\x09")  # offset 9, 1 decoded
        with pytest.raises(SnappyError, match="zero"):
            snappy_uncompress(b"\x08\x00a" + bytes([2, 0, 0]))


class TestSnappyFraming:
    def test_roundtrip_and_chunking(self):
        rng = random.Random(9)
        d = bytes(rng.randrange(97, 123) for _ in range(200000))
        f = snappy_frame_compress(d, chunk=65536)
        assert snappy_frame_decompress(f) == d

    def test_stream_id_required(self):
        with pytest.raises(SnappyError, match="identifier"):
            snappy_frame_decompress(b"\x00\x04\x00\x00abcd")

    def test_crc_enforced(self):
        f = bytearray(snappy_frame_compress(b"payload " * 200))
        f[30] ^= 1
        with pytest.raises(SnappyError):
            snappy_frame_decompress(bytes(f))

    def test_padding_and_skippable_chunks(self):
        f = snappy_frame_compress(b"data")
        head, rest = f[:10], f[10:]
        padded = head + b"\xfe\x03\x00\x00xxx" + b"\x80\x01\x00\x00z" + rest
        assert snappy_frame_decompress(padded) == b"data"

    def test_reserved_unskippable_loud(self):
        f = snappy_frame_compress(b"data")
        bad = f[:10] + b"\x02\x01\x00\x00z" + f[10:]
        with pytest.raises(SnappyError, match="unskippable"):
            snappy_frame_decompress(bad)


class TestAvroSnappy:
    def test_container_roundtrip_and_crc(self):
        from rust_dataframe_spark.sources.avro import (
            AvroError,
            decode_records,
            encode_records,
        )

        schema = {"type": "record", "name": "r", "fields": [
            {"name": "id", "type": "long"},
            {"name": "s", "type": "string"},
            {"name": "x", "type": "double"},
        ]}
        recs = [{"id": i, "s": f"row{i}", "x": i / 2} for i in range(500)]
        blob = encode_records(schema, recs, codec="snappy")
        s2, rows = decode_records(blob)
        assert rows == recs
        # snappy beats null codec on this data
        assert len(blob) < len(encode_records(schema, recs, codec="null"))
        # corrupt a block body byte (past the header) -> loud
        b = bytearray(blob)
        b[len(blob) // 2] ^= 1
        with pytest.raises(AvroError):
            decode_records(bytes(b))
