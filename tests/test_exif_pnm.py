"""Round-9 EXIF + netpbm tests (operators/exif.py, operators/pnm.py)
behind q427/q428."""

import pytest

from rust_dataframe_spark.operators.exif import (
    apply_orientation,
    embed_exif,
    parse_exif,
)
from rust_dataframe_spark.operators.jpeg import decode_jpeg, encode_jpeg
from rust_dataframe_spark.operators.pnm import (
    PnmError,
    decode_pnm,
    encode_pnm,
    is_pnm,
)
from rust_dataframe_spark.operators.tiff import TiffError


def _jpeg(w=24, h=16, d=5):
    plane = bytes(
        (9 * (x // 8) + 21 * (y // 8) + d) % 256
        for y in range(h) for x in range(w)
    )
    return encode_jpeg(w, h, plane, channels=1), plane


class TestExif:
    def test_parse_both_byte_orders(self):
        j, _ = _jpeg()
        for be in (False, True):
            m = parse_exif(embed_exif(j, orientation=6, big_endian=be))
            assert m["orientation"] == 6
            assert m["make"] == "rdf-spark"
            assert m["datetime"] == "2026:01:01 00:00:00"
            assert m["datetime_original"] == "2026:01:01 00:00:00"

    def test_absent_exif_is_empty_not_error(self):
        j, _ = _jpeg()
        assert parse_exif(j) == {}

    def test_all_eight_transforms_corner_laws(self):
        j, plane = _jpeg()
        w, h = 24, 16
        corner = {1: (0, 0), 2: (w - 1, 0), 3: (w - 1, h - 1),
                  4: (0, h - 1), 5: (0, 0), 6: (0, h - 1),
                  7: (w - 1, h - 1), 8: (w - 1, 0)}
        for o in range(1, 9):
            ow, oh, out = apply_orientation(w, h, 1, plane, o)
            assert (ow, oh) == ((h, w) if o >= 5 else (w, h))
            sx, sy = corner[o]
            assert out[0] == plane[sy * w + sx], o
            assert sorted(out) == sorted(plane)  # a permutation

    def test_composition_identities(self):
        _, plane = _jpeg()
        w, h = 24, 16
        # 180 twice = id; 90CW then 270CW = id; transpose twice = id
        for a, b in ((3, 3), (6, 8), (5, 5), (2, 2), (4, 4), (7, 7)):
            w2, h2, p = apply_orientation(w, h, 1, plane, a)
            _, _, p2 = apply_orientation(w2, h2, 1, p, b)
            assert p2 == plane, (a, b)

    def test_bad_orientation_fails_loud(self):
        j, plane = _jpeg()
        with pytest.raises(TiffError, match="orientation"):
            apply_orientation(24, 16, 1, plane, 9)
        # corrupt the embedded TIFF header
        jj = bytearray(embed_exif(j, orientation=1))
        at = bytes(jj).index(b"Exif\x00\x00") + 6
        jj[at] = 0x58
        with pytest.raises(TiffError, match="TIFF header"):
            parse_exif(bytes(jj))

    def test_decode_still_works_with_app1(self):
        j, plane = _jpeg()
        jj = embed_exif(j, orientation=3)
        _w, _h, _c, px = decode_jpeg(jj)
        assert bytes(px) == plane


class TestPnm:
    def test_binary_ascii_round_trips(self):
        w, h = 7, 5
        gray = bytes((3 * x + 5 * y) % 256 for y in range(h) for x in range(w))
        rgb = bytes((x + y + 17 * c) % 256 for y in range(h)
                    for x in range(w) for c in range(3))
        for ascii_mode in (False, True):
            assert decode_pnm(encode_pnm(w, h, 1, gray,
                                         ascii_mode=ascii_mode)) == (
                w, h, 1, gray,
            )
            assert decode_pnm(encode_pnm(w, h, 3, rgb,
                                         ascii_mode=ascii_mode)) == (
                w, h, 3, rgb,
            )

    def test_p1_comments_unseparated_digits(self):
        w, h, c, px = decode_pnm(b"P1\n# c\n5 2\n10101\n01#x\n010\n")
        assert (w, h, c) == (5, 2, 1)
        # spec: 1 = black = 0
        assert px == bytes([0, 255, 0, 255, 0, 255, 0, 255, 0, 255])

    def test_p4_bit_packing(self):
        p4 = b"P4\n10 2\n" + bytes([0b10101010, 0b10000000,
                                    0b01010101, 0b01000000])
        _w, _h, _c, px = decode_pnm(p4)
        assert px[:10] == bytes([0, 255] * 5)
        assert px[10:] == bytes([255, 0] * 5)

    def test_16bit_scaled_only_at_65535(self):
        import struct

        vals = [(i * 257) for i in range(6)]
        p5 = b"P5\n3 2\n65535\n" + b"".join(
            struct.pack(">H", v) for v in vals
        )
        assert list(decode_pnm(p5)[3]) == [v >> 8 for v in vals]
        with pytest.raises(PnmError, match="65535"):
            decode_pnm(b"P5\n3 2\n1000\n" + bytes(12))

    def test_gates(self):
        with pytest.raises(PnmError, match="truncated"):
            decode_pnm(b"P6\n7 5\n255\n" + bytes(10))
        with pytest.raises(PnmError, match="exceeds"):
            decode_pnm(b"P2\n2 1\n10\n11 3\n")
        with pytest.raises(PnmError, match="magic"):
            decode_pnm(b"P7\nwhatever")
        assert not is_pnm(b"BM")

    def test_decode_image_dispatch(self):
        from rust_dataframe_spark.operators.multimodal import decode_image

        assert decode_image(encode_pnm(4, 3, 1, bytes(12))) == (4, 3)
