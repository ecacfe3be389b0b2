"""CCITT T.4/T.6 fax codec tests (operators/ccitt.py) and the round-9
TIFF gate-closure extensions behind q441/q442: tiled layout, planar
configuration 2, 16-bit and float32 samples, CCITT compressions 2/3/4
in the IFD walk.  The code tables are pinned against spec-published
codewords (ITU-T T.4 tables 2/3/4, T.6 table 1), not just round-trip —
a self-consistent-but-wrong table would survive round-trip."""

import random
import struct

import pytest

from rust_dataframe_spark.operators.ccitt import (
    CcittError,
    decode_g3,
    decode_g4,
    decode_mh,
    encode_g3,
    encode_g4,
    encode_mh,
)
from rust_dataframe_spark.operators.tiff import (
    TiffError,
    decode_tiff,
    encode_tiff,
)


def _bits_of(data: bytes) -> str:
    return "".join(f"{b:08b}" for b in data)


class TestSpecCodewords:
    """Exact codewords from the published T.4/T.6 tables."""

    def test_mh_white4_black2(self):
        # width 6, one row: white 4 ("1011") + black 2 ("11") -> 101111
        row = bytes([0, 0, 0, 0, 1, 1])
        enc = encode_mh(row, 6, 1)
        assert enc == bytes([0b10111100])
        assert decode_mh(enc, 6, 1) == row

    def test_mh_leading_black_needs_white0(self):
        # all-black width 3: white 0 ("00110101") + black 3 ("10")
        row = bytes([1, 1, 1])
        enc = encode_mh(row, 3, 1)
        assert _bits_of(enc).startswith("00110101" + "10")
        assert decode_mh(enc, 3, 1) == row

    def test_terminating_table_pins(self):
        # white 1/63, black 0/1/63 — one row each, width = run
        pins = [
            (0, 1, "000111"),
            (0, 63, "00110100"),
            (1, 1, "00110101" + "010"),  # white 0 + black 1
            (1, 63, "00110101" + "000001100111"),
        ]
        for black, width, prefix in pins:
            row = bytes([black]) * width
            assert _bits_of(encode_mh(row, width, 1)).startswith(prefix)

    def test_makeup_table_pins(self):
        # white 64+0 -> "11011"+"00110101"; white 1728+5 -> "010011011"+"1100"
        assert _bits_of(encode_mh(bytes(64), 64, 1)).startswith(
            "11011" + "00110101"
        )
        assert _bits_of(encode_mh(bytes(1733), 1733, 1)).startswith(
            "010011011" + "1100"
        )
        # black 64+1 (after the leading white 0) -> "0000001111"+"010"
        assert _bits_of(encode_mh(bytes([1]) * 65, 65, 1)).startswith(
            "00110101" + "0000001111" + "010"
        )
        # extended 2560 shared ladder, run 2560+2560+3 black
        long_black = bytes([1]) * 5123
        assert _bits_of(encode_mh(long_black, 5123, 1)).startswith(
            "00110101" + "000000011111" + "000000011111" + "10"
        )
        assert decode_mh(encode_mh(long_black, 5123, 1), 5123, 1) == long_black

    def test_g4_all_white_rows_are_single_v0_bits(self):
        # each all-white row: b1 = width, a1 = width, V0 = "1"; then EOFB
        enc = encode_g4(bytes(16), 8, 2)
        assert _bits_of(enc).startswith("11" + "000000000001" * 2)
        assert decode_g4(enc, 8, 2) == bytes(16)

    def test_g4_mode_codewords(self):
        # row0 all white, row1 = black run at [2,5): coded against the
        # all-white reference: no change on ref -> b1=8; a1=2 -> |a1-b1|>3
        # -> horizontal "001" + white 2 ("0111") + black 3 ("10");
        # then a0=5, b1=8, a1=8 (end) -> V0... a0=5 color white, next
        # change none -> a1=8=b1 -> V0 "1".
        row1 = bytes([0, 0, 1, 1, 1, 0, 0, 0])
        enc = encode_g4(bytes(8) + row1, 8, 2)
        assert _bits_of(enc).startswith("1" + "001" + "0111" + "10" + "1")
        assert decode_g4(enc, 8, 2) == bytes(8) + row1

    def test_g3_eol_framing(self):
        enc = encode_g3(bytes([0, 1]), 2, 1)
        # EOL + white 1 ("000111") + black 1 ("010")
        assert _bits_of(enc).startswith("000000000001" + "000111" + "010")

    def test_g3_2d_tag_bits(self):
        px = bytes([0, 1] * 4)  # 2 rows of width 4
        enc = encode_g3(px, 4, 2, two_d=True)
        s = _bits_of(enc)
        assert s.startswith("000000000001" + "1")  # row 0: tag 1 = 1D
        # row 1 EOL is followed by tag 0 = 2D (identical rows -> V0s)
        assert "000000000001" + "0" in s[13:]
        assert decode_g3(enc, 4, 2, two_d=True) == px

    def test_fill_bits_before_eol_tolerated(self):
        enc = encode_g3(bytes([0, 1]), 2, 1)
        padded = bytes(2) + enc  # 16 zero fill bits before the EOL
        assert decode_g3(padded, 2, 1) == bytes([0, 1])


class TestCcittFailLoud:
    def test_truncated(self):
        enc = encode_g4(bytes([1]) * 64, 8, 8)
        with pytest.raises(CcittError):
            decode_g4(enc[: len(enc) // 2], 8, 8)

    def test_wrong_width_overrun(self):
        enc = encode_mh(bytes([1]) * 8, 8, 1)
        with pytest.raises(CcittError):
            decode_mh(enc, 4, 1)

    def test_unknown_code(self):
        with pytest.raises(CcittError):
            decode_mh(b"\xaa\xaa\xaa\xaa", 64, 1)

    def test_bad_eol(self):
        with pytest.raises(CcittError, match="EOL"):
            decode_g3(b"\xff\xff", 8, 1)

    def test_encoder_rejects_non_bilevel(self):
        with pytest.raises(CcittError, match="bilevel"):
            encode_mh(bytes([0, 2]), 2, 1)

    def test_random_rows_roundtrip_all_flavours(self):
        rng = random.Random(99)
        for _ in range(25):
            w = rng.randint(1, 70)
            h = rng.randint(1, 9)
            px = bytes(rng.randrange(2) for _ in range(w * h))
            assert decode_mh(encode_mh(px, w, h), w, h) == px
            assert decode_g3(encode_g3(px, w, h), w, h) == px
            assert (
                decode_g3(encode_g3(px, w, h, two_d=True), w, h, two_d=True)
                == px
            )
            assert decode_g4(encode_g4(px, w, h), w, h) == px


def _patch_tag(blob: bytes, tag: int, value: int) -> bytes:
    """Rewrite an inline IFD tag value in an encoder-produced TIFF."""
    b = bytearray(blob)
    e = "<" if b[:2] == b"II" else ">"
    off = struct.unpack_from(e + "I", b, 4)[0]
    n = struct.unpack_from(e + "H", b, off)[0]
    for i in range(n):
        at = off + 2 + 12 * i
        t = struct.unpack_from(e + "H", b, at)[0]
        if t == tag:
            struct.pack_into(e + "I", b, at + 8, value)
            return bytes(b)
    raise AssertionError(f"tag {tag} not in fixture")


class TestTiffExtensions:
    def test_tiled_reassembly_positions(self):
        w, h = 10, 7
        px = bytes((3 * x + 5 * y) % 256 for y in range(h) for x in range(w))
        blob = encode_tiff(w, h, 1, px, tile=(4, 3), compression=5,
                           predictor=2)
        assert decode_tiff(blob) == (w, h, 1, px)

    def test_planar_interleave(self):
        w, h = 5, 4
        px = bytes((7 * i + c) % 256 for i in range(w * h) for c in range(3))
        blob = encode_tiff(w, h, 3, px, planar=2, compression=32773,
                           rows_per_strip=2, big_endian=True)
        assert decode_tiff(blob) == (w, h, 3, px)

    def test_16bit_both_endians(self):
        w, h = 6, 3
        vals = [(1000 * i + 37) % 65536 for i in range(w * h)]
        for be in (False, True):
            blob = encode_tiff(w, h, 1, vals, bits=16, big_endian=be)
            assert decode_tiff(blob) == (
                w, h, 1, bytes(v >> 8 for v in vals)
            )

    def test_float32_gray(self):
        ks = list(range(0, 24))
        blob = encode_tiff(6, 4, 1, [k / 255 for k in ks], sample_format=3)
        assert decode_tiff(blob) == (6, 4, 1, bytes(ks))

    def test_float_clamps(self):
        blob = encode_tiff(2, 1, 1, [-1.5, 2.0], sample_format=3)
        assert decode_tiff(blob)[3] == bytes([0, 255])

    def test_ccitt_all_three_compressions(self):
        w, h = 17, 6
        px = bytes(
            255 * ((3 * x + 5 * y) % 7 < 3) for y in range(h)
            for x in range(w)
        )
        for comp, kw in ((2, {}), (3, {}), (3, {"t4_2d": True}), (4, {})):
            blob = encode_tiff(w, h, 1, px, compression=comp,
                               rows_per_strip=4, **kw)
            assert decode_tiff(blob) == (w, h, 1, px), comp

    def test_ccitt_photometric1_flips(self):
        # BlackIsZero: fax white run (sample 0) now decodes to gray 0
        px = bytes([0, 255, 255, 0])
        blob = encode_tiff(4, 1, 1, px, compression=4)
        flipped = _patch_tag(blob, 262, 1)
        assert decode_tiff(flipped)[3] == bytes([255, 0, 0, 255])

    def test_uncompressed_mode_gate(self):
        blob = encode_tiff(4, 1, 1, bytes([0, 255, 0, 255]), compression=3)
        with pytest.raises(TiffError, match="uncompressed-mode"):
            decode_tiff(_patch_tag(blob, 292, 2))

    def test_planar_tiles_gate(self):
        with pytest.raises(TiffError, match="planar tiles"):
            encode_tiff(4, 4, 3, bytes(48), tile=(2, 2), planar=2)

    def test_pages_with_special_surface_gate(self):
        with pytest.raises(TiffError, match="extra pages"):
            encode_tiff(2, 2, 1, [0] * 4, bits=16,
                        pages=[(1, 1, 1, b"\x00")])


class TestJpegInTiff:
    """Compression 7 (new-style JPEG) with and without the shared
    JPEGTables tag — block-constant gray with quant=1 round-trips
    pixel-exactly (the q387 discipline)."""

    def _plane(self, d, w, h):
        return bytes(
            (d + 19 * (x // 8) + 23 * (y // 8)) % 256
            for y in range(h) for x in range(w)
        )

    def test_exact_roundtrip_both_table_layouts(self):
        for d in range(6):
            w, h = 8 * (1 + d % 4), 24
            px = self._plane(d, w, h)
            for jt in (False, True):
                blob = encode_tiff(
                    w, h, 1, px, compression=7, rows_per_strip=8,
                    jpeg_tables=jt, big_endian=bool(d % 2),
                )
                assert decode_tiff(blob) == (w, h, 1, px), (d, jt)

    def test_rgb_ycbcr_path(self):
        w, h = 16, 16
        rgb = bytes(((3 * i + c * 40) % 256)
                    for i in range(w * h) for c in range(3))
        blob = encode_tiff(w, h, 3, rgb, compression=7, rows_per_strip=8)
        W, H, C, out = decode_tiff(blob)
        assert (W, H, C) == (w, h, 3)
        err = sum(abs(a - b) for a, b in zip(out, rgb)) / len(rgb)
        assert err < 3.0  # lossy but close (quant=1)

    def test_bad_jpegtables_loud(self):
        blob = bytearray(encode_tiff(8, 8, 1, bytes(64), compression=7,
                                     jpeg_tables=True))
        off = struct.unpack_from("<I", blob, 4)[0]
        n = struct.unpack_from("<H", blob, off)[0]
        for i in range(n):
            at = off + 2 + 12 * i
            if struct.unpack_from("<H", blob, at)[0] == 347:
                voff = struct.unpack_from("<I", blob, at + 8)[0]
                blob[voff] = 0x00
        with pytest.raises(TiffError, match="abbreviated"):
            decode_tiff(bytes(blob))

    def test_strip_dims_enforced(self):
        # retag RowsPerStrip so strip JPEG dims no longer match
        blob = bytearray(encode_tiff(8, 24, 1, self._plane(0, 8, 24),
                                     compression=7, rows_per_strip=8))
        off = struct.unpack_from("<I", blob, 4)[0]
        n = struct.unpack_from("<H", blob, off)[0]
        for i in range(n):
            at = off + 2 + 12 * i
            if struct.unpack_from("<H", blob, at)[0] == 278:
                struct.pack_into("<I", blob, at + 8, 12)
        with pytest.raises(TiffError):
            decode_tiff(bytes(blob))
