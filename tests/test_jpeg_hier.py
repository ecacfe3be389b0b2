"""Round-9 hierarchical JPEG tests (operators/jpeg_hier.py, T.81 Annex
K) behind q424: the spec interpolation filter pinned by hand vectors,
2-level pyramid round trip, clamping, decode_jpeg_ext dispatch, gates."""

import pytest

from rust_dataframe_spark.operators.jpeg import JpegError, decode_jpeg_ext
from rust_dataframe_spark.operators.jpeg_hier import (
    decode_jpeg_hier,
    encode_jpeg_hier,
    upsample_2x,
)


def _fixture(w=32, h=16, d=0):
    hw, hh = w // 2, h // 2
    half = [
        (60 + d + 10 * (x // 8) + 20 * (y // 8)) % 200
        for y in range(hh) for x in range(hw)
    ]
    diff = [
        ((d + 5 * (x // 8) + 3 * (y // 8)) % 81) - 40
        for y in range(h) for x in range(w)
    ]
    return half, diff


class TestUpsample:
    def test_hand_vectors_match_spec_filter(self):
        # out[2i]=in[i]; out[2i+1]=(in[i]+in[i+1]+1)>>1; edge replicates
        assert upsample_2x([10, 20], 2, 1, 1, 0) == ([10, 15, 20, 20], 4, 1)
        assert upsample_2x([10, 20], 1, 2, 0, 1) == ([10, 15, 20, 20], 1, 4)
        # 2x2, both axes (horizontal first, then vertical)
        p, w, h = upsample_2x([0, 10, 20, 30], 2, 2, 1, 1)
        assert p == [0, 5, 10, 10,
                     10, 15, 20, 20,
                     20, 25, 30, 30,
                     20, 25, 30, 30]

    def test_rounding_is_plus_one_shift(self):
        assert upsample_2x([0, 1], 2, 1, 1, 0)[0] == [0, 1, 1, 1]  # (0+1+1)>>1


class TestJpegHier:
    def test_pyramid_round_trip_exact(self):
        half, diff = _fixture(d=7)
        blob = encode_jpeg_hier(32, 16, half, diff)
        w, h, c, depth, out = decode_jpeg_hier(blob)
        assert (w, h, c, depth) == (32, 16, 1, 8)
        up, _, _ = upsample_2x(half, 16, 8, 1, 1)
        assert bytes(out) == bytes(
            min(255, max(0, u + d)) for u, d in zip(up, diff)
        )

    def test_clamping_both_ends(self):
        # half near the rails + extreme diffs exercise the [0,255] clamp
        half = [250] * (16 * 8)
        diff = [100 if (x // 8 + y // 8) % 2 == 0 else -255
                for y in range(16) for x in range(32)]
        blob = encode_jpeg_hier(32, 16, half, diff)
        _w, _h, _c, _d, out = decode_jpeg_hier(blob)
        vals = set(out)
        assert vals == {255, 0}  # 250+100 clamps high, 250-255 clamps low

    def test_decode_jpeg_ext_dispatches_dhp(self):
        half, diff = _fixture(d=3)
        blob = encode_jpeg_hier(32, 16, half, diff)
        w, h, c, depth, out = decode_jpeg_ext(blob)
        assert (w, h, c, depth) == (32, 16, 1, 8)
        assert bytes(out) == bytes(decode_jpeg_hier(blob)[4])

    def test_gates_fail_loud(self):
        half, diff = _fixture()
        blob = bytearray(encode_jpeg_hier(32, 16, half, diff))
        # differential SOF5 -> progressive differential SOF6
        at = bytes(blob).index(b"\xff\xc5")
        blob[at + 1] = 0xC6
        with pytest.raises(JpegError, match="unsupported"):
            decode_jpeg_hier(bytes(blob))
        # strip the DHP: differential frame without a pyramid
        blob2 = encode_jpeg_hier(32, 16, half, diff)
        at = blob2.index(b"\xff\xde")
        ln = int.from_bytes(blob2[at + 2 : at + 4], "big")
        with pytest.raises(JpegError, match="before DHP"):
            decode_jpeg_hier(blob2[:at] + blob2[at + 2 + ln :])

    def test_dim_mismatch_fails_loud(self):
        half, diff = _fixture()
        blob = bytearray(encode_jpeg_hier(32, 16, half, diff))
        # corrupt the differential frame's width field (SOF5 header)
        at = bytes(blob).index(b"\xff\xc5")
        blob[at + 8] ^= 0x01  # width low byte
        with pytest.raises(JpegError, match="!= reference|!= DHP"):
            decode_jpeg_hier(bytes(blob))

    def test_encoder_discipline_enforced(self):
        half, diff = _fixture()
        with pytest.raises(JpegError, match="even"):
            encode_jpeg_hier(31, 16, half, diff)
        bad = list(diff)
        bad[5] += 1  # breaks block-constancy
        with pytest.raises(JpegError, match="block-constant"):
            encode_jpeg_hier(32, 16, half, bad)
