"""APNG demux/compositor tests (operators/apng.py) behind q443:
acTL/fcTL/fdAT framing, sequence-number validation, the default-image
rule, region bounds, both blend ops and all three dispose ops."""

import struct

import pytest

from rust_dataframe_spark.operators.apng import (
    ApngError,
    apng_frames,
    encode_apng,
    is_apng,
)
from rust_dataframe_spark.operators.png import encode_png


def _solid(w, h, rgba):
    return bytes(rgba) * (w * h)


W, H = 9, 7
BASE = _solid(W, H, (10, 20, 30, 255))
PATCH = _solid(3, 2, (200, 100, 50, 255))


class TestApngStructure:
    def test_is_apng_discriminates(self):
        plain = encode_png(4, 3, bytes(36), channels=3)
        assert not is_apng(plain)
        assert is_apng(encode_apng(2, 2, [{"rgba": bytes(16)}]))

    def test_full_frame_source_equals_raw(self):
        f0 = bytes((7 * i) % 256 for i in range(W * H * 4))
        f1 = bytes((11 * i + 3) % 256 for i in range(W * H * 4))
        blob = encode_apng(W, H, [{"rgba": f0}, {"rgba": f1}])
        w, h, frames = apng_frames(blob)
        assert (w, h) == (W, H)
        assert [f["rgba"] for f in frames] == [f0, f1]
        assert frames[0]["delay_ms"] == 40

    def test_default_image_not_in_animation(self):
        f0 = _solid(W, H, (1, 2, 3, 255))
        f1 = _solid(W, H, (4, 5, 6, 255))
        blob = encode_apng(
            W, H, [{"rgba": f0}, {"rgba": f1}], default_image=BASE
        )
        _, _, frames = apng_frames(blob)
        assert len(frames) == 2
        assert frames[0]["rgba"] == f0

    def test_sequence_number_validation(self):
        blob = bytearray(
            encode_apng(W, H, [{"rgba": BASE}, {"rgba": PATCH, "x": 0,
                                                "y": 0, "w": 3, "h": 2}])
        )
        i = blob.find(b"fdAT")
        # fdAT body starts 4 bytes after the type; bump its sequence and
        # re-CRC so only the sequence check can fire
        import zlib

        (ln,) = struct.unpack_from(">I", blob, i - 4)
        struct.pack_into(">I", blob, i + 4, 9)
        body = bytes(blob[i + 4 : i + 4 + ln])
        struct.pack_into(
            ">I", blob, i + 4 + ln, zlib.crc32(b"fdAT" + body) & 0xFFFFFFFF
        )
        with pytest.raises(ApngError, match="sequence"):
            apng_frames(bytes(blob))

    def test_frame_count_mismatch(self):
        blob = encode_apng(W, H, [{"rgba": BASE}])
        b = bytearray(blob)
        i = b.find(b"acTL")
        import zlib

        struct.pack_into(">I", b, i + 4, 3)
        body = bytes(b[i + 4 : i + 12])
        struct.pack_into(
            ">I", b, i + 12, zlib.crc32(b"acTL" + body) & 0xFFFFFFFF
        )
        with pytest.raises(ApngError, match="declares 3 frames"):
            apng_frames(bytes(b))

    def test_region_bounds(self):
        blob = encode_apng(
            4, 4,
            [{"rgba": bytes(64)},
             {"rgba": bytes(16), "x": 3, "y": 3, "w": 2, "h": 2}],
        )
        with pytest.raises(ApngError, match="outside"):
            apng_frames(blob)


class TestCompositing:
    def test_dispose_background_clears_region(self):
        blob = encode_apng(
            W, H,
            [
                {"rgba": BASE},
                {"rgba": PATCH, "x": 2, "y": 1, "w": 3, "h": 2,
                 "dispose": 1},
                {"rgba": PATCH, "x": 4, "y": 3, "w": 3, "h": 2,
                 "dispose": 0},
            ],
        )
        _, _, fr = apng_frames(blob)
        at = lambda f, x, y: fr[f]["rgba"][4 * (y * W + x): 4 * (y * W + x) + 4]  # noqa: E731
        assert at(1, 2, 1) == bytes((200, 100, 50, 255))
        assert at(2, 2, 1) == bytes((0, 0, 0, 0))  # cleared
        assert at(2, 4, 3) == bytes((200, 100, 50, 255))

    def test_dispose_previous_reverts(self):
        blob = encode_apng(
            W, H,
            [
                {"rgba": BASE},
                {"rgba": PATCH, "x": 2, "y": 1, "w": 3, "h": 2,
                 "dispose": 2},
                {"rgba": _solid(1, 1, (9, 9, 9, 255)), "x": 8, "y": 6,
                 "w": 1, "h": 1},
            ],
        )
        _, _, fr = apng_frames(blob)
        at = lambda f, x, y: fr[f]["rgba"][4 * (y * W + x): 4 * (y * W + x) + 4]  # noqa: E731
        assert at(1, 2, 1) == bytes((200, 100, 50, 255))
        assert at(2, 2, 1) == bytes((10, 20, 30, 255))  # reverted to base

    def test_dispose_previous_on_frame0_degrades_to_background(self):
        blob = encode_apng(
            W, H,
            [
                {"rgba": BASE, "dispose": 2},
                {"rgba": _solid(1, 1, (9, 9, 9, 255)), "x": 0, "y": 0,
                 "w": 1, "h": 1},
            ],
        )
        _, _, fr = apng_frames(blob)
        # whole canvas (except the 1px frame-1 patch) is transparent
        assert fr[1]["rgba"][4:8] == bytes((0, 0, 0, 0))

    def test_blend_over_zero_alpha_keeps_dst(self):
        hole = _solid(2, 1, (9, 9, 9, 0))
        blob = encode_apng(
            W, H,
            [{"rgba": BASE},
             {"rgba": hole, "x": 0, "y": 0, "w": 2, "h": 1, "blend": 1}],
        )
        _, _, fr = apng_frames(blob)
        assert fr[1]["rgba"][:8] == BASE[:8]

    def test_blend_source_writes_alpha_through(self):
        hole = _solid(2, 1, (9, 9, 9, 0))
        blob = encode_apng(
            W, H,
            [{"rgba": BASE},
             {"rgba": hole, "x": 0, "y": 0, "w": 2, "h": 1, "blend": 0}],
        )
        _, _, fr = apng_frames(blob)
        assert fr[1]["rgba"][:4] == bytes((9, 9, 9, 0))

    def test_blend_over_fractional_alpha_exact_rounding(self):
        # sa=128 over opaque dst: out_a=255, c = (sc*128*255 + dc*255*127
        # + oa/2) // oa with oa = 128*255 + 255*127 = 255*255
        src = _solid(1, 1, (100, 200, 0, 128))
        blob = encode_apng(
            W, H,
            [{"rgba": BASE},
             {"rgba": src, "x": 0, "y": 0, "w": 1, "h": 1, "blend": 1}],
        )
        _, _, fr = apng_frames(blob)
        oa = 255 * 255
        expect = tuple(
            (sc * 128 * 255 + dc * 255 * 127 + oa // 2) // oa
            for sc, dc in ((100, 10), (200, 20), (0, 30))
        )
        assert fr[1]["rgba"][:4] == bytes(expect + (255,))
