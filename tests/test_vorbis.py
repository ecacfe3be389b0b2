"""Ogg Vorbis codec tests (operators/vorbis.py) behind q457:
encoder/decoder exactness, codebook tree discipline, floor1 math,
fail-loud matrix, Ogg integration."""

import math

import numpy as np
import pytest

from rust_dataframe_spark.operators.vorbis import (
    VorbisError,
    _assign_codewords,
    _Bits,
    _float32_pack,
    _float32_unpack,
    _imdct,
    _render_line,
    _render_point,
    _window_half,
    decode_vorbis,
    encode_vorbis,
    is_ogg_vorbis,
)


def _blocks(d, nblocks=3, ch=2, half=128):
    return [
        [[((7 * d + 13 * b + 29 * c + 11 * k) % 31) - 15
          for k in range(half)] for c in range(ch)]
        for b in range(nblocks)
    ]


def _reference(blocks, bs=256):
    half = bs // 2
    w = _window_half(half)
    win = np.concatenate([w, w[::-1]])
    ch = len(blocks[0])
    out = []
    for c in range(ch):
        ref = np.zeros((len(blocks) - 1) * half)
        prev = None
        pos = 0
        for b in range(len(blocks)):
            y = _imdct(np.array(blocks[b][c], float), bs) * win
            if prev is not None:
                ref[pos:pos + half] = prev[half:] + y[:half]
                pos += half
            prev = y
        out.append(ref)
    return out


class TestVorbisRoundTrip:
    def test_exact_reconstruction(self):
        blocks = _blocks(3)
        blob = encode_vorbis(8000, 2, blocks)
        assert is_ogg_vorbis(blob)
        rate, nch, samples = decode_vorbis(blob)
        assert (rate, nch) == (8000, 2)
        ref = _reference(blocks)
        for c in range(2):
            got = np.array(samples[c])
            assert got.shape == ref[c].shape
            assert np.abs(got - ref[c]).max() == 0.0

    def test_mono_and_other_blocksize(self):
        half = 64
        blocks = [
            [[(5 * b + 3 * k) % 29 - 14 for k in range(half)]]
            for b in range(4)
        ]
        blob = encode_vorbis(44100, 1, blocks, blocksize=128)
        rate, nch, samples = decode_vorbis(blob)
        assert (rate, nch) == (44100, 1)
        ref = _reference(blocks, bs=128)
        assert np.abs(np.array(samples[0]) - ref[0]).max() == 0.0

    def test_q457_rounding_margin(self):
        # the closed-form-oracle safety argument: every decoded sample
        # must sit far from a floor(x*1000+0.5) boundary
        worst = 1.0
        for d in range(16):
            blob = encode_vorbis(8000, 2, _blocks(d))
            _r, _c, samples = decode_vorbis(blob)
            for c in range(2):
                s = np.array(samples[c]) * 1000
                worst = min(
                    worst, np.abs((s - np.floor(s)) - 0.5).min()
                )
        assert worst > 1e-6

    def test_ogg_audio_dispatch(self):
        from rust_dataframe_spark.operators.ogg import decode_ogg_audio

        blob = encode_vorbis(8000, 2, _blocks(1))
        sr, nch, bps, inter = decode_ogg_audio(blob)
        assert (sr, nch, bps) == (8000, 2, 16)
        assert len(inter) == 2 * 256


class TestCodebooks:
    def test_canonical_assignment_prefix_free(self):
        lengths = [2, 2, 3, 3, 3, 4, 5, 5]
        codes = _assign_codewords(lengths)
        # prefix-freedom: no codeword is a prefix of another
        items = [(lengths[e], c) for e, c in codes.items()]
        for l1, c1 in items:
            for l2, c2 in items:
                if (l1, c1) != (l2, c2) and l1 <= l2:
                    assert (c2 >> (l2 - l1)) != c1
        # lowest-available rule: entry 0 gets codeword 0
        assert codes[0] == 0

    def test_overspecified_loud(self):
        with pytest.raises(VorbisError, match="overspecified"):
            _assign_codewords([1, 1, 1])

    def test_underspecified_loud(self):
        with pytest.raises(VorbisError, match="underspecified"):
            _assign_codewords([2, 2, 2])

    def test_float32_twin(self):
        for v in (-15.0, -0.25, 0.0, 1.0, 3.5, 12345.0, 2.0**-10):
            assert _float32_unpack(_float32_pack(v)) == v


class TestFloorMath:
    def test_render_point_midpoint(self):
        assert _render_point(0, 0, 10, 10, 5) == 5
        assert _render_point(0, 10, 10, 0, 5) == 5

    def test_render_line_flat(self):
        out = [0] * 8
        _render_line(0, 42, 8, 42, out, 8)
        assert out == [42] * 8

    def test_render_line_slope(self):
        out = [0] * 10
        _render_line(0, 0, 10, 10, out, 10)
        assert out == list(range(10))


class TestFailLoud:
    def _blob(self):
        return encode_vorbis(8000, 2, _blocks(0))

    def test_truncation_typed(self):
        blob = self._blob()
        for frac in (0.3, 0.6, 0.9):
            cut = blob[: int(len(blob) * frac)]
            with pytest.raises((VorbisError, Exception)) as ei:
                decode_vorbis(cut)
            from rust_dataframe_spark.operators.ogg import OggError

            assert isinstance(
                ei.value, (VorbisError, OggError)
            ), type(ei.value)

    def test_bad_framing_bit_loud(self):
        # flip the identification framing bit region: re-encode with a
        # corrupted ident packet via the bit writer
        from rust_dataframe_spark.operators.ogg import (
            decode_ogg_packets,
        )

        blob = bytearray(self._blob())
        # locate the ident packet inside page 1 body and clear its
        # last byte's framing bit; then page CRC must be refreshed
        from rust_dataframe_spark.operators.ogg import _crc32_ogg
        import struct as _s

        nseg = blob[26]
        body0 = 27 + nseg
        ident_len = blob[27]
        blob[body0 + ident_len - 1] &= 0xFE
        page = bytearray(blob[: body0 + sum(blob[27:27 + nseg])])
        page[22:26] = b"\0\0\0\0"
        blob[22:26] = _s.pack("<I", _crc32_ogg(bytes(page)))
        with pytest.raises(VorbisError, match="framing"):
            decode_vorbis(bytes(blob))
        del decode_ogg_packets

    def test_floor0_gate_message_exists(self):
        # the loud gate for the deprecated LSP floor is reachable code
        import inspect

        from rust_dataframe_spark.operators import vorbis as V

        src = inspect.getsource(V._parse_headers)
        assert "floor type 0" in src and "fail-loud" in src

    def test_coefficient_range_enforced(self):
        with pytest.raises(VorbisError, match="range"):
            encode_vorbis(
                8000, 1, [[[99] * 128], [[0] * 128]]
            )

    def test_math_constants_are_derivable(self):
        # the docstring claim: 0.11512925 is ln(10)/20
        assert abs(0.11512925 - math.log(10) / 20) < 1e-8
