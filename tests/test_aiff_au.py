"""Round-9 AIFF/AU tests (operators/aiff_au.py) behind q439."""

import struct

import pytest

from rust_dataframe_spark.operators.aiff_au import (
    AiffError,
    decode_aiff,
    decode_au,
    encode_aiff,
    encode_au,
    is_aiff,
    is_au,
)


class TestAiff:
    def test_all_depths_round_trip(self):
        for bits in (8, 16, 24, 32):
            top = 1 << (bits - 1)
            samples = [((i * 37) % (2 * top)) - top for i in range(120)]
            blob = encode_aiff(16000, 2, bits, samples)
            assert is_aiff(blob[:12])
            assert decode_aiff(blob) == (16000, 2, bits // 8, samples)

    def test_80bit_extended_rate_exact(self):
        for rate in (8000, 11025, 22050, 44100, 48000, 96000, 192000):
            assert decode_aiff(encode_aiff(rate, 1, 16, [0, 1]))[0] == rate

    def test_frame_desync_fails_loud(self):
        blob = bytearray(encode_aiff(8000, 1, 16, [0] * 10))
        at = bytes(blob).index(b"COMM") + 8 + 2
        struct.pack_into(">I", blob, at, 99)
        with pytest.raises(AiffError, match="desynchronized"):
            decode_aiff(bytes(blob))

    def test_aifc_compression_gate(self):
        blob = bytearray(encode_aiff(8000, 1, 16, [0] * 4))
        blob[8:12] = b"AIFC"
        # COMM body is 18 bytes (no compression type): extend via a fake
        # compressed id by rewriting the chunk is complex — instead assert
        # the sowt/unknown ids gate when present
        at = bytes(blob).index(b"COMM")
        clen = struct.unpack_from(">I", blob, at + 4)[0]
        body = bytes(blob[at + 8 : at + 8 + clen]) + b"ima4"
        rebuilt = (
            bytes(blob[: at + 4])
            + struct.pack(">I", len(body))
            + body
            + bytes(blob[at + 8 + clen :])
        )
        with pytest.raises(AiffError, match="compression"):
            decode_aiff(rebuilt)

    def test_truncation_fails_loud(self):
        blob = encode_aiff(8000, 1, 16, list(range(50)))
        with pytest.raises(AiffError, match="overruns|missing|desync"):
            decode_aiff(blob[:-30])


class TestAu:
    def test_pcm_matrix(self):
        for enc, sw in ((2, 1), (3, 2), (4, 3), (5, 4)):
            top = 1 << (8 * sw - 1)
            samples = [((i * 53) % (2 * top)) - top for i in range(90)]
            blob = encode_au(22050, 3, samples, encoding=enc)
            assert is_au(blob[:4])
            assert decode_au(blob) == (22050, 3, sw, samples)

    def test_g711_expansion_matches_wav_tables(self):
        from rust_dataframe_spark.operators.wave_ext import (
            ALAW_TO_LIN,
            ULAW_TO_LIN,
        )

        codes = [(i * 29) % 256 for i in range(64)]
        assert decode_au(encode_au(8000, 1, codes, encoding=1))[3] == [
            ULAW_TO_LIN[c] for c in codes
        ]
        assert decode_au(encode_au(8000, 1, codes, encoding=27))[3] == [
            ALAW_TO_LIN[c] for c in codes
        ]

    def test_gates(self):
        blob = bytearray(encode_au(8000, 1, [0, 1], encoding=3))
        struct.pack_into(">I", blob, 12, 6)  # encoding 6 = float32
        with pytest.raises(AiffError, match="unsupported"):
            decode_au(bytes(blob))
        with pytest.raises(AiffError, match="magic|not an AU"):
            decode_au(b"RIFF" + bytes(30))
        blob2 = bytearray(encode_au(8000, 1, [0] * 8, encoding=3))
        struct.pack_into(">I", blob2, 8, 999)  # size overruns
        with pytest.raises(AiffError, match="overruns"):
            decode_au(bytes(blob2))

    def test_decode_audio_dispatch(self):
        from rust_dataframe_spark.operators.multimodal import decode_audio

        samples = [100, -100, 50, -50]
        sr, nch, sw, out = decode_audio(encode_aiff(8000, 1, 16, samples))
        assert (sr, nch, sw, out) == (8000, 1, 2, samples)
        sr, nch, sw, out = decode_audio(encode_au(8000, 2, samples))
        assert (sr, nch) == (8000, 2) and out == [0, 0]  # mono mix
