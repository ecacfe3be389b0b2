"""Round-9 MP3 frame-layer tests (operators/mp3.py): sync walk, CRC-16,
side-info parse, bit-reservoir accounting, VBR census, ID3 handling,
exact silence decode, and the honest spectral gate behind q416."""

import pytest

from rust_dataframe_spark.operators.mp3 import (
    Mp3Error,
    decode_mp3,
    encode_mp3_silence,
    is_mp3,
    mp3_census,
    mp3_frames,
)


class TestMp3FrameLayer:
    def test_cbr_round_trip_and_padding_walk(self):
        # 44100 is the rate where 144*br/sr is non-integer: frame sizes
        # MUST alternate 208/209 under the cumulative padding walk
        b = encode_mp3_silence(44100, 1, 20, bitrate_kbps=64)
        fr = mp3_frames(b)
        assert len(fr) == 20
        sizes = {f["frame_len"] for f in fr}
        assert sizes == {208, 209}
        assert sum(f["frame_len"] for f in fr) == len(b)
        assert all(f["crc_ok"] for f in fr)

    def test_exact_rate_no_padding(self):
        # 48000 divides 144*64000 exactly: every frame 192 bytes, no pad
        b = encode_mp3_silence(48000, 1, 12, bitrate_kbps=64)
        assert {f["frame_len"] for f in mp3_frames(b)} == {192}

    def test_vbr_census_exact(self):
        pattern = (64, 128, 96)
        b = encode_mp3_silence(32000, 2, 9, vbr_pattern=pattern)
        c = mp3_census(b)
        assert c["n_frames"] == 9 and c["nch"] == 2
        assert c["total_samples"] == 9 * 1152
        assert c["duration_ms"] == 9 * 1152 * 1000 // 32000
        assert (c["bitrate_min"], c["bitrate_max"]) == (64000, 128000)
        assert c["bitrate_sum"] == 3 * (64 + 128 + 96) * 1000

    def test_silence_decode_exact_zeros(self):
        b = encode_mp3_silence(44100, 2, 5, bitrate_kbps=96)
        sr, ch, s = decode_mp3(b)
        assert (sr, ch) == (44100, 2)
        assert len(s) == 5 * 1152 * 2 and not any(s)

    def test_crc_mismatch_fails_loud(self):
        b = bytearray(encode_mp3_silence(44100, 1, 4))
        b[6] ^= 0x01  # flip a side-info bit under the CRC
        with pytest.raises(Mp3Error, match="CRC"):
            mp3_frames(bytes(b))

    def test_lost_sync_fails_loud_no_resync(self):
        b = encode_mp3_silence(48000, 1, 4)
        fr = mp3_frames(b)
        spliced = b[: fr[1]["offset"]] + b"\x55" + b[fr[1]["offset"] :]
        with pytest.raises(Mp3Error, match="lost frame sync"):
            mp3_frames(spliced)

    def test_truncated_final_frame_fails_loud(self):
        b = encode_mp3_silence(48000, 1, 4)
        with pytest.raises(Mp3Error, match="overruns|truncated"):
            mp3_frames(b[:-10])

    def test_reservoir_overreach_fails_loud(self):
        # frame 0 claims main_data_begin=1 with an empty reservoir
        b = bytearray(encode_mp3_silence(48000, 1, 2, protected=False))
        b[4] = 0x80  # main_data_begin top bit (9-bit field starts side info)
        with pytest.raises(Mp3Error, match="reservoir"):
            mp3_frames(bytes(b))

    def test_spliced_stream_fails_loud(self):
        a = encode_mp3_silence(44100, 1, 2, bitrate_kbps=64)
        c = encode_mp3_silence(48000, 1, 2, bitrate_kbps=64)
        with pytest.raises(Mp3Error, match="spliced"):
            mp3_frames(a + c)

    def test_id3v2_and_id3v1_skipped(self):
        core = encode_mp3_silence(44100, 1, 6)
        id3v2 = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10
        id3v1 = b"TAG" + b"\x00" * 125
        c = mp3_census(id3v2 + core + id3v1)
        assert c["n_frames"] == 6
        assert is_mp3(id3v2[:4]) and is_mp3(core[:4])

    def test_xing_header_excluded_from_pcm(self):
        b = bytearray(encode_mp3_silence(44100, 1, 6, protected=False))
        fr = mp3_frames(bytes(b))
        at = fr[0]["main_start"]
        b[at : at + 4] = b"Xing"
        c = mp3_census(bytes(b))
        assert c["vbr_header"] is True
        assert c["n_frames"] == 6 and c["total_samples"] == 5 * 1152

    def test_spectral_data_gates_loud(self):
        # claim one nonzero big_values field: decode must refuse, census
        # must still work (frame layer is independent of spectral data)
        b = bytearray(encode_mp3_silence(48000, 1, 3, protected=False))
        fr = mp3_frames(bytes(b))
        # big_values sits 9+5+4+12 = 30 bits into side info; set its LSB
        # (bit 38 -> byte 4, bit offset 6 within side info at offset 4)
        side_at = fr[0]["offset"] + 4
        b[side_at + 4] |= 0x02
        assert mp3_frames(bytes(b))[0]["side"]["granules"][0][0][
            "big_values"
        ] == 1
        with pytest.raises(NotImplementedError, match="spectral"):
            decode_mp3(bytes(b))
        assert mp3_census(bytes(b))["n_frames"] == 3

    def test_layer2_fails_loud(self):
        b = bytearray(encode_mp3_silence(44100, 1, 2))
        b[1] = (b[1] & ~0x06) | 0x04  # layer bits -> Layer II
        with pytest.raises(Mp3Error, match="[Ll]ayer"):
            mp3_frames(bytes(b))

    def test_not_mp3(self):
        assert not is_mp3(b"OggS")
        assert not is_mp3(b"fLaC")
        with pytest.raises(Mp3Error):
            mp3_frames(b"\x00" * 64)


class TestId3v2:
    FIELDS = {"title": "Song é中", "artist": "Band", "album": "LP",
              "year": "2026", "track": "3/12"}

    def test_both_versions_all_encodings(self):
        from rust_dataframe_spark.operators.mp3 import (
            encode_id3v2,
            parse_id3v2,
        )

        for v in (3, 4):  # v2.3 UTF-16, v2.4 UTF-8 + syncsafe sizes
            assert parse_id3v2(encode_id3v2(self.FIELDS, version=v)) == (
                self.FIELDS
            )

    def test_tag_skip_agrees_with_frame_walk(self):
        from rust_dataframe_spark.operators.mp3 import (
            encode_id3v2,
            encode_mp3_silence,
            mp3_census,
            parse_id3v2,
        )

        blob = encode_id3v2(self.FIELDS) + encode_mp3_silence(44100, 1, 4)
        assert mp3_census(blob)["n_frames"] == 4
        assert parse_id3v2(blob)["artist"] == "Band"

    def test_absent_tag_is_empty(self):
        from rust_dataframe_spark.operators.mp3 import (
            encode_mp3_silence,
            parse_id3v2,
        )

        assert parse_id3v2(encode_mp3_silence(44100, 1, 2)) == {}

    def test_gates(self):
        from rust_dataframe_spark.operators.mp3 import (
            encode_id3v2,
            parse_id3v2,
        )

        with pytest.raises(Mp3Error, match="2.3/2.4"):
            parse_id3v2(b"ID3\x02\x00\x00\x00\x00\x00\x00")
        tag = bytearray(encode_id3v2({"title": "x"}))
        tag[5] |= 0x80  # unsynchronization flag
        with pytest.raises(Mp3Error, match="unsynchronized"):
            parse_id3v2(bytes(tag))
        tag2 = bytearray(encode_id3v2({"title": "x"}))
        tag2[14] = 0xFF  # frame size overruns tag
        with pytest.raises(Mp3Error, match="overruns|bad ID3"):
            parse_id3v2(bytes(tag2))
