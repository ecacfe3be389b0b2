"""Round-9 Ogg container tests (operators/ogg.py): RFC 3533 page demux
(CRC, lacing, continuation, BOS/EOS, lost pages) and FLAC-in-Ogg sample
decode behind q415."""

import struct

import pytest

from rust_dataframe_spark.operators.ogg import (
    OggError,
    decode_ogg_audio,
    decode_ogg_packets,
    encode_ogg_flac,
    is_ogg,
)


def _synth(m=500, nch=2, seed=9):
    left = [((seed * 31 + i * 17) % 4001) - 2000 for i in range(m)]
    if nch == 1:
        return left
    right = [((seed * 53 + i * 29) % 4001) - 2000 for i in range(m)]
    return [v for p in zip(left, right) for v in p]


class TestOggFlac:
    def test_round_trip_exact(self):
        inter = _synth()
        ogg = encode_ogg_flac(16000, 2, 16, inter, block_size=192)
        assert is_ogg(ogg[:4])
        rate, ch, bps, out = decode_ogg_audio(ogg)
        assert (rate, ch, bps) == (16000, 2, 16)
        assert out == inter

    def test_continued_packet_across_pages(self):
        # cap 3 segments/page: the multi-frame audio packet MUST span
        # pages, exercising the 0x01 continued flag both ways
        inter = _synth(m=3000, nch=1)
        ogg = encode_ogg_flac(
            8000, 1, 16, inter, block_size=192, max_segs_per_page=2
        )
        # count pages and check at least one sets the continued flag
        flags = []
        pos = 0
        while pos < len(ogg):
            assert ogg[pos : pos + 4] == b"OggS"
            flags.append(ogg[pos + 5])
            nseg = ogg[pos + 26]
            body = sum(ogg[pos + 27 : pos + 27 + nseg])
            pos += 27 + nseg + body
        assert len(flags) >= 3
        assert any(f & 0x01 for f in flags)
        assert flags[0] & 0x02 and flags[-1] & 0x04
        rate, ch, bps, out = decode_ogg_audio(ogg)
        assert out == inter

    def test_granule_is_sample_count(self):
        inter = _synth(m=300, nch=2)
        ogg = encode_ogg_flac(16000, 2, 16, inter, block_size=192)
        # granule of the final (audio-ending, EOS) page = samples/channel
        granules = []
        pos = 0
        while pos < len(ogg):
            granules.append(struct.unpack_from("<q", ogg, pos + 6)[0])
            nseg = ogg[pos + 26]
            pos += 27 + nseg + sum(ogg[pos + 27 : pos + 27 + nseg])
        assert granules[-1] == 300

    def test_crc_enforced(self):
        ogg = bytearray(encode_ogg_flac(8000, 1, 16, _synth(m=64, nch=1)))
        ogg[-1] ^= 0x5A  # corrupt last body byte -> that page's CRC breaks
        with pytest.raises(OggError, match="CRC"):
            decode_ogg_packets(bytes(ogg))

    def test_lost_page_fails_loud(self):
        ogg = encode_ogg_flac(
            8000, 1, 16, _synth(m=900, nch=1), block_size=192,
            max_segs_per_page=3,
        )
        # drop the second page entirely
        pos = 0
        ends = []
        while pos < len(ogg):
            nseg = ogg[pos + 26]
            pos += 27 + nseg + sum(ogg[pos + 27 : pos + 27 + nseg])
            ends.append(pos)
        clipped = ogg[: ends[0]] + ogg[ends[1] :]
        with pytest.raises(OggError, match="lost page|continued-packet"):
            decode_ogg_packets(clipped)

    def test_multiplexed_serial_fails_loud(self):
        a = encode_ogg_flac(8000, 1, 16, _synth(m=64, nch=1), serial=1)
        b = encode_ogg_flac(8000, 1, 16, _synth(m=64, nch=1), serial=2)
        # interleave page-wise: second stream's first page after a's first
        na = a[26]
        a0 = a[: 27 + na + sum(a[27 : 27 + na])]
        with pytest.raises(OggError, match="multiplexed|BOS"):
            decode_ogg_packets(a0 + b)

    def test_missing_eos_fails_loud(self):
        ogg = encode_ogg_flac(8000, 1, 16, _synth(m=64, nch=1))
        # truncate at the first page boundary (headers only, no EOS)
        nseg = ogg[26]
        first_end = 27 + nseg + sum(ogg[27 : 27 + nseg])
        with pytest.raises(OggError, match="EOS|mid-packet"):
            decode_ogg_packets(ogg[:first_end])

    def test_vorbis_dispatches_and_opus_gates(self):
        # round 10: Vorbis decodes for real (a bare id packet with a
        # zero version but no setup headers raises the TYPED Vorbis
        # error); Opus keeps its loud gate
        from rust_dataframe_spark.operators.ogg import _crc32_ogg
        from rust_dataframe_spark.operators.vorbis import VorbisError

        for ident, exc, pat in (
            (b"\x01vorbis" + b"\x00" * 23, VorbisError, "header"),
            (b"OpusHead" + b"\x00" * 11, NotImplementedError, "Opus"),
        ):
            page = bytearray(
                b"OggS\x00\x06"
                + struct.pack("<q", 0)
                + struct.pack("<III", 7, 0, 0)
                + bytes([1, len(ident)])
                + ident
            )
            page[22:26] = struct.pack("<I", _crc32_ogg(bytes(page)))
            with pytest.raises(exc, match=pat):
                decode_ogg_audio(bytes(page))

    def test_not_ogg_fails_loud(self):
        with pytest.raises(OggError, match="capture"):
            decode_ogg_packets(b"fLaC" + b"\x00" * 40)
        assert not is_ogg(b"fLaC")

    def test_md5_still_enforced_through_mapping(self):
        inter = _synth(m=192, nch=1)
        ogg = bytearray(encode_ogg_flac(8000, 1, 16, inter, block_size=192))
        # flip one byte inside the mapped STREAMINFO MD5 (page 0 body) and
        # re-seal the page CRC: the FLAC layer must still catch it
        nseg = ogg[26]
        body_at = 27 + nseg
        # mapping packet: 9 bytes prefix + "fLaC" + 4-byte block hdr +
        # STREAMINFO; MD5 is the last 16 bytes of the 34-byte STREAMINFO
        md5_at = body_at + 9 + 4 + 4 + 18
        ogg[md5_at] ^= 0xFF
        ogg[22:26] = b"\x00\x00\x00\x00"
        from rust_dataframe_spark.operators.ogg import _crc32_ogg

        first_end = body_at + sum(ogg[27 : 27 + nseg])
        page = bytearray(ogg[:first_end])
        page[22:26] = b"\x00\x00\x00\x00"
        ogg[22:26] = struct.pack("<I", _crc32_ogg(bytes(page)))
        with pytest.raises(OggError, match="[Mm][Dd]5|invalid"):
            decode_ogg_audio(bytes(ogg))
