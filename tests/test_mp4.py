"""Round-9 MP4/ISO-BMFF container tests (operators/mp4.py) — the box-tree
demux behind q414: stsc chunk-run walk, 64-bit largesize boxes, co64
offsets, desync fail-loud, and the honest codec gates (H.264, mjpb)."""

import struct

import pytest

from rust_dataframe_spark.operators.mp4 import (
    Mp4Error,
    decode_mp4,
    decode_mp4_frame,
    encode_mp4,
    is_mp4,
)


def _mjpeg_frames(w=16, h=8, nframes=5):
    from rust_dataframe_spark.operators.jpeg import encode_jpeg

    planes = [
        bytes((7 + 17 * (x // 8) + 31 * f) % 256 for y in range(h) for x in range(w))
        for f in range(nframes)
    ]
    return [encode_jpeg(w, h, p, channels=1) for p in planes], planes


class TestMp4Real:
    def test_round_trip_block_constant_exact(self):
        frames, planes = _mjpeg_frames()
        mp4 = encode_mp4(16, 8, frames, timescale=1000, frame_duration=40)
        assert is_mp4(mp4[:12])
        w, h, tscale, codec, samples, ts = decode_mp4(mp4)
        assert (w, h, tscale, codec) == (16, 8, 1000, "jpeg")
        assert samples == frames  # byte-exact demux
        assert ts == [0, 40, 80, 120, 160]
        for f, plane in zip(samples, planes):
            ch, px = decode_mp4_frame(codec, f)
            assert ch == 1 and bytes(px) == plane

    def test_stsc_run_walk_odd_frame_count(self):
        # 5 frames at 2/chunk -> chunks of 2,2,1: the stsc table carries TWO
        # runs (first_chunk=1 per=2, first_chunk=3 per=1) and the walker must
        # switch runs mid-stream to land every sample on its true offset.
        frames, _ = _mjpeg_frames(nframes=5)
        mp4 = encode_mp4(16, 8, frames)
        _w, _h, _t, _c, samples, _ts = decode_mp4(mp4)
        assert samples == frames
        # even count -> single run, still exact
        frames4, _ = _mjpeg_frames(nframes=4)
        mp4 = encode_mp4(16, 8, frames4)
        assert decode_mp4(mp4)[4] == frames4

    def test_largesize_and_co64(self):
        # Hand-build a file whose mdat uses a 64-bit largesize header and
        # whose offsets live in co64 — the 14496-12 large-file variants that
        # a 100 TB corpus actually contains.
        from rust_dataframe_spark.operators import mp4 as m

        frames, planes = _mjpeg_frames(nframes=3)
        ref = encode_mp4(16, 8, frames)
        # split the reference file at its boxes
        boxes = list(m._iter_boxes(ref, 0, len(ref)))
        (ftyp_fc, fs, fe), (mdat_fc, ms, me), (moov_fc, os_, oe) = boxes
        assert (ftyp_fc, mdat_fc, moov_fc) == (b"ftyp", b"mdat", b"moov")
        ftyp = ref[: ms - 8]  # full ftyp box (ms is mdat payload start)
        mdat_payload = ref[ms:me]
        moov = ref[os_ - 8 : oe]
        # largesize mdat: size=1 marker + 16-byte header
        big_mdat = (
            struct.pack(">I", 1)
            + b"mdat"
            + struct.pack(">Q", 16 + len(mdat_payload))
            + mdat_payload
        )
        shift = 8  # extra header bytes vs the 8-byte original
        # rewrite stco -> co64 with shifted offsets, fixing ancestor sizes
        out = bytearray(ftyp + big_mdat + moov)
        stco_at = bytes(out).index(b"stco") - 4
        n = struct.unpack_from(">I", out, stco_at + 12)[0]
        offs = struct.unpack_from(f">{n}I", out, stco_at + 16)
        co64 = (
            struct.pack(">I", 16 + 8 * n)
            + b"co64"
            + b"\x00\x00\x00\x00"
            + struct.pack(">I", n)
            + b"".join(struct.pack(">Q", o + shift) for o in offs)
        )
        old_len = struct.unpack_from(">I", out, stco_at)[0]
        grow = len(co64) - old_len
        # every ancestor box whose span contains stco grows by `grow`
        moov_start = len(ftyp) + len(big_mdat)
        pos, end = moov_start, len(out)
        while pos < end:
            size = struct.unpack_from(">I", out, pos)[0]
            if pos <= stco_at < pos + size and out[pos + 4 : pos + 8] != b"stco":
                struct.pack_into(">I", out, pos, size + grow)
                if out[pos + 4 : pos + 8] in (
                    b"moov", b"trak", b"mdia", b"minf", b"stbl",
                ):
                    pos += 8
                    end = pos + size - 8
                    continue
            pos += size
        out[stco_at : stco_at + old_len] = co64
        w, h, tscale, codec, samples, ts = decode_mp4(bytes(out))
        assert (w, h, codec) == (16, 8, "jpeg")
        assert samples == frames
        assert ts == [0, 40, 80]

    def test_desync_sample_table_fails_loud(self):
        # declare one extra sample in stsz that no chunk provides
        frames, _ = _mjpeg_frames(nframes=4)
        mp4 = bytearray(encode_mp4(16, 8, frames))
        stsz_at = bytes(mp4).index(b"stsz") - 4
        struct.pack_into(">I", mp4, stsz_at + 16, 5)  # sample_count 4 -> 5
        with pytest.raises(Mp4Error, match="desynchronized|stts covers fewer"):
            decode_mp4(bytes(mp4))

    def test_sample_overrun_fails_loud(self):
        frames, _ = _mjpeg_frames(nframes=2)
        mp4 = bytearray(encode_mp4(16, 8, frames))
        stsz_at = bytes(mp4).index(b"stsz") - 4
        # inflate sample 0's size past EOF
        struct.pack_into(">I", mp4, stsz_at + 20, 1 << 24)
        with pytest.raises(Mp4Error, match="overruns"):
            decode_mp4(bytes(mp4))

    def test_h264_demuxes_but_pixel_decode_gates(self):
        # retag the sample entry as avc1: demux must still return sizes,
        # offsets and timestamps; only the pixel step refuses.
        frames, _ = _mjpeg_frames(nframes=3)
        mp4 = bytearray(encode_mp4(16, 8, frames))
        jpeg_at = bytes(mp4).index(b"stsd")
        entry_at = bytes(mp4).index(b"jpeg", jpeg_at)
        mp4[entry_at : entry_at + 4] = b"avc1"
        w, h, _t, codec, samples, _ts = decode_mp4(bytes(mp4))
        assert codec == "avc1" and (w, h) == (16, 8)
        assert [len(s) for s in samples] == [len(f) for f in frames]
        with pytest.raises(NotImplementedError, match="avc1"):
            decode_mp4_frame(codec, samples[0])

    def test_mjpb_headerless_gates(self):
        # QuickTime Motion-JPEG format B payloads carry no JPEG markers —
        # the documented NotImplementedError gate, not a confusing JpegError.
        with pytest.raises(NotImplementedError, match="mjpb"):
            decode_mp4_frame("mjpb", b"\x00" * 64)

    def test_not_mp4_fails_loud(self):
        with pytest.raises(Mp4Error, match="signature"):
            decode_mp4(b"RIFF\x00\x00\x00\x00AVI LIST")
        assert not is_mp4(b"RIFF\x00\x00\x00\x00AVI ")

    def test_no_video_track_fails_loud(self):
        frames, _ = _mjpeg_frames(nframes=2)
        mp4 = bytearray(encode_mp4(16, 8, frames))
        hdlr_at = bytes(mp4).index(b"vide")
        mp4[hdlr_at : hdlr_at + 4] = b"soun"
        with pytest.raises(Mp4Error, match="no video track"):
            decode_mp4(bytes(mp4))


class TestMp4SampleFrames:
    def test_sample_frames_mp4_dispatch(self, spark):
        import pandas as pd
        from pyspark.sql import Row

        from rust_dataframe_spark.operators import multimodal as mm

        frames, planes = _mjpeg_frames(w=16, h=8, nframes=6)
        mp4 = encode_mp4(16, 8, frames, timescale=1000, frame_duration=40)
        df = spark.createDataFrame([Row(doc_id=1, payload=bytearray(mp4))])
        out = mm.sample_frames(df, n_frames=3, fake_decode=False).collect()
        assert [(r.frame_idx, r.frame_ts_ms) for r in out] == [
            (0, 0), (1, 80), (2, 160),
        ]
        for r, src in zip(out, (0, 2, 4)):
            assert bytes(r.frame) == planes[src]
