"""Round-9 Matroska/WebM tests (operators/mkv.py) — EBML element walk,
cluster-relative timestamps, V_MJPEG pixels, lacing/codec/doctype gates
behind q419."""

import pytest

from rust_dataframe_spark.operators.mkv import (
    MkvError,
    decode_mkv,
    decode_mkv_frame,
    encode_mkv,
    is_mkv,
)


def _mjpeg_frames(w=16, h=8, nframes=5):
    from rust_dataframe_spark.operators.jpeg import encode_jpeg

    planes = [
        bytes((7 + 17 * (x // 8) + 31 * f) % 256 for y in range(h)
              for x in range(w))
        for f in range(nframes)
    ]
    return [encode_jpeg(w, h, p, channels=1) for p in planes], planes


class TestMkvReal:
    def test_round_trip_exact(self):
        frames, planes = _mjpeg_frames()
        mkv = encode_mkv(16, 8, frames, frame_ms=40)
        assert is_mkv(mkv[:4])
        w, h, codec, out, ts = decode_mkv(mkv)
        assert (w, h, codec) == (16, 8, "V_MJPEG")
        assert out == frames  # byte-exact demux
        # clusters of 2 with relative timestamps reassemble absolutely
        assert ts == [0, 40, 80, 120, 160]
        for f, p in zip(out, planes):
            ch, px = decode_mkv_frame(codec, f)
            assert ch == 1 and bytes(px) == p

    def test_odd_frame_count_last_cluster_single(self):
        frames, _ = _mjpeg_frames(nframes=3)
        mkv = encode_mkv(16, 8, frames, frame_ms=25)
        _w, _h, _c, out, ts = decode_mkv(mkv)
        assert out == frames and ts == [0, 25, 50]

    def test_codec_gate_demux_still_real(self):
        frames, _ = _mjpeg_frames(nframes=2)
        mkv = encode_mkv(16, 8, frames, codec="V_VP9")
        w, h, codec, out, ts = decode_mkv(mkv)
        assert codec == "V_VP9" and (w, h) == (16, 8)
        assert [len(f) for f in out] == [len(f) for f in frames]
        with pytest.raises(NotImplementedError, match="V_VP9"):
            decode_mkv_frame(codec, out[0])

    def test_lacing_round_trips(self):
        # round 11: Xiph / EBML / fixed lacing decode for real
        frames = [bytes([i]) * (10 + (37 * i) % 300) for i in range(7)]
        for lacing in ("xiph", "ebml"):
            mkv = encode_mkv(16, 8, frames, lacing=lacing)
            _w, _h, _c, out, ts = decode_mkv(mkv)
            assert out == frames, lacing
            # laced frames share their block's timestamp
            assert ts == [0, 0, 0, 120, 120, 120, 240]
        eq = [b"abcdef"] * 4
        mkv = encode_mkv(16, 8, eq, lacing="fixed", lace_group=4)
        assert decode_mkv(mkv)[3] == eq

    def test_xiph_255_run_sizes(self):
        frames = [b"x" * 600, b"y" * 255, b"z" * 3]
        mkv = encode_mkv(16, 8, frames, lacing="xiph")
        assert decode_mkv(mkv)[3] == frames

    def test_malformed_lacing_loud(self):
        from rust_dataframe_spark.operators.mkv import _delace

        with pytest.raises(MkvError, match="divide"):
            _delace(bytes([2]) + b"12345", 0x04)
        with pytest.raises(MkvError, match="truncated Xiph"):
            _delace(bytes([3, 255]), 0x02)
        with pytest.raises(MkvError, match="overruns"):
            _delace(bytes([1, 0x90]) + b"abc", 0x06)  # size 16 > 3

    def test_bad_doctype_fails_loud(self):
        frames, _ = _mjpeg_frames(nframes=1)
        mkv = bytearray(encode_mkv(16, 8, frames))
        at = bytes(mkv).index(b"matroska")
        mkv[at : at + 8] = b"webmxxxx"[:8].replace(b"xxxx", b"bad!")
        with pytest.raises(MkvError, match="DocType"):
            decode_mkv(bytes(mkv))

    def test_truncation_fails_loud(self):
        frames, _ = _mjpeg_frames(nframes=2)
        mkv = encode_mkv(16, 8, frames)
        with pytest.raises(MkvError, match="overruns|truncated"):
            decode_mkv(mkv[:-15])

    def test_not_mkv(self):
        with pytest.raises(MkvError, match="EBML"):
            decode_mkv(b"RIFF" + bytes(40))
        assert not is_mkv(b"OggS")

    def test_sample_frames_mkv_dispatch(self, spark):
        from pyspark.sql import Row

        from rust_dataframe_spark.operators import multimodal as mm

        frames, planes = _mjpeg_frames(nframes=6)
        mkv = encode_mkv(16, 8, frames, frame_ms=40)
        df = spark.createDataFrame([Row(doc_id=1, payload=bytearray(mkv))])
        out = mm.sample_frames(df, n_frames=3, fake_decode=False).collect()
        assert [(r.frame_idx, r.frame_ts_ms) for r in out] == [
            (0, 0), (1, 80), (2, 160),
        ]
        for r, src in zip(out, (0, 2, 4)):
            assert bytes(r.frame) == planes[src]
