"""Round-9 subtitle tests (operators/subtitles.py) behind q423."""

import pytest

from rust_dataframe_spark.operators.subtitles import (
    SubtitleError,
    parse_srt,
    parse_vtt,
    subtitle_cues,
)

SRT = """1
00:00:01,000 --> 00:00:02,500
Hello  world

2
00:00:03,000 --> 00:00:04,000
Line one
Line two
"""

VTT = """WEBVTT - synthetic

NOTE a comment
spanning lines

cue-1
00:01.000 --> 00:02.500 align:start
Hi there

01:00:03.000 --> 01:00:04.000
Second
"""


class TestSubtitles:
    def test_srt_parse(self):
        assert parse_srt(SRT) == [
            (0, 1000, 2500, "Hello world"),
            (1, 3000, 4000, "Line one\nLine two"),
        ]

    def test_vtt_parse_notes_ids_optional_hours(self):
        assert parse_vtt(VTT) == [
            (0, 1000, 2500, "Hi there"),
            (1, 3603000, 3604000, "Second"),
        ]

    def test_crlf_tolerated(self):
        assert parse_srt(SRT.replace("\n", "\r\n"))[0][3] == "Hello world"

    def test_srt_gates(self):
        with pytest.raises(SubtitleError, match="not increasing"):
            parse_srt(SRT.replace("\n2\n", "\n1\n"))
        with pytest.raises(SubtitleError, match="ends before"):
            parse_srt(SRT.replace("00:00:02,500", "00:00:00,500"))
        with pytest.raises(SubtitleError, match="timestamp"):
            parse_srt(SRT.replace("00:00:01,000", "00:00:61,000"))
        with pytest.raises(SubtitleError, match="number"):
            parse_srt("x\n00:00:01,000 --> 00:00:02,000\nhi")

    def test_vtt_gates(self):
        with pytest.raises(SubtitleError, match="WEBVTT"):
            parse_vtt(SRT)
        with pytest.raises(SubtitleError, match="timing"):
            parse_vtt("WEBVTT\n\njust text without arrow")

    def test_spark_explode_dispatch(self, spark):
        from pyspark.sql import Row

        df = spark.createDataFrame([
            Row(doc_id=1, payload=bytearray(SRT.encode())),
            Row(doc_id=2, payload=bytearray(VTT.encode())),
        ])
        out = subtitle_cues(df).orderBy("doc_id", "cue_idx").collect()
        assert [(r.doc_id, r.cue_idx, r.start_ms, r.n_words) for r in out] == [
            (1, 0, 1000, 2), (1, 1, 3000, 4),
            (2, 0, 1000, 2), (2, 1, 3603000, 1),
        ]
