"""Round-12 ADVICE pins: the four round-11 advisor findings stay fixed.

1. high   — lakehouse_util.parse_conjuncts must bail (no pruning) on
            any OR/NOT-bearing predicate: the AND-split would invent
            false 'required' conjuncts and prune files the residual
            filter cannot restore.
2. medium — mkv._delace EBML lacing with frame count 1 (count byte 0,
            legal per RFC 9559) has a ZERO-entry size table; reading
            the first-size vint there consumed frame data.
3. low    — zstd raw-content dictionaries (id None, Dictionary_ID 0)
            now require the XXH64 content checksum like structured
            dictionaries: a wrong raw dictionary is the same
            silent-garbage hazard.
4. low    — hudi.read_hudi_incremental raises typed HudiError (never
            bare IndexError) on an empty timeline / no live slices.
"""

from __future__ import annotations

import pytest

from rust_dataframe_spark.sources.lakehouse_util import (
    parse_conjuncts,
    range_survives,
)


class TestParseConjunctsDisjunctionGuard:
    def test_or_between_conjuncts_bails(self):
        assert parse_conjuncts("x = 1 AND y = 2 OR z = 3") == []

    def test_plain_or_bails(self):
        assert parse_conjuncts("name = 'a' OR name = 'b'") == []

    def test_not_bails(self):
        assert parse_conjuncts("NOT x = 1") == []
        assert parse_conjuncts("x = 1 AND NOT y = 2") == []

    def test_or_inside_string_literal_bails_conservatively(self):
        # conservative: an OR token even inside a quoted literal
        # disables pruning (cheap, never wrong)
        assert parse_conjuncts("cat = 'black OR white'") == []

    def test_word_containing_or_does_not_bail(self):
        got = parse_conjuncts("region = 'north' AND sort_key > 3")
        assert got == [("region", "=", "north"), ("sort_key", ">", 3)]

    def test_quote_in_stripped_literal_drops_conjunct(self):
        # an embedded quote means the AND-split cut through a string
        got = parse_conjuncts("name = 'it''s' AND x > 3")
        assert got == [("x", ">", 3)]

    def test_pure_conjunction_still_parses(self):
        got = parse_conjuncts("a >= 10 AND b = 'x y' AND c < 2.5")
        assert got == [("a", ">=", 10), ("b", "=", "x y"), ("c", "<", 2.5)]

    def test_empty_result_means_no_pruning(self):
        # the contract callers rely on: [] conjuncts -> every file
        # survives (range_survives is never consulted)
        assert range_survives(0, 100, "=", 500) is False  # sanity
        assert parse_conjuncts("x = 1 OR y = 2") == []


class TestMkvSingleFrameEbmlLace:
    def test_ebml_lace_n1_returns_whole_remainder(self):
        from rust_dataframe_spark.operators.mkv import _delace

        # count byte 0 -> 1 frame -> zero size-table entries; the
        # 0x85 byte is FRAME DATA, not a size vint
        assert _delace(b"\x00\x85HELLO-WORLD", 0x06) == [
            b"\x85HELLO-WORLD"
        ]

    def test_ebml_lace_n1_roundtrip_via_encoder(self):
        from rust_dataframe_spark.operators.mkv import (
            decode_mkv,
            encode_mkv,
        )

        # full-path sanity: a single-frame EBML-laced block (the
        # last cluster of a 4-frame / lace_group=3 layout) survives
        # the demuxer byte-exact
        frames = [b"\x85frame-%d-payload" % i for i in range(4)]
        blob = encode_mkv(8, 6, frames, lacing="ebml", lace_group=3)
        w, h, codec, got, ts = decode_mkv(blob)
        assert got == frames

    def test_ebml_lace_n2_unchanged(self):
        from rust_dataframe_spark.operators.mkv import _delace

        assert _delace(b"\x01\x85HELLOWORLD", 0x06) == [
            b"HELLO",
            b"WORLD",
        ]

    def test_xiph_fixed_n1_unchanged(self):
        from rust_dataframe_spark.operators.mkv import _delace

        assert _delace(b"\x00HELLO", 0x02) == [b"HELLO"]
        assert _delace(b"\x00HELLO", 0x04) == [b"HELLO"]


class TestZstdRawContentDictChecksum:
    def test_unchecksummed_raw_dict_frame_refuses(self):
        from rust_dataframe_spark.operators.zstd import (
            ZstdError,
            zstd_compress,
            zstd_decompress,
        )

        boiler = (b"the quick brown fox jumps over the lazy dog " * 8)
        doc = boiler[:60] + b"unique tail 987"
        z = bytearray(zstd_compress(doc, dictionary=boiler))
        assert z[4] & 0x04, "compressor should emit the checksum flag"
        z[4] &= ~0x04  # strip checksum flag + trailing XXH64
        with pytest.raises(ZstdError, match="XXH64"):
            zstd_decompress(bytes(z[:-4]), dictionary=boiler)

    def test_checksummed_raw_dict_frame_still_decodes(self):
        from rust_dataframe_spark.operators.zstd import (
            zstd_compress,
            zstd_decompress,
        )

        boiler = (b"the quick brown fox jumps over the lazy dog " * 8)
        doc = boiler[:60] + b"unique tail 987"
        z = zstd_compress(doc, dictionary=boiler)
        assert zstd_decompress(z, dictionary=boiler) == doc


class TestHudiIncrementalTypedErrors:
    def test_empty_timeline_typed(self, monkeypatch):
        from rust_dataframe_spark.sources import hudi

        monkeypatch.setattr(hudi, "_timeline", lambda p, **k: [])
        monkeypatch.setattr(hudi, "_props", lambda p: {})
        with pytest.raises(hudi.HudiError, match="empty timeline"):
            hudi.read_hudi_incremental(None, "/nowhere", begin_ts=0)

    def test_no_live_slices_typed(self, monkeypatch):
        from rust_dataframe_spark.sources import hudi

        monkeypatch.setattr(
            hudi, "_timeline", lambda p, **k: [(100, "commit")]
        )
        monkeypatch.setattr(hudi, "_props", lambda p: {})
        monkeypatch.setattr(
            hudi, "hudi_snapshot_files", lambda p, **k: []
        )
        with pytest.raises(hudi.HudiError, match="no live file slices"):
            hudi.read_hudi_incremental(None, "/nowhere", begin_ts=0)
