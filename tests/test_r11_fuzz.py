"""Round-11 fuzz sweep over the two new byte-level decoders:
zstd DICTIONARY frames (RFC 8878 §5) and Matroska laced blocks.

Contract (the repo's fail-loud fuzz discipline): any mutation either
raises the decoder's TYPED error or decodes to the EXACT original
bytes (a flip in an unreferenced dictionary region is legitimately
harmless) — never an undocumented exception type, never a silent
wrong decode, and never unbounded amplification (every call is
wall-clock bounded)."""

import random
import time

import pytest

from rust_dataframe_spark.operators.mkv import (
    MkvError,
    decode_mkv,
    encode_mkv,
)
from rust_dataframe_spark.operators.zstd import (
    ZstdError,
    build_zstd_dictionary,
    parse_zstd_dictionary,
    zstd_compress,
    zstd_decompress,
)

_BUDGET_S = 5.0  # per decode call; corrupt streams must not crawl


def _bounded(fn, *a):
    t0 = time.time()
    out = fn(*a)
    took = time.time() - t0
    assert took < _BUDGET_S, f"decode took {took:.1f}s (amplification?)"
    return out


def _zstd_fixture():
    boiler = (b"GET /index HTTP/1.1\r\nHost: corpus\r\n"
              b"Accept: text/plain\r\n\r\n") * 5
    d = build_zstd_dictionary(boiler, dict_id=321)
    doc = boiler + b"unique body 0123456789 " * 4 + boiler[:37]
    z = zstd_compress(doc, dictionary=d, treeless_literals=True)
    return d, doc, z


class TestZstdDictionaryFuzz:
    def test_frame_flips(self):
        d, doc, z = _zstd_fixture()
        rng = random.Random(111)
        for _ in range(300):
            i = rng.randrange(len(z))
            mut = z[:i] + bytes([z[i] ^ (1 << rng.randrange(8))]) + z[i + 1:]
            try:
                out = _bounded(
                    lambda b: zstd_decompress(b, dictionary=d), mut
                )
            except ZstdError:
                continue
            except Exception as e:  # noqa: BLE001
                pytest.fail(
                    f"frame flip@{i}: undocumented "
                    f"{type(e).__name__}: {e}"
                )
            assert out == doc, f"frame flip@{i}: silent WRONG decode"

    def test_dictionary_flips(self):
        d, doc, z = _zstd_fixture()
        rng = random.Random(222)
        for _ in range(300):
            i = rng.randrange(len(d))
            mut = d[:i] + bytes([d[i] ^ (1 << rng.randrange(8))]) + d[i + 1:]
            try:
                out = _bounded(
                    lambda b: zstd_decompress(z, dictionary=b), mut
                )
            except ZstdError:
                continue
            except Exception as e:  # noqa: BLE001
                pytest.fail(
                    f"dict flip@{i}: undocumented "
                    f"{type(e).__name__}: {e}"
                )
            assert out == doc, f"dict flip@{i}: silent WRONG decode"

    def test_dictionary_truncations(self):
        d, doc, z = _zstd_fixture()
        for frac in (0.1, 0.3, 0.6, 0.9, 0.99):
            cut = d[: int(len(d) * frac)]
            try:
                out = _bounded(
                    lambda b: zstd_decompress(z, dictionary=b), cut
                )
            except ZstdError:
                continue
            except Exception as e:  # noqa: BLE001
                pytest.fail(
                    f"dict cut@{frac}: undocumented "
                    f"{type(e).__name__}: {e}"
                )
            assert out == doc

    def test_frame_truncations(self):
        d, doc, z = _zstd_fixture()
        for frac in (0.2, 0.5, 0.85, 0.98):
            cut = z[: int(len(z) * frac)]
            with pytest.raises(ZstdError):
                _bounded(lambda b: zstd_decompress(b, dictionary=d), cut)

    def test_junk_dictionary_is_raw_content(self):
        # bytes without the magic are a RAW-CONTENT dict by spec —
        # parsing must never crash on junk
        rng = random.Random(333)
        for n in (0, 1, 7, 100):
            junk = bytes(rng.randrange(256) for _ in range(n))
            info = parse_zstd_dictionary(junk)
            assert info["id"] is None and info["content"] == junk

    def test_structured_junk_after_magic_loud(self):
        import struct

        rng = random.Random(444)
        for _ in range(60):
            junk = struct.pack("<II", 0xEC30A437, 55) + bytes(
                rng.randrange(256)
                for _ in range(rng.randrange(4, 120))
            )
            try:
                parse_zstd_dictionary(junk)
            except ZstdError:
                continue
            except Exception as e:  # noqa: BLE001
                pytest.fail(
                    f"dict junk: undocumented {type(e).__name__}: {e}"
                )
            # a random tail that happens to parse is acceptable only
            # if it is structurally complete — nothing to assert


def _mkv_fixture(lacing):
    frames = [
        bytes([(7 * i + k) % 256 for k in range(20 + (i * 53) % 400)])
        for i in range(6)
    ]
    return frames, encode_mkv(8, 8, frames, lacing=lacing)


class TestMkvLacingFuzz:
    @pytest.mark.parametrize("lacing", ["xiph", "ebml"])
    def test_flips_typed_or_demux(self, lacing):
        frames, blob = _mkv_fixture(lacing)
        rng = random.Random(555)
        for _ in range(250):
            i = rng.randrange(len(blob))
            mut = (blob[:i]
                   + bytes([blob[i] ^ (1 << rng.randrange(8))])
                   + blob[i + 1:])
            try:
                _w, _h, _c, out, _ts = _bounded(decode_mkv, mut)
            except MkvError:
                continue
            except Exception as e:  # noqa: BLE001
                pytest.fail(
                    f"{lacing} flip@{i}: undocumented "
                    f"{type(e).__name__}: {e}"
                )
            # demux success with corrupted payload bytes is fine (the
            # container does not checksum payloads) — but the frame
            # COUNT must never silently explode
            assert len(out) <= len(frames) + 8

    @pytest.mark.parametrize("lacing", ["xiph", "ebml", "fixed"])
    def test_truncations_typed(self, lacing):
        if lacing == "fixed":
            eq = [b"abcdef"] * 6
            blob = encode_mkv(8, 8, eq, lacing="fixed", lace_group=6)
        else:
            _frames, blob = _mkv_fixture(lacing)
        for frac in (0.3, 0.6, 0.9):
            cut = blob[: int(len(blob) * frac)]
            try:
                _bounded(decode_mkv, cut)
            except MkvError:
                continue
            except Exception as e:  # noqa: BLE001
                pytest.fail(
                    f"{lacing} cut@{frac}: undocumented "
                    f"{type(e).__name__}: {e}"
                )
