"""Portable RoaringBitmap codec tests (operators/roaring.py) behind
q459's Delta deletion vectors."""

import random

import pytest

from rust_dataframe_spark.operators.roaring import (
    RoaringError,
    roaring32_decode,
    roaring32_encode,
    roaring64_decode,
    roaring64_encode,
)


class TestRoaring32:
    def test_container_type_matrix(self):
        rng = random.Random(1)
        cases = [
            [0],
            [5, 7, 9],                                 # array
            list(range(100, 200)),                     # run
            sorted(rng.sample(range(65536), 5000)),    # bitmap
            sorted(rng.sample(range(70000), 5000)),    # multi-key mix
            [0, 65535, 65536, 1 << 20, (1 << 32) - 1],
        ]
        for vs in cases:
            enc = roaring32_encode(vs)
            dec, used = roaring32_decode(enc)
            assert dec == sorted(set(vs))
            assert used == len(enc)

    def test_run_cookie_shape(self):
        enc = roaring32_encode(list(range(50)))
        # runs cookie = 12347 in the low 16 bits
        assert int.from_bytes(enc[:2], "little") == 12347

    def test_norun_cookie_shape(self):
        enc = roaring32_encode([1, 5, 9])
        # a 3-element array beats a 1-run container? no: the run
        # encoding of {1,5,9} needs 3 runs (14 bytes) vs array 6 bytes
        assert int.from_bytes(enc[:4], "little") == 12346

    def test_bad_cookie_loud(self):
        with pytest.raises(RoaringError, match="cookie"):
            roaring32_decode(b"\x99\x99\x00\x00")

    def test_truncation_loud(self):
        enc = roaring32_encode(list(range(1000)))
        for frac in (0.2, 0.6, 0.9):
            with pytest.raises(RoaringError):
                roaring32_decode(enc[: int(len(enc) * frac)])


class TestRoaring64:
    def test_bucketed_round_trip(self):
        vs = [3, 1 << 33, (1 << 33) + 1, (5 << 32) | 123456, 1 << 40]
        assert roaring64_decode(roaring64_encode(vs)) == sorted(vs)

    def test_large_round_trip(self):
        rng = random.Random(2)
        vs = sorted(rng.sample(range(1 << 21), 20000))
        assert roaring64_decode(roaring64_encode(vs)) == vs

    def test_magic_gate(self):
        with pytest.raises(RoaringError, match="magic"):
            roaring64_decode(b"\x00" * 20)
