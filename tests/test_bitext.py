"""Round-9 Gale-Church tests (operators/bitext.py) behind q437."""

import pytest

from rust_dataframe_spark.operators.bitext import (
    BitextError,
    align_pairs,
    gale_church_align,
)


class TestGaleChurch:
    def test_pure_1_1(self):
        src = [30, 40, 50, 35]
        assert gale_church_align(src, src) == [
            (i, 1, i, 1) for i in range(4)
        ]

    def test_planted_2_1_and_1_2(self):
        src = [30, 40, 50, 35, 45]
        tgt = [30, 90, 35, 45]
        assert gale_church_align(src, tgt) == [
            (0, 1, 0, 1), (1, 2, 1, 1), (3, 1, 2, 1), (4, 1, 3, 1),
        ]
        assert gale_church_align([30, 90, 35], [30, 40, 50, 35]) == [
            (0, 1, 0, 1), (1, 1, 1, 2), (2, 1, 3, 1),
        ]

    def test_coverage_partition_invariant(self):
        # merge-vs-delete on an awkward input: whatever wins, the output
        # must partition both sequences exactly
        out = gale_church_align([30, 200, 50], [30, 50])
        assert sum(a[1] for a in out) == 3
        assert sum(a[3] for a in out) == 2
        pos_s = pos_t = 0
        for ss, sc, ts, tc in out:
            assert (ss, ts) == (pos_s, pos_t)
            pos_s += sc
            pos_t += tc

    def test_proportional_scaling_tolerated(self):
        # target systematically ~8% longer: still 1-1 (the delta model's
        # entire point — absolute length drift is absorbed)
        src = [100, 120, 80, 150]
        tgt = [108, 130, 86, 162]
        assert gale_church_align(src, tgt) == [
            (i, 1, i, 1) for i in range(4)
        ]

    def test_guards(self):
        with pytest.raises(BitextError, match="empty"):
            gale_church_align([], [1])
        with pytest.raises(BitextError, match="negative"):
            gale_church_align([1, -2], [1])
        with pytest.raises(BitextError, match="max_cells"):
            gale_church_align([1] * 3000, [1] * 3000)
        # guard is a knob, not a wall
        out = gale_church_align([10] * 80, [10] * 80, max_cells=10_000)
        assert len(out) == 80

    def test_spark_explode(self, spark):
        from pyspark.sql import Row

        df = spark.createDataFrame([
            Row(doc_id=1, src_lens=[30, 40, 50], tgt_lens=[30, 90]),
        ])
        out = align_pairs(df).orderBy("align_idx").collect()
        assert [(r.src_count, r.tgt_count) for r in out] == [(1, 1), (2, 1)]
        assert out[1].src_len == 90 and out[1].tgt_len == 90
