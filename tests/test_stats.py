"""Unit tests: statistical tests, spatial grid join, Bloom semi-join."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row, functions as F

from rust_dataframe_spark.operators.bloom import (
    bloom_bits,
    bloom_probe,
    semi_join_compare,
)
from rust_dataframe_spark.operators.spatial import grid_neighbor_pairs
from rust_dataframe_spark.operators.stats import (
    chi2_independence,
    ks_2sample,
    mad_outliers,
    psi,
)


# ---------------------------------------------------------------------------
# ks_2sample
# ---------------------------------------------------------------------------


def test_ks_identical_samples_is_zero(spark):
    df = spark.createDataFrame(
        [Row(v=float((i // 2) % 10), a=(i % 2 == 0)) for i in range(100)]
    )
    out = ks_2sample(df, "v", F.col("a"), lo=0.0, hi=10.0, nbins=100).collect()[0]
    assert out["ks_stat"] == 0.0
    assert out["n_a"] == 50 and out["n_b"] == 50


def test_ks_disjoint_samples_is_one(spark):
    rows = [Row(v=float(i), a=True) for i in range(50)] + [
        Row(v=100.0 + i, a=False) for i in range(50)
    ]
    out = ks_2sample(
        spark.createDataFrame(rows), "v", F.col("a"), lo=0.0, hi=200.0, nbins=200
    ).collect()[0]
    assert out["ks_stat"] == pytest.approx(1.0)


def test_ks_shifted_uniform_matches_analytic(spark):
    # U[0,1) vs U[0.5,1.5) on fine bins: D = 0.5 exactly.
    rows = [Row(v=i / 1000.0, a=True) for i in range(1000)] + [
        Row(v=0.5 + i / 1000.0, a=False) for i in range(1000)
    ]
    out = ks_2sample(
        spark.createDataFrame(rows), "v", F.col("a"), lo=0.0, hi=2.0, nbins=2000
    ).collect()[0]
    # discrete samples of 1000 points give D = 0.501 (one extra point of a
    # below b's support min); the continuous limit is 0.5
    assert out["ks_stat"] == pytest.approx(0.5, abs=2e-3)


def test_ks_out_of_range_values_clamp_to_edge_bins(spark):
    rows = [Row(v=-5.0, a=True), Row(v=99.0, a=False), Row(v=0.5, a=True), Row(v=0.5, a=False)]
    out = ks_2sample(
        spark.createDataFrame(rows), "v", F.col("a"), lo=0.0, hi=1.0, nbins=10
    ).collect()[0]
    # below-range mass sits in bin 0 (sample a leads), above-range in the top
    assert 0.0 < out["ks_stat"] <= 1.0


# ---------------------------------------------------------------------------
# chi2_independence
# ---------------------------------------------------------------------------


def test_chi2_independent_uniform_is_zero(spark):
    # perfectly balanced table -> observed == expected -> chi2 = 0
    rows = [Row(r=f"r{i}", c=j) for i in range(3) for j in range(4) for _ in range(5)]
    out = chi2_independence(spark.createDataFrame(rows), "r", "c").collect()[0]
    assert out["chi2"] == pytest.approx(0.0, abs=1e-12)
    assert out["dof"] == 6
    assert out["cramers_v"] == pytest.approx(0.0, abs=1e-9)
    assert out["n"] == 60


def test_chi2_perfect_association(spark):
    # 2x2 diagonal: chi2 = n, Cramér's V = 1
    rows = [Row(r="a", c=0)] * 10 + [Row(r="b", c=1)] * 10
    out = chi2_independence(spark.createDataFrame(rows), "r", "c").collect()[0]
    assert out["chi2"] == pytest.approx(20.0)
    assert out["cramers_v"] == pytest.approx(1.0)
    assert out["dof"] == 1


def test_chi2_matches_scipy_formula_by_hand(spark):
    # hand-computed 2x2: [[10, 20], [30, 40]]
    rows = (
        [Row(r="x", c="p")] * 10
        + [Row(r="x", c="q")] * 20
        + [Row(r="y", c="p")] * 30
        + [Row(r="y", c="q")] * 40
    )
    out = chi2_independence(spark.createDataFrame(rows), "r", "c").collect()[0]
    n, rx, ry, cp, cq = 100, 30, 70, 40, 60
    expected = sum(
        (o - rn * cn / n) ** 2 / (rn * cn / n)
        for o, rn, cn in [(10, rx, cp), (20, rx, cq), (30, ry, cp), (40, ry, cq)]
    )
    assert out["chi2"] == pytest.approx(expected, rel=1e-12)


def test_chi2_null_category_kept(spark):
    """Round-6 ADVICE class regression (stats variant): a NULL-keyed
    observed cell must not be zeroed by a null-unsafe join back to the
    margin cross-product, and nr/nc must count the NULL level."""
    rows = (
        [Row(r="a", c="p")] * 10
        + [Row(r="a", c="q")] * 5
        + [Row(r=None, c="p")] * 8  # NULL row-category
        + [Row(r="b", c=None)] * 4  # NULL col-category
        + [Row(r="b", c="q")] * 3
    )
    out = chi2_independence(spark.createDataFrame(rows), "r", "c").collect()[0]
    assert out["n"] == 30
    # 3 row levels (a, b, NULL) x 3 col levels (p, q, NULL)
    assert out["dof"] == 4
    # hand replay with None as an ordinary level
    from collections import Counter

    data = [(x["r"], x["c"]) for x in rows]
    cells = Counter(data)
    rm = Counter(r for r, _ in data)
    cm = Counter(c for _, c in data)
    n = len(data)
    want = sum(
        (cells.get((r, c), 0) - rm[r] * cm[c] / n) ** 2 / (rm[r] * cm[c] / n)
        for r in rm
        for c in cm
    )
    assert out["chi2"] == pytest.approx(want, rel=1e-12)


# ---------------------------------------------------------------------------
# psi
# ---------------------------------------------------------------------------


def test_psi_identical_distributions_is_zero(spark):
    rows = [Row(v=float((i // 2) % 10), ref=(i % 2 == 0)) for i in range(200)]
    out = psi(
        spark.createDataFrame(rows), "v", F.col("ref"), lo=0.0, hi=10.0, nbins=10
    ).collect()[0]
    assert out["psi"] == pytest.approx(0.0, abs=1e-12)
    assert out["n_ref"] == 100 and out["n_cur"] == 100


def test_psi_shift_is_positive_and_symmetric(spark):
    rows = [Row(v=float(i % 5), ref=True) for i in range(100)] + [
        Row(v=5.0 + (i % 5), ref=False) for i in range(100)
    ]
    df = spark.createDataFrame(rows)
    out = psi(df, "v", F.col("ref"), lo=0.0, hi=10.0, nbins=10).collect()[0]
    assert out["psi"] > 1.0  # complete shift is a huge PSI
    flipped = psi(df, "v", ~F.col("ref"), lo=0.0, hi=10.0, nbins=10).collect()[0]
    assert flipped["psi"] == pytest.approx(out["psi"], rel=1e-9)  # symmetric by def


def test_psi_hand_computed_two_bins(spark):
    # ref: 80/20 over two bins; cur: 50/50 -> PSI = sum((q-p)·ln(q/p))
    rows = (
        [Row(v=0.5, ref=True)] * 80
        + [Row(v=1.5, ref=True)] * 20
        + [Row(v=0.5, ref=False)] * 50
        + [Row(v=1.5, ref=False)] * 50
    )
    out = psi(
        spark.createDataFrame(rows), "v", F.col("ref"), lo=0.0, hi=2.0, nbins=2
    ).collect()[0]
    expected = (0.5 - 0.8) * math.log(0.5 / 0.8) + (0.5 - 0.2) * math.log(0.5 / 0.2)
    assert out["psi"] == pytest.approx(expected, rel=1e-12)


# ---------------------------------------------------------------------------
# mad_outliers
# ---------------------------------------------------------------------------


def test_mad_flags_planted_outlier(spark):
    vals = [float(v) for v in [10, 11, 12, 13, 14, 15, 16, 1000]]
    df = spark.createDataFrame([Row(g="a", v=v) for v in vals])
    out = mad_outliers(df, "g", "v").collect()[0]
    assert out["med"] == pytest.approx(13.5)
    assert out["n"] == 8
    assert out["n_outliers"] == 1  # only the 1000
    assert out["max_absz"] > 100


def test_mad_constant_group_has_zero_mad(spark):
    df = spark.createDataFrame([Row(g="c", v=5.0)] * 10)
    out = mad_outliers(df, "g", "v").collect()[0]
    assert out["mad"] == 0.0
    assert out["mad_zero"] is True
    # constant group: every deviation 0, no spurious outliers, finite z
    assert out["n_outliers"] == 0
    assert out["max_absz"] == 0.0


def test_mad_zero_with_real_outlier_uses_meanad_fallback(spark):
    """ADVICE r3: >half the values equal the median => MAD==0; the naive
    division would NULL out the z-score and report 0 outliers even with an
    extreme point present. The meanAD fallback must still flag it."""
    vals = [5.0] * 9 + [1000.0]
    df = spark.createDataFrame([Row(g="z", v=v) for v in vals])
    out = mad_outliers(df, "g", "v").collect()[0]
    assert out["mad"] == 0.0
    assert out["mad_zero"] is True
    # meanAD = (0*9 + 995)/10 = 99.5; z(1000) = 995/(1.253314*99.5) ~ 7.98
    assert out["max_absz"] == pytest.approx(995.0 / (1.253314 * 99.5), rel=1e-6)
    assert out["n_outliers"] == 1


def test_mad_groups_are_independent(spark):
    rows = [Row(g="a", v=float(i)) for i in range(11)] + [
        Row(g="b", v=1000.0 + i) for i in range(11)
    ]
    out = {r["g"]: r for r in mad_outliers(spark.createDataFrame(rows), "g", "v").collect()}
    assert out["a"]["med"] == 5.0 and out["b"]["med"] == 1005.0
    assert out["a"]["mad"] == 3.0 and out["b"]["mad"] == 3.0


# ---------------------------------------------------------------------------
# grid_neighbor_pairs
# ---------------------------------------------------------------------------


def test_grid_pairs_match_bruteforce(spark):
    import itertools
    import random

    rng = random.Random(7)
    pts = [(i, rng.uniform(0, 10), rng.uniform(0, 10)) for i in range(120)]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    got = {
        (r["id_a"], r["id_b"])
        for r in grid_neighbor_pairs(df, "id", "x", "y", radius=0.8).collect()
    }
    want = {
        (a[0], b[0])
        for a, b in itertools.combinations(pts, 2)
        if math.dist(a[1:], b[1:]) < 0.8
    }
    assert got == want and len(want) > 0


def test_grid_pairs_cross_cell_boundary(spark):
    # two points straddling a cell edge, closer than r: must still pair
    df = spark.createDataFrame(
        [(1, 0.99, 0.5), (2, 1.01, 0.5), (3, 5.0, 5.0)],
        "id long, x double, y double",
    )
    rows = grid_neighbor_pairs(df, "id", "x", "y", radius=1.0).collect()
    assert [(r["id_a"], r["id_b"]) for r in rows] == [(1, 2)]
    assert rows[0]["dist"] == pytest.approx(0.02)


def test_grid_pairs_negative_coordinates(spark):
    df = spark.createDataFrame(
        [(1, -0.1, -0.1), (2, 0.1, 0.1)], "id long, x double, y double"
    )
    rows = grid_neighbor_pairs(df, "id", "x", "y", radius=0.5).collect()
    assert len(rows) == 1


# ---------------------------------------------------------------------------
# bloom
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives(spark):
    build = spark.createDataFrame([(k,) for k in range(0, 50, 5)], "key long")
    probe = spark.createDataFrame([(k,) for k in range(50)], "key long")
    bits = bloom_bits(build, "key", m=256, k=3)
    out = bloom_probe(probe, "key", bits, m=256, k=3).collect()
    members = {r["key"] for r in out if r["bloom_pass"]}
    assert set(range(0, 50, 5)) <= members  # every true member passes


def test_bloom_compare_counts_consistent(spark):
    build = spark.createDataFrame([(k,) for k in range(10)], "key long")
    probe = spark.createDataFrame([(k % 100,) for k in range(1000)], "key long")
    row = semi_join_compare(probe, "key", build, "key", m=512, k=3).collect()[0]
    assert row["n_probe"] == 1000
    assert row["n_true"] == 100  # keys 0..9 appear 10x each
    assert row["n_bloom_pass"] >= row["n_true"]
    assert row["n_false_pos"] == row["n_bloom_pass"] - row["n_true"]


def test_bloom_bitmap_bounded_by_m(spark):
    build = spark.createDataFrame([(k,) for k in range(10_000)], "key long")
    bits = bloom_bits(build, "key", m=64, k=3).collect()[0]["bits"]
    assert len(bits) <= 64
    assert bits == sorted(bits)


# --- isotonic calibration (q339) -------------------------------------------


def _pava(values, weights):
    """Classic stack-based pool-adjacent-violators, the textbook reference."""
    blocks = [[v * w, w] for v, w in zip(values, weights)]
    out = []
    for b in blocks:
        out.append(b)
        while len(out) > 1 and out[-2][0] / out[-2][1] >= out[-1][0] / out[-1][1]:
            s, w = out.pop()
            out[-1][0] += s
            out[-1][1] += w
    # expand back to per-input positions
    expanded = []
    i = 0
    for s, w in out:
        # w is the summed weight of pooled inputs; recover how many inputs
        # were pooled by walking the original weights
        acc = 0
        cnt = 0
        while acc < w - 1e-9:
            acc += weights[i + cnt]
            cnt += 1
        expanded.extend([s / w] * cnt)
        i += cnt
    return expanded


def test_isotonic_matches_stack_pava(spark):
    import random

    from rust_dataframe_spark.operators.stats import isotonic_calibrate

    rng = random.Random(5)
    for trial in range(3):
        # build per-bin (positives, count) then expand to row-level labels
        nb = 8
        counts = [rng.randint(1, 6) for _ in range(nb)]
        pos = [rng.randint(0, c) for c in counts]
        rows = []
        for b in range(nb):
            center = (b + 0.5) / nb
            for r in range(counts[b]):
                rows.append((center, 1 if r < pos[b] else 0))
        df = spark.createDataFrame(rows, "score double, y int")
        got = {
            r["bin"]: (r["n"], r["pos_rate"], r["iso_rate"])
            for r in isotonic_calibrate(df, "score", "y", nbins=nb).collect()
        }
        want = _pava([p / c for p, c in zip(pos, counts)], counts)
        for b in range(nb):
            assert got[b][0] == counts[b]
            assert got[b][1] == pos[b] / counts[b]
            assert abs(got[b][2] - want[b]) < 1e-12, (trial, b, got[b], want[b])
        # monotone non-decreasing
        iso = [got[b][2] for b in range(nb)]
        assert all(a <= b + 1e-15 for a, b in zip(iso, iso[1:]))


def test_isotonic_already_monotone_is_identity(spark):
    from rust_dataframe_spark.operators.stats import isotonic_calibrate

    rows = []
    for b, (c, p) in enumerate([(4, 0), (4, 1), (4, 2), (4, 4)]):
        for r in range(c):
            rows.append(((b + 0.5) / 4, 1 if r < p else 0))
    df = spark.createDataFrame(rows, "score double, y int")
    out = {r["bin"]: r for r in isotonic_calibrate(df, "score", "y", nbins=4).collect()}
    for b in range(4):
        assert out[b]["iso_rate"] == out[b]["pos_rate"]
