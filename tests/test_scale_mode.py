"""Exact↔approx parity bounds for the scale.py auto-degrade paths
(VERDICT r3 next-round #3).

Each query that swaps its exact formulation for a sketch/binned form above
the row threshold gets a test here that runs BOTH modes on the fixture and
asserts the approximate answer within the stated error bound:

* percentiles: rank error ≤ n/accuracy (+1 for the sketch's
  no-interpolation convention) — the q266 certificate machinery;
* binned AUC: |Δ| ≤ the largest bin's probability mass.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from rust_dataframe_spark import catalog, scale

SF = "/root/testdata/sf0.001"


def _run(spark, name, mode, monkeypatch):
    monkeypatch.setenv(scale.MODE_ENV, mode)
    try:
        return catalog.QUERIES[name](spark, SF).collect()
    finally:
        monkeypatch.delenv(scale.MODE_ENV, raising=False)


def test_mode_switch_and_threshold(spark, monkeypatch):
    df = spark.range(10)
    monkeypatch.setenv(scale.MODE_ENV, "exact")
    assert scale.use_approx(df) is False
    monkeypatch.setenv(scale.MODE_ENV, "approx")
    assert scale.use_approx(df) is True
    monkeypatch.setenv(scale.MODE_ENV, "auto")
    monkeypatch.setenv(scale.THRESHOLD_ENV, "5")
    assert scale.use_approx(df) is True  # 10 rows > 5
    monkeypatch.setenv(scale.THRESHOLD_ENV, "50")
    assert scale.use_approx(df) is False
    monkeypatch.setenv(scale.MODE_ENV, "bogus")
    with pytest.raises(ValueError):
        scale.use_approx(df)


def test_auto_is_exact_at_correctness_gate_scale(spark, monkeypatch):
    """The driver's oracle gate runs at sf0.01 (60k lineitem rows) — the
    default 75k threshold must keep auto mode on the exact, hash-matched
    path there, while sf0.1 (600k) crosses it."""
    monkeypatch.delenv(scale.MODE_ENV, raising=False)
    monkeypatch.delenv(scale.THRESHOLD_ENV, raising=False)
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    assert scale.use_approx(li) is False
    assert scale.DEFAULT_EXACT_ROWS_MAX < 100_000  # sf0.1 events cross it


def test_q247_equidepth_parity(spark, monkeypatch):
    exact = {r["bucket"]: r for r in _run(spark, "q247_equidepth_hist", "exact", monkeypatch)}
    approx = {r["bucket"]: r for r in _run(spark, "q247_equidepth_hist", "approx", monkeypatch)}
    n_total = sum(r["n"] for r in exact.values())
    assert sum(r["n"] for r in approx.values()) == n_total  # no row lost
    # each approx cut is off by ≤ n/accuracy + 1 ranks; a bucket touches two
    # cuts, so its count deviates by ≤ 2·(n/accuracy + 1)
    bound = 2 * (n_total / scale.APPROX_ACCURACY + 1)
    for b, er in exact.items():
        assert abs(approx[b]["n"] - er["n"]) <= bound, (b, approx[b]["n"], er["n"])


def test_q240_mad_outliers_parity(spark, monkeypatch):
    exact = {r["l_returnflag"]: r for r in _run(spark, "q240_mad_outliers", "exact", monkeypatch)}
    approx = {r["l_returnflag"]: r for r in _run(spark, "q240_mad_outliers", "approx", monkeypatch)}
    assert set(exact) == set(approx)
    for g, er in exact.items():
        ar = approx[g]
        assert ar["n"] == er["n"]
        # with n < accuracy the sketch is rank-exact up to interpolation:
        # approx med/mad land within one order-statistic gap, which for the
        # smooth price distribution is well under 0.5% relative
        for col in ("med", "mad"):
            assert abs(ar[col] - er[col]) <= max(abs(er[col]) * 0.005, 1e-4), (g, col)
        # outlier counts shift by at most the points whose |z| straddles the
        # threshold under the slightly-moved scale — a thin shell
        assert abs(ar["n_outliers"] - er["n_outliers"]) <= max(5, er["n"] * 0.01)


def test_q288_auc_parity(spark, monkeypatch):
    (e,) = _run(spark, "q288_auc", "exact", monkeypatch)
    (a,) = _run(spark, "q288_auc", "approx", monkeypatch)
    assert (a["n_pos"], a["n_neg"]) == (e["n_pos"], e["n_neg"])
    # binned-ECDF error ≤ max bin mass; scores are near-uniform over 1000
    # bins, so 0.01 is a ~10× safety margin
    assert abs(a["auc"] - e["auc"]) <= 0.01


def test_q289_rolling_median_parity(spark, monkeypatch):
    exact = _run(spark, "q289_rolling_median", "exact", monkeypatch)
    approx = _run(spark, "q289_rolling_median", "approx", monkeypatch)
    assert len(exact) == len(approx)
    # the sketch returns a data value (no interpolation): on a ≤7-row frame
    # the deviation is at most half the frame's value spread
    from rust_dataframe_spark.catalog import load_events

    ev = load_events(spark, SF).filter(F.col("user_id") < 6)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-6, 0)
    spread = {
        (r["user_id"], r["event_id"]): r["half_spread"]
        for r in ev.select(
            "user_id",
            "event_id",
            ((F.max("value").over(w) - F.min("value").over(w)) / 2.0).alias(
                "half_spread"
            ),
        ).collect()
    }
    for er, ar in zip(exact, approx):
        key = (er["user_id"], er["event_id"])
        assert (ar["user_id"], ar["event_id"]) == key
        assert abs(ar["med7"] - er["med7"]) <= spread[key] + 1e-6, key


def test_q295_time_to_convert_parity(spark, monkeypatch):
    exact = {r["cohort"]: r for r in _run(spark, "q295_time_to_convert", "exact", monkeypatch)}
    approx = {r["cohort"]: r for r in _run(spark, "q295_time_to_convert", "approx", monkeypatch)}
    assert set(exact) == set(approx)
    # re-derive the per-cohort lag values; with n < accuracy the sketch is
    # rank-exact up to its no-interpolation convention, so each approx
    # quantile must equal one of the two order statistics straddling the
    # target rank (the exact value interpolates between them)
    from rust_dataframe_spark.catalog import load_events

    ev = load_events(spark, SF)
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_buy"))
    )
    lag_rows = (
        fv.join(fp, "user_id")
        .select(
            (F.col("user_id") % 2).alias("cohort"),
            (F.col("first_buy").cast("long") - F.col("first_view").cast("long")).alias("lag_s"),
        )
        .collect()
    )
    by_cohort: dict[int, list[float]] = {}
    for r in lag_rows:
        by_cohort.setdefault(r["cohort"], []).append(float(r["lag_s"]))
    for c, er in exact.items():
        ar = approx[c]
        vals = sorted(by_cohort[c])
        n = len(vals)
        assert ar["n_converted"] == er["n_converted"] == n
        for q, col in ((0.5, "median_lag_s"), (0.9, "p90_lag_s")):
            pos = q * (n - 1)
            lo, hi = vals[int(pos)], vals[min(int(pos) + 1, n - 1)]
            assert lo - 1e-4 <= ar[col] <= hi + 1e-4, (c, col, ar[col], lo, hi)
            assert lo - 1e-4 <= er[col] <= hi + 1e-4, (c, col, er[col], lo, hi)
