"""Unit tests: linalg (gram/covariance), KM survival, nearest as-of,
file compaction."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row, functions as F

from rust_dataframe_spark.operators.linalg import covariance_matrix, gram_matrix
from rust_dataframe_spark.operators.stats import kaplan_meier
from rust_dataframe_spark.operators.temporal import asof_join


def test_gram_matrix_hand_computed(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0],), ([3.0, 4.0],)], "v array<double>"
    )
    g = {(r["i"], r["j"]): r["g"] for r in gram_matrix(df, "v").collect()}
    # X^T X for [[1,2],[3,4]] = [[10, 14], [14, 20]]
    assert g == {(0, 0): 10.0, (0, 1): 14.0, (1, 0): 14.0, (1, 1): 20.0}


def test_covariance_matches_numpy_style(spark):
    import random

    rng = random.Random(5)
    rows = [([rng.uniform(-1, 1) for _ in range(3)],) for _ in range(50)]
    df = spark.createDataFrame(rows, "v array<double>")
    got = {
        (r["i"], r["j"]): r["cov"]
        for r in covariance_matrix(df, "v").collect()
    }
    vecs = [r[0] for r in rows]
    n = len(vecs)
    means = [sum(v[k] for v in vecs) / n for k in range(3)]
    for i in range(3):
        for j in range(3):
            want = sum(v[i] * v[j] for v in vecs) / n - means[i] * means[j]
            assert got[(i, j)] == pytest.approx(want, rel=1e-9)
    # symmetry
    assert got[(0, 1)] == pytest.approx(got[(1, 0)], rel=1e-12)


def test_kaplan_meier_textbook_example(spark):
    # classic small example: durations/events
    # subjects: t=1 event, t=2 censored, t=3 event, t=4 event, t=5 censored
    rows = [
        Row(t=1, obs=True),
        Row(t=2, obs=False),
        Row(t=3, obs=True),
        Row(t=4, obs=True),
        Row(t=5, obs=False),
    ]
    out = {r["t"]: r for r in kaplan_meier(spark.createDataFrame(rows), "t", "obs").collect()}
    # t=1: n=5, d=1 -> S=4/5
    assert out[1]["n_at_risk"] == 5
    assert out[1]["survival"] == pytest.approx(0.8)
    # t=3: n=3 (t=1 event and t=2 censored are gone), d=1 -> S=0.8*2/3
    assert out[3]["n_at_risk"] == 3
    assert out[3]["survival"] == pytest.approx(0.8 * 2 / 3)
    # t=4: n=2, d=1 -> S=0.8*(2/3)*(1/2)
    assert out[4]["survival"] == pytest.approx(0.8 * (2 / 3) * 0.5)
    # censored-only times never appear
    assert 2 not in out and 5 not in out


def test_kaplan_meier_no_censoring_matches_ecdf(spark):
    rows = [Row(t=t, obs=True) for t in [1, 1, 2, 3, 3, 3, 4]]
    out = {r["t"]: r["survival"] for r in kaplan_meier(spark.createDataFrame(rows), "t", "obs").collect()}
    # with no censoring KM == empirical survival function
    assert out[1] == pytest.approx(5 / 7)
    assert out[2] == pytest.approx(4 / 7)
    assert out[3] == pytest.approx(1 / 7)
    assert out[4] == pytest.approx(0.0, abs=1e-12)


def test_asof_nearest_picks_closer_side(spark):
    left = spark.createDataFrame(
        [(1, 10.0), (1, 20.0)], "k long, ts double"
    )
    right = spark.createDataFrame(
        [(1, 8.0, "a"), (1, 11.0, "b"), (1, 25.0, "c")],
        "k long, ts double, tag string",
    )
    out = {
        r["ts"]: r["r_tag"]
        for r in asof_join(left, right, "k", "ts", direction="nearest").collect()
    }
    assert out[10.0] == "b"  # |10-11|=1 < |10-8|=2
    assert out[20.0] == "c"  # |20-25|=5 < |20-11|=9


def test_asof_nearest_tie_prefers_backward(spark):
    left = spark.createDataFrame([(1, 10.0)], "k long, ts double")
    right = spark.createDataFrame(
        [(1, 8.0, "back"), (1, 12.0, "fwd")], "k long, ts double, tag string"
    )
    out = asof_join(left, right, "k", "ts", direction="nearest").collect()[0]
    assert out["r_tag"] == "back"


def test_asof_nearest_one_sided(spark):
    # only forward matches exist -> still matched (backward would null)
    left = spark.createDataFrame([(1, 5.0)], "k long, ts double")
    right = spark.createDataFrame([(1, 9.0, "f")], "k long, ts double, tag string")
    out = asof_join(left, right, "k", "ts", direction="nearest").collect()[0]
    assert out["r_tag"] == "f"


def test_compact_files_roundtrip(spark, tmp_path):
    from rust_dataframe_spark.operators.layout import compact_files

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    df = spark.range(10_000).withColumn("v", F.rand(seed=1))
    df.repartition(25).write.parquet(src)
    audit = compact_files(spark, src, dst, target_files=3, sort_cols=["id"])
    assert audit["files_before"] == 25
    assert audit["files_after"] == 3
    assert audit["rows"] == 10_000
    # lossless: same id sum
    a = spark.read.parquet(src).agg(F.sum("id")).collect()[0][0]
    b = spark.read.parquet(dst).agg(F.sum("id")).collect()[0][0]
    assert a == b


# ---------------------------------------------------------------------------
# interval_overlap_join
# ---------------------------------------------------------------------------


def test_interval_overlap_matches_bruteforce(spark):
    import random

    from rust_dataframe_spark.operators.temporal import interval_overlap_join

    rng = random.Random(11)
    L = [(i, a, a + rng.uniform(0.5, 8)) for i, a in ((i, rng.uniform(0, 50)) for i in range(40))]
    R = [(j, a, a + rng.uniform(0.5, 8)) for j, a in ((j, rng.uniform(0, 50)) for j in range(40))]
    ldf = spark.createDataFrame(L, "lid long, lo double, hi double")
    rdf = spark.createDataFrame(R, "rid long, lo double, hi double")
    out = interval_overlap_join(ldf, "lo", "hi", rdf, "lo", "hi", bucket_width=4.0)
    got = sorted((r["lid"], r["rid"]) for r in out.collect())
    want = sorted(
        (l[0], r[0]) for l in L for r in R if l[1] <= r[2] and r[1] <= l[2]
    )
    assert got == want and len(want) > 0


def test_interval_overlap_emits_pair_once_across_buckets(spark):
    from rust_dataframe_spark.operators.temporal import interval_overlap_join

    # both intervals span many buckets; overlap covers several shared buckets
    ldf = spark.createDataFrame([(1, 0.0, 100.0)], "lid long, lo double, hi double")
    rdf = spark.createDataFrame([(2, 10.0, 90.0)], "rid long, lo double, hi double")
    out = interval_overlap_join(ldf, "lo", "hi", rdf, "lo", "hi", bucket_width=5.0)
    assert out.count() == 1


def test_interval_overlap_touching_endpoints_inclusive(spark):
    from rust_dataframe_spark.operators.temporal import interval_overlap_join

    ldf = spark.createDataFrame([(1, 0.0, 10.0)], "lid long, lo double, hi double")
    rdf = spark.createDataFrame(
        [(2, 10.0, 20.0), (3, 20.5, 30.0)], "rid long, lo double, hi double"
    )
    rows = interval_overlap_join(ldf, "lo", "hi", rdf, "lo", "hi", bucket_width=7.0).collect()
    assert [(r["lid"], r["rid"]) for r in rows] == [(1, 2)]


# ---------------------------------------------------------------------------
# bfs_levels
# ---------------------------------------------------------------------------


def test_bfs_levels_path_graph(spark):
    from rust_dataframe_spark.operators.graph import bfs_levels

    # path 1-2-3-4-5, seed 1
    e0 = [(1, 2), (2, 3), (3, 4), (4, 5)]
    edges = spark.createDataFrame(
        e0 + [(b, a) for a, b in e0], "src long, dst long"
    )
    out = {r["node"]: r["dist"] for r in bfs_levels(edges, seeds=[1], max_hops=3).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 is beyond max_hops


def test_bfs_levels_multi_source_min(spark):
    from rust_dataframe_spark.operators.graph import bfs_levels

    e0 = [(1, 2), (2, 3), (3, 4), (4, 5)]
    edges = spark.createDataFrame(
        e0 + [(b, a) for a, b in e0], "src long, dst long"
    )
    out = {r["node"]: r["dist"] for r in bfs_levels(edges, seeds=[1, 5], max_hops=4).collect()}
    # node 3 is 2 hops from both ends; nodes 2 and 4 are 1 hop from a seed
    assert out == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}


def test_bfs_levels_seed_validation(spark):
    """ADVICE r3: empty seeds -> clear ValueError; the seed type comes from
    the edge schema (numpy ints coerce), not from seeds[0]."""
    import pytest as _pytest

    from rust_dataframe_spark.operators.graph import bfs_levels

    e0 = [(1, 2), (2, 3)]
    edges = spark.createDataFrame(
        e0 + [(b, a) for a, b in e0], "src long, dst long"
    )
    with _pytest.raises(ValueError, match="non-empty"):
        bfs_levels(edges, seeds=[], max_hops=2)
    with _pytest.raises(ValueError, match="coerce"):
        bfs_levels(edges, seeds=["one"], max_hops=2)
    import numpy as np

    out = {
        r["node"]: r["dist"]
        for r in bfs_levels(edges, seeds=[np.int64(1)], max_hops=2).collect()
    }
    assert out == {1: 0, 2: 1, 3: 2}


def test_bfs_levels_cycle_terminates(spark):
    from rust_dataframe_spark.operators.graph import bfs_levels

    e0 = [(1, 2), (2, 3), (3, 1)]
    edges = spark.createDataFrame(
        e0 + [(b, a) for a, b in e0], "src long, dst long"
    )
    out = {r["node"]: r["dist"] for r in bfs_levels(edges, seeds=[1], max_hops=5).collect()}
    assert out == {1: 0, 2: 1, 3: 1}


# ---------------------------------------------------------------------------
# retract_agg_state
# ---------------------------------------------------------------------------


def test_retract_exact_for_invertible_measures(spark):
    from rust_dataframe_spark.operators.merge import agg_state, retract_agg_state

    rows = [("a", float(v)) for v in range(10)] + [("b", 100.0), ("b", 200.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    full = agg_state(df, ["k"], "v")
    dels = agg_state(
        spark.createDataFrame([("a", 0.0), ("a", 9.0)], "k string, v double"),
        ["k"],
        "v",
    )
    out = {r["k"]: r for r in retract_agg_state(full, dels, ["k"]).collect()}
    assert out["a"]["n"] == 8 and out["a"]["s"] == sum(range(1, 9))
    # deleted batch contained both extrema -> stale
    assert out["a"]["extrema_stale"] and out["a"]["mn"] is None
    # untouched key passes through intact
    assert out["b"]["n"] == 2 and not out["b"]["extrema_stale"]
    assert out["b"]["mn"] == 100.0 and out["b"]["mx"] == 200.0


def test_retract_interior_delete_keeps_extrema(spark):
    from rust_dataframe_spark.operators.merge import agg_state, retract_agg_state

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 5.0), ("a", 9.0)], "k string, v double"
    )
    full = agg_state(df, ["k"], "v")
    dels = agg_state(
        spark.createDataFrame([("a", 5.0)], "k string, v double"), ["k"], "v"
    )
    out = retract_agg_state(full, dels, ["k"]).collect()[0]
    assert out["n"] == 2 and not out["extrema_stale"]
    assert out["mn"] == 1.0 and out["mx"] == 9.0


def test_retract_staleness_is_sticky(spark):
    """ADVICE r3: once a key's extrema are nulled, a later retraction must
    keep extrema_stale=true — the comparison against null mn/mx may not
    silently reset it."""
    from rust_dataframe_spark.operators.merge import agg_state, retract_agg_state

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(10)], "k string, v double"
    )
    full = agg_state(df, ["k"], "v")
    d1 = agg_state(
        spark.createDataFrame([("a", 0.0), ("a", 9.0)], "k string, v double"),
        ["k"], "v",
    )
    s1 = retract_agg_state(full, d1, ["k"])
    assert s1.collect()[0]["extrema_stale"]
    d2 = agg_state(
        spark.createDataFrame([("a", 5.0)], "k string, v double"), ["k"], "v"
    )
    out = retract_agg_state(s1, d2, ["k"]).collect()[0]
    assert out["n"] == 7
    assert out["extrema_stale"] is True
    assert out["mn"] is None and out["mx"] is None


def test_retract_surfaces_unmatched_delete_keys(spark):
    """ADVICE r3: deletes for keys absent from state are a CDC-feed bug —
    with unmatched_col set they surface as flagged rows instead of being
    silently dropped by the left join."""
    from rust_dataframe_spark.operators.merge import agg_state, retract_agg_state

    full = agg_state(
        spark.createDataFrame([("a", 1.0), ("a", 2.0)], "k string, v double"),
        ["k"], "v",
    )
    dels = agg_state(
        spark.createDataFrame([("ghost", 7.0)], "k string, v double"), ["k"], "v"
    )
    # default: silently no-op on state (back-compat)
    out = {r["k"]: r for r in retract_agg_state(full, dels, ["k"]).collect()}
    assert set(out) == {"a"} and out["a"]["n"] == 2
    # opt-in audit: the ghost key appears flagged with negated count
    audited = {
        r["k"]: r
        for r in retract_agg_state(
            full, dels, ["k"], unmatched_col="unmatched_delete"
        ).collect()
    }
    assert set(audited) == {"a", "ghost"}
    assert audited["a"]["unmatched_delete"] is False
    assert audited["ghost"]["unmatched_delete"] is True
    assert audited["ghost"]["n"] == -1


def test_retract_emptied_key_drops(spark):
    from rust_dataframe_spark.operators.merge import agg_state, retract_agg_state

    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    full = agg_state(df, ["k"], "v")
    out = retract_agg_state(full, full, ["k"]).collect()
    assert out == []


def test_power_iteration_known_matrix(spark):
    from rust_dataframe_spark.operators.linalg import power_iteration

    # diag(2, 1): from the all-ones start, after k rounds x = (2^k, 1)/norm
    cov = spark.createDataFrame(
        [(0, 0, 2.0), (0, 1, 0.0), (1, 0, 0.0), (1, 1, 1.0)], ["i", "j", "cov"]
    )
    x = {r["i"]: r["x"] for r in power_iteration(cov, iters=5).collect()}
    import math

    nrm = math.hypot(32.0, 1.0)
    assert abs(x[0] - 32.0 / nrm) < 1e-12
    assert abs(x[1] - 1.0 / nrm) < 1e-12


def test_power_iteration_matches_numpy_top_eigvec(spark):
    import numpy as np

    from rust_dataframe_spark.operators.linalg import power_iteration

    rng = np.random.default_rng(3)
    a = rng.normal(size=(6, 6))
    c = a @ a.T  # PSD with a clear top eigenvalue almost surely
    rows = [(i, j, float(c[i, j])) for i in range(6) for j in range(6)]
    cov = spark.createDataFrame(rows, ["i", "j", "cov"])
    x = np.array(
        [r["x"] for r in power_iteration(cov, iters=40).orderBy("i").collect()]
    )
    w, v = np.linalg.eigh(c)
    top = v[:, -1]
    if np.dot(top, x) < 0:
        top = -top
    assert np.allclose(x, top, atol=1e-6)

    with __import__("pytest").raises(ValueError):
        power_iteration(cov, iters=0)
