"""Unit tests for operators/hypothesis.py: chi-squared independence,
one-way ANOVA, Mann-Whitney rank-sum, and the deterministic permutation
test — each against a small fixture with a hand-replayable statistic.
"""

from __future__ import annotations

import math
import random


def test_chi2_independent_uniform_is_zero(spark):
    """A perfectly balanced 2x2 table has expected == observed: chi2 = 0."""
    from rust_dataframe_spark.operators.hypothesis import chi2_independence

    rows = [(a, b) for a in ("x", "y") for b in ("u", "v") for _ in range(5)]
    df = spark.createDataFrame(rows, "a0 string, b0 string")
    out = chi2_independence(df, "a0", "b0").collect()
    assert len(out) == 4
    for r in out:
        assert r["n"] == 5
        assert r["expected"] == 5.0
        assert r["contrib"] == 0.0
        assert r["chi2"] == 0.0
        assert r["dof"] == 1


def test_chi2_matches_textbook_formula(spark):
    from rust_dataframe_spark.operators.hypothesis import chi2_independence

    rng = random.Random(7)
    rows = []
    for _ in range(300):
        a = rng.choice(["x", "y", "z"])
        b = rng.choice(["u", "v"])
        rows.append((a, b))
    df = spark.createDataFrame(rows, "a0 string, b0 string")
    out = chi2_independence(df, "a0", "b0").collect()
    # hand replay
    from collections import Counter

    cells = Counter(rows)
    ra = Counter(a for a, _ in rows)
    cb = Counter(b for _, b in rows)
    n = len(rows)
    chi2 = 0.0
    for (a, b) in sorted(cells):
        e = ra[a] * cb[b] / n
        chi2 += (cells[(a, b)] - e) ** 2 / e
    want = math.floor(chi2 * 1e6) / 1e6
    assert all(r["chi2"] == want for r in out)
    assert all(r["dof"] == 2 for r in out)


def test_chi2_empty_cell_contributes_expected(spark):
    """A never-observed (a, b) combination must still appear in the dense
    grid with n=0 and contrib == expected — Pearson chi2 sums (0-E)^2/E = E
    over empty cells, so omitting them understates the statistic."""
    from rust_dataframe_spark.operators.hypothesis import chi2_independence

    # (x,u) x3, (x,v) x1, (y,u) x2 — (y,v) never observed
    rows = [("x", "u")] * 3 + [("x", "v")] + [("y", "u")] * 2
    df = spark.createDataFrame(rows, "a0 string, b0 string")
    out = {(r["a"], r["b"]): r for r in chi2_independence(df, "a0", "b0").collect()}
    assert set(out) == {("x", "u"), ("x", "v"), ("y", "u"), ("y", "v")}
    empty = out[("y", "v")]
    assert empty["n"] == 0
    e_yv = 2 * 1 / 6  # row_total(y)=2, col_total(v)=1, N=6
    assert empty["expected"] == math.floor(e_yv * 1e6) / 1e6
    assert empty["contrib"] == empty["expected"]  # (0-E)^2/E = E
    # full-grid replay
    ra = {"x": 4, "y": 2}
    cb = {"u": 5, "v": 1}
    chi2 = 0.0
    from collections import Counter

    cells = Counter(rows)
    for a in ("x", "y"):
        for b in ("u", "v"):
            e = ra[a] * cb[b] / 6
            chi2 += (cells.get((a, b), 0) - e) ** 2 / e
    want = math.floor(chi2 * 1e6) / 1e6
    assert all(r["chi2"] == want for r in out.values())


def test_chi2_null_category_is_a_real_level(spark):
    """Round-6 ADVICE regression: an observed cell with a NULL category
    must keep its count in N, the marginals, and the statistic (the old
    null-unsafe densification join dropped it, zeroing the cell while the
    grid row got expected=0 and contrib 0/0 -> table-wide chi2 NULL)."""
    from rust_dataframe_spark.operators.hypothesis import chi2_independence

    rows = (
        [("x", "u")] * 3
        + [("x", "v")] * 2
        + [(None, "u")] * 4  # NULL a-category, must not vanish
        + [("y", None)] * 2  # NULL b-category
        + [("y", "v")] * 1
    )
    df = spark.createDataFrame(rows, "a0 string, b0 string")
    out = {(r["a"], r["b"]): r for r in chi2_independence(df, "a0", "b0").collect()}
    # dense grid: 3 a-levels (x, y, NULL) x 3 b-levels (u, v, NULL)
    assert len(out) == 9
    assert out[(None, "u")]["n"] == 4
    assert out[("y", None)]["n"] == 2
    # N conserved: sum of grid n equals the input row count
    assert sum(r["n"] for r in out.values()) == len(rows)
    # dof counts the NULL levels: (3-1)*(3-1) = 4
    assert all(r["dof"] == 4 for r in out.values())
    # table-wide chi2 is defined (the old code propagated NULL here)
    assert all(r["chi2"] is not None for r in out.values())
    # hand replay over the 3x3 grid with None as an ordinary level
    from collections import Counter

    cells = Counter(rows)
    ra = Counter(a for a, _ in rows)
    cb = Counter(b for _, b in rows)
    n = len(rows)
    chi2 = 0.0
    for a in ("x", "y", None):
        for b in ("u", "v", None):
            e = ra[a] * cb[b] / n
            chi2 += (cells.get((a, b), 0) - e) ** 2 / e
    want = math.floor(chi2 * 1e6) / 1e6
    assert all(r["chi2"] == want for r in out.values())


def test_anova_equal_groups_f_zero(spark):
    """Identical group distributions with equal means: SSB = 0 so F = 0."""
    from rust_dataframe_spark.operators.hypothesis import anova_oneway

    rows = [(g, v) for g in ("a", "b") for v in (1.0, 2.0, 3.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["grp"]: r for r in anova_oneway(df, "g", "v").collect()}
    assert out["a"]["ss_between"] == 0.0
    assert out["a"]["f_stat"] == 0.0
    assert out["a"]["mean_value"] == 2.0
    assert out["a"]["df1"] == 1 and out["a"]["df2"] == 4


def test_anova_matches_scipy_style_replay(spark):
    from rust_dataframe_spark.operators.hypothesis import anova_oneway

    rng = random.Random(3)
    data = {
        "a": [round(rng.uniform(0, 10), 2) for _ in range(40)],
        "b": [round(rng.uniform(2, 12), 2) for _ in range(55)],
        "c": [round(rng.uniform(1, 9), 2) for _ in range(25)],
    }
    rows = [(g, v) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["grp"]: r for r in anova_oneway(df, "g", "v").collect()}
    # hand replay in cents
    cents = {g: [round(v * 100) for v in vs] for g, vs in data.items()}
    nt = sum(len(v) for v in cents.values())
    st = sum(sum(v) for v in cents.values())
    sst = sum(x * x for v in cents.values() for x in v)
    between_raw = sum(
        (float(sum(v)) * sum(v)) / len(v) for _, v in sorted(cents.items())
    )
    ssb = between_raw - float(st) * st / nt
    ssw = float(sst) - between_raw
    k = 3
    f = (ssb / (k - 1)) / (ssw / (nt - k))
    assert out["a"]["f_stat"] == math.floor(f * 1e6) / 1e6
    assert out["b"]["ss_within"] == math.floor(ssw / 1e4 * 1e6) / 1e6


def test_mann_whitney_identical_arms_balanced(spark):
    """Same values in both arms: U1 == U0 == n0*n1/2, z == 0."""
    from rust_dataframe_spark.operators.hypothesis import mann_whitney_u

    rows = [(arm, float(v)) for arm in (0, 1) for v in (1, 2, 3, 4)]
    df = spark.createDataFrame(rows, "u bigint, v double")
    r = mann_whitney_u(df, "u", "v").collect()[0]
    assert r["n0"] == 4 and r["n1"] == 4
    assert r["u1"] == 8.0 and r["u0"] == 8.0
    assert r["z_score"] == 0.0 or r["z_score"] == -0.0


def test_mann_whitney_u_invariant_and_replay(spark):
    from rust_dataframe_spark.operators.hypothesis import mann_whitney_u

    rng = random.Random(11)
    rows = [
        (rng.randint(0, 1), round(rng.uniform(0, 50), 2)) for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "u bigint, v double")
    r = mann_whitney_u(df, "u", "v").collect()[0]
    n0, n1 = r["n0"], r["n1"]
    assert r["u1"] + r["u0"] == n0 * n1
    # replay mid-ranks in pure python
    vals = sorted(round(v * 100) for _, v in rows)
    rank_of = {}
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        rank_of[vals[i]] = (i + 1 + j) / 2.0
        i = j
    r1 = sum(rank_of[round(v * 100)] for arm, v in rows if arm == 1)
    assert r["rank_sum_1"] == r1
    assert r["u1"] == r1 - n1 * (n1 + 1) / 2.0


def test_permutation_null_is_uniformish_and_exact_p(spark):
    """Under a true null (arm independent of value) the observed stat is
    typically mid-tail; the p-value is the exact (1+k)/(R+1) rational."""
    from rust_dataframe_spark.operators.hypothesis import permutation_test

    rng = random.Random(2)
    rows = [
        (i, rng.randint(0, 1), round(rng.uniform(0, 10), 2))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id bigint, u bigint, v double")
    r = permutation_test(df, "id", "u", "v", replicas=24).collect()[0]
    assert r["replicas"] == 24
    assert 0 <= r["n_as_extreme"] <= 24
    assert r["p_value"] == (1 + r["n_as_extreme"]) / 25
    assert r["n0"] + r["n1"] == 400


def test_permutation_detects_planted_shift(spark):
    """A large planted arm effect should beat every relabeled replica."""
    from rust_dataframe_spark.operators.hypothesis import permutation_test

    rng = random.Random(5)
    rows = []
    for i in range(300):
        arm = i % 2
        v = rng.uniform(0, 1) + (100.0 if arm else 0.0)
        rows.append((i, arm, round(v, 2)))
    df = spark.createDataFrame(rows, "id bigint, u bigint, v double")
    r = permutation_test(df, "id", "u", "v", replicas=24).collect()[0]
    assert r["n_as_extreme"] == 0
    assert r["p_value"] == 1 / 25
    assert r["obs_abs_diff"] > 90


def test_boosted_stumps_recovers_planted_splits(spark):
    """y determined by x1 threshold with x2 refining one side: round 1
    must split x1 near the planted threshold and SSE must not increase."""
    from rust_dataframe_spark.operators.boosting import boosted_stumps

    rows = []
    for i in range(400):
        x1 = (i % 100) / 100.0
        x2 = ((i * 7) % 100) / 100.0
        y = 1 if x1 >= 0.5 else (1 if x2 >= 0.75 and i % 3 == 0 else 0)
        rows.append((x1, x2, y))
    df = spark.createDataFrame(rows, "x1 double, x2 double, y bigint")
    out = {r["round"]: r for r in boosted_stumps(df, "x1", "x2", "y").collect()}
    assert out[1]["feature"] == "x1" and out[2]["feature"] == "x2"
    assert abs(out[1]["threshold"] - 0.5) < 0.1
    assert out[2]["sse_after"] <= out[1]["sse_after"] + 1e-9
    assert out[1]["n_left"] + out[1]["n_right"] == 400


def test_boosted_stumps_pure_split_zero_sse(spark):
    """Perfectly separable on x1: round 1 reaches SSE 0 and round 2's
    leaf corrections are 0."""
    from rust_dataframe_spark.operators.boosting import boosted_stumps

    rows = [(i / 100.0, (i * 3 % 100) / 100.0, 1 if i >= 50 else 0)
            for i in range(100)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y bigint")
    out = {r["round"]: r for r in boosted_stumps(df, "x1", "x2", "y").collect()}
    assert out[1]["sse_after"] == 0.0
    assert out[2]["sse_after"] == 0.0
    assert out[1]["left_value"] == 0.0 and out[1]["right_value"] == 1.0


def test_dbscan_two_blobs_and_noise(spark):
    """Two well-separated dense blobs plus far-away isolated points:
    blobs become two distinct clusters of cores, isolates are noise."""
    from rust_dataframe_spark.operators.spatial import dbscan

    rows = []
    # blob A around (0, 0), blob B around (10, 10), 12 points each on a
    # tight 0.01-spaced line; noise at (100, k)
    for i in range(12):
        rows.append((i, 0.0 + i * 0.01, 0.0))
        rows.append((100 + i, 10.0 + i * 0.01, 10.0))
    for k in range(3):
        rows.append((900 + k, 100.0 + 10.0 * k, 0.0))
    df = spark.createDataFrame(rows, "id bigint, x double, y double")
    out = {r["id"]: r for r in
           dbscan(df, "id", "x", "y", eps=0.05, min_pts=4).collect()}
    assert len(out) == 27
    a_cl = {out[i]["cluster_id"] for i in range(12)}
    b_cl = {out[100 + i]["cluster_id"] for i in range(12)}
    assert len(a_cl) == 1 and len(b_cl) == 1 and a_cl != b_cl
    assert a_cl == {0} and b_cl == {100}  # min-id labeling
    for k in range(3):
        assert out[900 + k]["role"] == "noise"
        assert out[900 + k]["cluster_id"] is None
    # interior points are core; the two line endpoints have only 3
    # strict-eps neighbors each at spacing 0.01/eps 0.05 -> still core
    assert out[5]["role"] == "core"


def test_dbscan_border_assignment_deterministic(spark):
    """A point within eps of cores from one cluster but too sparse to be
    core itself is labeled border with that cluster's id."""
    from rust_dataframe_spark.operators.spatial import dbscan

    rows = [(i, i * 0.01, 0.0) for i in range(6)]          # dense core line
    rows.append((50, 6 * 0.01 + 0.03, 0.0))               # hangs off the end
    df = spark.createDataFrame(rows, "id bigint, x double, y double")
    out = {r["id"]: r for r in
           dbscan(df, "id", "x", "y", eps=0.05, min_pts=4).collect()}
    assert out[50]["role"] == "border"
    assert out[50]["cluster_id"] == 0


def test_dbscan_candidate_budget_guard(spark):
    """Fail-loud density guard (round 7): a dense blob whose grid join
    would exceed max_candidate_pairs raises ValueError naming the
    density-rate discipline instead of running; raising the budget (or
    passing None) admits the same data and clusters it."""
    import pytest

    from rust_dataframe_spark.operators.spatial import dbscan

    # 40 distinct points inside one eps-cell -> ~40*40*9/2 ≈ 7200
    # candidate-pair estimate, far over a budget of 100
    rows = [(i, i * 1e-4, 0.0) for i in range(40)]
    df = spark.createDataFrame(rows, "id bigint, x double, y double")
    with pytest.raises(ValueError, match="density"):
        dbscan(df, "id", "x", "y", eps=0.05, min_pts=4,
               max_candidate_pairs=100)
    out = dbscan(df, "id", "x", "y", eps=0.05, min_pts=4,
                 max_candidate_pairs=None).collect()
    assert {r["cluster_id"] for r in out} == {0}
    # coincident duplicates add multiplicity but ZERO candidate pairs:
    # the same budget that rejects 40 distinct points accepts 4
    # distinct coordinates duplicated 10x each (est 4*4*9/2 = 72 < 100)
    dup = [(100 * j + i, i * 1e-4, 1.0) for i in range(4) for j in range(10)]
    ddf = spark.createDataFrame(dup, "id bigint, x double, y double")
    out2 = dbscan(ddf, "id", "x", "y", eps=0.05, min_pts=4,
                  max_candidate_pairs=100).collect()
    assert all(r["role"] == "core" for r in out2)


def test_wasserstein_identical_arms_zero(spark):
    from rust_dataframe_spark.operators.hypothesis import wasserstein_ks

    rows = [(arm, float(v)) for arm in (0, 1) for v in (1, 2, 3, 7)]
    df = spark.createDataFrame(rows, "u bigint, v double")
    r = wasserstein_ks(df, "u", "v").collect()[0]
    assert r["w1"] == 0.0 and r["ks_stat"] == 0.0


def test_wasserstein_known_shift(spark):
    """Arm 1 = arm 0 shifted by +2.0: W1 == 2.0 exactly, KS == 1 when
    supports are disjoint."""
    from rust_dataframe_spark.operators.hypothesis import wasserstein_ks

    rows = [(0, float(v)) for v in (1, 2, 3)] + [
        (1, float(v) + 10.0) for v in (1, 2, 3)
    ]
    df = spark.createDataFrame(rows, "u bigint, v double")
    r = wasserstein_ks(df, "u", "v").collect()[0]
    assert r["w1"] == 10.0
    assert r["ks_stat"] == 1.0
    # partial overlap: arm1 = arm0 + 1 on {1,2,3} -> W1 = 1
    rows2 = [(0, float(v)) for v in (1, 2, 3)] + [
        (1, float(v) + 1.0) for v in (1, 2, 3)
    ]
    r2 = wasserstein_ks(
        spark.createDataFrame(rows2, "u bigint, v double"), "u", "v"
    ).collect()[0]
    assert r2["w1"] == 1.0


def test_compaction_plan_next_fit_semantics(spark):
    """Sizes 900,900,900,300,100 at target 1000: size-desc order fills
    bins sequentially; every bin except possibly the last starts before
    the target boundary; totals are conserved."""
    from rust_dataframe_spark.operators.layout import compaction_plan

    rows = [("a", 900), ("b", 900), ("c", 900), ("d", 300), ("e", 100)]
    df = spark.createDataFrame(rows, "f string, sz bigint")
    out = {r["file"]: r["bin"] for r in
           compaction_plan(df, "f", "sz", target=1000).collect()}
    # prefix sums over a..e (desc, name-tie asc): 0,900,1800,2700,3000
    assert out == {"a": 0, "b": 0, "c": 1, "d": 2, "e": 3}


def test_compaction_plan_on_real_manifest(spark, tmp_path):
    """Feed the operator an actual build_manifest output: every file is
    assigned exactly one bin and sizes are conserved."""
    from rust_dataframe_spark.operators.layout import build_manifest, compaction_plan

    path = str(tmp_path / "frag")
    spark.range(0, 1000).repartition(10).write.mode("overwrite").parquet(path)
    man = build_manifest(spark, path, [])
    plan = compaction_plan(man, "file", "n_rows", target=250)
    rows = plan.collect()
    assert len(rows) == 10
    assert sum(r["size"] for r in rows) == 1000
    assert len({r["file"] for r in rows}) == 10
    per_bin = {}
    for r in rows:
        per_bin.setdefault(r["bin"], 0)
        per_bin[r["bin"]] += r["size"]
    # next-fit: every bin except the last reaches the target once its
    # straddling file lands (>= target - max single file is the weak bound;
    # here all bins except the final one must be >= 100)
    bins = sorted(per_bin)
    assert all(per_bin[b] >= 100 for b in bins[:-1])


def test_kruskal_wallis_identical_groups_h_zero(spark):
    """k identical group distributions: every group's mean rank equals the
    grand mean rank, so H = 0."""
    from rust_dataframe_spark.operators.hypothesis import kruskal_wallis

    rows = [(g, v) for g in ("a", "b", "c") for v in (1.0, 2.0, 3.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = kruskal_wallis(df, "g", "v").collect()
    assert len(out) == 3
    for r in out:
        assert r["n"] == 3
        assert r["h_stat"] == 0.0
        assert r["dof"] == 2


def test_kruskal_wallis_matches_scipy_formula_by_hand(spark):
    from rust_dataframe_spark.operators.hypothesis import kruskal_wallis

    data = {"a": [1.2, 3.4, 5.6, 2.2], "b": [7.7, 8.8, 2.2], "c": [0.5, 9.9]}
    rows = [(g, v) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["grp"]: r for r in kruskal_wallis(df, "g", "v").collect()}
    # hand replay with scipy's definition (mid-ranks, tie correction)
    allv = sorted(v for vs in data.values() for v in vs)
    def midrank(v):
        lo = sum(1 for x in allv if x < v)
        c = sum(1 for x in allv if x == v)
        return lo + (c + 1) / 2
    n = len(allv)
    h = 12 / (n * (n + 1)) * sum(
        sum(midrank(v) for v in vs) ** 2 / len(vs) for vs in data.values()
    ) - 3 * (n + 1)
    from collections import Counter
    tie = sum(c**3 - c for c in Counter(allv).values())
    hc = h / (1 - tie / (n**3 - n))
    assert out["a"]["h_stat"] == math.floor(h * 1e6) / 1e6
    assert out["a"]["h_corrected"] == math.floor(hc * 1e6) / 1e6
    assert out["b"]["rank_sum"] == sum(midrank(v) for v in data["b"])


def test_spearman_perfect_monotone_is_one(spark):
    from rust_dataframe_spark.operators.hypothesis import spearman_rho

    rows = [(float(i), float(i * i)) for i in range(1, 30)]  # nonlinear, monotone
    df = spark.createDataFrame(rows, "x double, y double")
    out = spearman_rho(df, "x", "y").collect()[0]
    assert out["n"] == 29
    assert out["rho"] == 1.0 or out["rho"] == 0.999999  # floor-at-6 of 1.0


def test_spearman_reversed_is_minus_one_and_ties_by_hand(spark):
    import statistics

    from rust_dataframe_spark.operators.hypothesis import spearman_rho

    rows = [(float(i), float(30 - i)) for i in range(1, 30)]
    out = spearman_rho(
        spark.createDataFrame(rows, "x double, y double"), "x", "y"
    ).collect()[0]
    assert out["rho"] == -1.0
    # ties: hand-replay pearson-of-midranks
    data = [(1.0, 2.0), (1.0, 3.0), (2.0, 2.0), (3.0, 5.0), (3.0, 4.0)]
    def midranks(vals):
        s = sorted(vals)
        return [
            sum(1 for x in s if x < v) + (sum(1 for x in s if x == v) + 1) / 2
            for v in vals
        ]
    xs = midranks([x for x, _ in data])
    ys = midranks([y for _, y in data])
    mx, my = statistics.mean(xs), statistics.mean(ys)
    num = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
    den = math.sqrt(
        sum((a - mx) ** 2 for a in xs) * sum((b - my) ** 2 for b in ys)
    )
    want = math.floor(num / den * 1e6) / 1e6
    out2 = spearman_rho(
        spark.createDataFrame(data, "x double, y double"), "x", "y"
    ).collect()[0]
    assert out2["rho"] == want


def test_fleiss_kappa_perfect_agreement_is_one(spark):
    from rust_dataframe_spark.operators.hypothesis import fleiss_kappa

    rows = [(i, c) for i in range(10) for c in ["x" if i < 6 else "y"] * 3]
    df = spark.createDataFrame(rows, "item bigint, cat string")
    out = fleiss_kappa(df, "item", "cat", 3).collect()
    assert all(r["p_bar"] == 1.0 for r in out)
    assert all(r["fleiss_kappa"] == 1.0 or r["fleiss_kappa"] == 0.999999 for r in out)
    assert all(r["bad_items"] == 0 for r in out)


def test_fleiss_kappa_matches_textbook_replay(spark):
    """Hand-replay of the Wikipedia-convention Fleiss computation on a
    small 3-rater fixture with disagreement."""
    from collections import Counter

    from rust_dataframe_spark.operators.hypothesis import fleiss_kappa

    votes = {
        0: ["a", "a", "b"], 1: ["b", "b", "b"], 2: ["a", "c", "c"],
        3: ["c", "c", "c"], 4: ["a", "b", "c"], 5: ["a", "a", "a"],
    }
    rows = [(i, c) for i, cs in votes.items() for c in cs]
    df = spark.createDataFrame(rows, "item bigint, cat string")
    out = {r["category"]: r for r in fleiss_kappa(df, "item", "cat", 3).collect()}
    n, N = 3, len(votes)
    p_bar = sum(
        (sum(v * v for v in Counter(cs).values()) - n) / (n * (n - 1))
        for cs in votes.values()
    ) / N
    cj = Counter(c for cs in votes.values() for c in cs)
    p_e = sum((v / (n * N)) ** 2 for v in cj.values())
    kappa = (p_bar - p_e) / (1 - p_e)
    got = out["a"]
    assert got["p_bar"] == math.floor(p_bar * 1e6) / 1e6
    assert got["p_e"] == math.floor(p_e * 1e6) / 1e6
    assert got["fleiss_kappa"] == math.floor(kappa * 1e6) / 1e6
    assert got["n_items"] == N and got["bad_items"] == 0
    assert out["b"]["n_assigned"] == cj["b"]


def test_obf_planted_effect_crosses_late_not_early(spark):
    """A moderate planted shift: the week-1 OBF boundary (4.048) holds,
    the final boundary (2.024) is crossed — the early-stop conservatism
    that IS the OBF design."""
    import datetime

    from rust_dataframe_spark.operators.hypothesis import group_sequential_obf

    rng = random.Random(9)
    rows = []
    for i in range(800):
        arm = i % 2
        day = datetime.datetime(2024, 1, 1 + (i * 29 // 800))
        # shift sized to land z ~ 2.5 at full sample
        v = rng.gauss(10.0, 2.0) + (0.36 if arm else 0.0)
        rows.append((i, day, round(v, 2)))
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    out = {
        r["look"]: r
        for r in group_sequential_obf(
            df, "user_id", "value", "ts",
            ["2024-01-08", "2024-01-15", "2024-01-22", "2024-01-31"],
        ).collect()
    }
    assert len(out) == 4
    assert out[1]["boundary"] > 4.0 and out[4]["boundary"] < 2.1
    assert not out[1]["crossed"]
    assert out[4]["crossed"]
    assert out[4]["first_crossing"] >= 2


def test_obf_null_never_crosses(spark):
    import datetime

    from rust_dataframe_spark.operators.hypothesis import group_sequential_obf

    rng = random.Random(4)
    rows = [
        (i, datetime.datetime(2024, 1, 1 + (i * 29 // 400)),
         round(rng.gauss(5, 1), 2))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    out = group_sequential_obf(
        df, "user_id", "value", "ts",
        ["2024-01-08", "2024-01-15", "2024-01-22", "2024-01-31"],
    ).collect()
    assert all(not r["crossed"] for r in out)
    assert all(r["first_crossing"] == 0 for r in out)


def test_obf_rejects_unsorted_cutoffs(spark):
    import pytest as _pytest

    from rust_dataframe_spark.operators.hypothesis import group_sequential_obf

    df = spark.createDataFrame([(1, None, 1.0)], "user_id bigint, ts timestamp, value double")
    with _pytest.raises(ValueError, match="strictly ascending"):
        group_sequential_obf(
            df, "user_id", "value", "ts", ["2024-01-31", "2024-01-08"]
        )


def test_obf_degenerate_looks_guarded(spark):
    """Round-6 ADVICE regression: (a) a look whose cutoff precedes all
    data still emits its row (looks axis left-joined) with z NULL and
    crossed FALSE; (b) a one-arm look (n0=0 or n1=0) and an nt<=2 look
    get the same guard instead of a divide-by-zero NULL crossed."""
    import datetime

    from rust_dataframe_spark.operators.hypothesis import group_sequential_obf

    # all data lands after look 1; look 2 has a single row (nt<=2);
    # look 3 is one-arm only (all odd user_ids); look 4 has both arms
    rows = [
        (1, datetime.datetime(2024, 1, 10), 5.0),   # odd -> arm 1
        (3, datetime.datetime(2024, 1, 18), 6.0),
        (5, datetime.datetime(2024, 1, 19), 7.5),
        (2, datetime.datetime(2024, 1, 25), 4.0),   # even -> arm 0
        (4, datetime.datetime(2024, 1, 26), 6.5),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    out = {
        r["look"]: r
        for r in group_sequential_obf(
            df, "user_id", "value", "ts",
            ["2024-01-08", "2024-01-15", "2024-01-22", "2024-01-31"],
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}  # every pre-registered look appears
    # look 1: empty
    assert out[1]["n0"] == 0 and out[1]["n1"] == 0
    # look 2: single row; look 3: one-arm
    assert out[3]["n0"] == 0 and out[3]["n1"] == 3
    for k in (1, 2, 3):
        assert out[k]["z_score"] is None
        assert out[k]["crossed"] is False
    # look 4 has both arms and nt=5 > 2: statistic defined
    assert out[4]["z_score"] is not None
    assert out[4]["crossed"] in (True, False)
    assert all(r["boundary"] is not None for r in out.values())


def test_kruskal_all_identical_values_h_corrected_null(spark):
    """Every value identical: tie correction is exactly 0 — h_corrected is
    a deliberate NULL (not NaN) on both engines; h_stat is 0."""
    from rust_dataframe_spark.operators.hypothesis import kruskal_wallis

    rows = [(g, 5.0) for g in ("a", "b", "c") for _ in range(4)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = kruskal_wallis(df, "g", "v").collect()
    assert all(r["h_stat"] == 0.0 for r in out)
    assert all(r["h_corrected"] is None for r in out)


def test_fleiss_wrong_rater_count_fails_loudly(spark):
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from rust_dataframe_spark.operators.hypothesis import fleiss_kappa

    rows = [(0, "a"), (0, "b"), (0, "a"), (1, "a"), (1, "a")]  # item 1: 2 raters
    df = spark.createDataFrame(rows, "item bigint, cat string")
    with _pytest.raises(Exception) as ei:
        fleiss_kappa(df, "item", "cat", 3).collect()
    assert "rater count" in str(ei.value)


class TestDecimalPromotion:
    """Round 7 (VERDICT r6 #8): the rank family's integer sums promote to
    decimal(38,0) automatically above the row gate; both paths are exact,
    so every floored output must be IDENTICAL."""

    def _fixture(self, spark, n=400):
        rng = random.Random(11)
        rows = [
            (i, float(rng.randrange(0, 5000)) / 100.0,
             float(rng.randrange(0, 5000)) / 100.0,
             ["a", "b", "c"][i % 3])
            for i in range(n)
        ]
        return spark.createDataFrame(
            rows, "user_id bigint, value double, y double, grp string"
        )

    def test_forced_promotion_parity_all_three(self, spark):
        from rust_dataframe_spark.operators.hypothesis import (
            kruskal_wallis,
            mann_whitney_u,
            spearman_rho,
        )

        df = self._fixture(spark)
        for fn, args in (
            (mann_whitney_u, ("user_id", "value")),
            (kruskal_wallis, ("grp", "value")),
            (spearman_rho, ("value", "y")),
        ):
            plain = sorted(map(tuple, fn(df, *args, decimal_sums=False).collect()))
            promoted = sorted(map(tuple, fn(df, *args, decimal_sums=True).collect()))
            assert plain == promoted, fn.__name__
        # promoted sums really are decimal-typed inside: spot-check the plan
        plan = spearman_rho(df, "value", "y", decimal_sums=True)._jdf.queryExecution().optimizedPlan().toString()
        assert "decimal(38,0)" in plan

    def test_env_gate_trips_auto_promotion(self, spark, monkeypatch):
        """With the gate forced below the fixture size, the auto path must
        promote — and still match the unpromoted output exactly."""
        from rust_dataframe_spark.operators import hypothesis as hy

        monkeypatch.setenv(hy.DECIMAL_ROWS_ENV, "10")
        hy._PROMOTE_COUNT_CACHE.clear()
        df = self._fixture(spark, n=200)
        auto = hy.spearman_rho(df, "value", "y")  # auto: count > 10 -> promoted
        plan = auto._jdf.queryExecution().optimizedPlan().toString()
        assert "decimal(38,0)" in plan
        got = auto.collect()
        want = hy.spearman_rho(df, "value", "y", decimal_sums=False).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))
        hy._PROMOTE_COUNT_CACHE.clear()

    def test_promoted_tie_term_survives_int64_overflow(self, spark):
        """ADVICE r7 (medium): the tie term cnt^3 must be built as a
        decimal product, not a bigint product later cast — a tie group of
        2.2M rows makes cnt^3 ~ 1.06e19 > int64 max, so the old
        cast-after-multiply path wraps (non-ANSI) or throws (ANSI).  The
        fixed path must complete AND match the Python-exact statistic."""
        import math

        from pyspark.sql import functions as F

        from rust_dataframe_spark.operators.hypothesis import mann_whitney_u

        BIG = 2_200_000  # > 2^21 = 2,097,152 -> cnt^3 overflows int64
        N = BIG + 200
        df = (
            spark.range(N)
            .select(
                (F.col("id") % 2).alias("arm_raw"),
                F.when(F.col("id") < BIG, 0.0)
                .when(F.col("id") < BIG + 100, 1.0)
                .otherwise(2.0)
                .alias("value"),
                F.col("id"),
            )
            .select(F.col("id").alias("user_id"), "value")
        )
        got = mann_whitney_u(df, "user_id", "value", decimal_sums=True).collect()
        assert len(got) == 1
        row = got[0]

        # Python-exact replay of the engine's formulas (int arithmetic)
        groups = []  # (v, cnt, cnt1) in value order; arm = id % 2 == 1
        for lo, hi, v in ((0, BIG, 0.0), (BIG, BIG + 100, 1.0), (BIG + 100, N, 2.0)):
            cnt = hi - lo
            cnt1 = hi // 2 - lo // 2  # count of odd ids in [lo, hi)
            groups.append((v, cnt, cnt1))
        below = 0
        r2_1 = 0
        tie = 0
        n = n1 = 0
        for v, cnt, cnt1 in groups:
            r2 = 2 * below + cnt + 1
            r2_1 += cnt1 * r2
            tie += cnt * cnt * cnt - cnt
            below += cnt
            n += cnt
            n1 += cnt1
        n0 = n - n1
        r1 = r2_1 / 2.0
        u1 = r1 - n1 * (n1 + 1) / 2.0
        mu = n0 * n1 / 2.0
        var = n0 * n1 / 12.0 * ((n + 1) - tie / (n * (n - 1)))
        z = (u1 - mu) / math.sqrt(var)
        assert row["n0"] == n0 and row["n1"] == n1
        assert row["u1"] == u1
        assert row["z_score"] == math.floor(z * 1e6) / 1e6

    def test_promote_cache_is_bounded_and_recounts_boundary_zone(
        self, spark, monkeypatch
    ):
        """ADVICE r7 (low): the plan->count cache is LRU-bounded and a hit
        whose cached count sits within 10x of the gate is NOT trusted (the
        table may have grown past the gate since) — it re-counts."""
        from pyspark.sql import functions as F

        from rust_dataframe_spark.operators import hypothesis as hy

        monkeypatch.setenv(hy.DECIMAL_ROWS_ENV, "1000")
        hy._PROMOTE_COUNT_CACHE.clear()
        df = spark.range(50).select(F.col("id").alias("x"))
        assert hy._decimal_promote(df, None) is False
        assert list(hy._PROMOTE_COUNT_CACHE.values()) == [50]
        key = next(iter(hy._PROMOTE_COUNT_CACHE))
        # far-zone hit (50*10 <= 1000): trusted, no recount
        hy._PROMOTE_COUNT_CACHE[key] = 3
        assert hy._decimal_promote(df, None) is False
        assert hy._PROMOTE_COUNT_CACHE[key] == 3  # untouched -> cache hit
        # boundary-zone poison (200 in (gate/10, gate]): must re-count
        hy._PROMOTE_COUNT_CACHE[key] = 200
        assert hy._decimal_promote(df, None) is False
        assert hy._PROMOTE_COUNT_CACHE[key] == 50  # replaced by a fresh count
        # above-gate hit: trusted (promotion is exactness-safe)
        hy._PROMOTE_COUNT_CACHE[key] = 10_000
        assert hy._decimal_promote(df, None) is True
        # eviction bound
        for i in range(150):
            hy._PROMOTE_COUNT_CACHE[f"fake{i}"] = 1
        hy._decimal_promote(df, None)
        assert len(hy._PROMOTE_COUNT_CACHE) <= hy._PROMOTE_CACHE_MAX
        hy._PROMOTE_COUNT_CACHE.clear()
