"""Catalog round 5 (session 2): hypothesis-testing battery q364+.

Chi-squared independence, one-way ANOVA, Mann-Whitney rank-sum,
Benjamini-Hochberg FDR over a test family, and a deterministic
permutation test — the experimentation-platform layer on top of the
CUPED adjustment (q234/experiments.py) and diff-in-diff (q349).  The
reference's aggregate surface stops at sum/avg/min/max
(src/functions/aggregate.rs); this whole family is north-star scope.

Determinism contract (see operators/hypothesis.py): counts and cent sums
are exact int64, statistics are fixed scalar dags on those ints, the few
genuine float folds run over SORTED bounded axes, and random draws are
md5 coins — so every query here holds the exact value-hash gate, not a
tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .catalog import load_events, query, table
from .sources.lakehouse_util import local_rows_df as _lrd

__all__: list[str] = []

_CENTS = "CAST(round(value * 100, 0) AS BIGINT)"


# ---------------------------------------------------------------------------
# q364: chi-squared test of independence (lang x source)
# ---------------------------------------------------------------------------


@query(
    "q364_chi2_independence",
    oracle="""
    WITH obs AS (
      SELECT lang AS a, source AS b, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY 1, 2
    ),
    cell AS (
      /* null-safe densification (round-6 ADVICE): NULL categories are
         real grid levels, kept by IS NOT DISTINCT FROM + window marginals */
      SELECT da.a, db.b, CAST(coalesce(obs.n, 0) AS BIGINT) AS n
      FROM (SELECT DISTINCT a FROM obs) da
      CROSS JOIN (SELECT DISTINCT b FROM obs) db
      LEFT JOIN obs ON obs.a IS NOT DISTINCT FROM da.a
                   AND obs.b IS NOT DISTINCT FROM db.b
    ),
    m AS (
      SELECT a, b, n,
             CAST(sum(n) OVER (PARTITION BY a) AS BIGINT) AS n_a,
             CAST(sum(n) OVER (PARTITION BY b) AS BIGINT) AS n_b
      FROM cell
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nt,
             CAST(count(DISTINCT a)
                  + max(CASE WHEN a IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ka,
             CAST(count(DISTINCT b)
                  + max(CASE WHEN b IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS kb
      FROM cell
    ),
    c AS (
      SELECT m.a, m.b, m.n,
             CAST(n_a * n_b AS DOUBLE) / nt AS e,
             (m.n - CAST(n_a * n_b AS DOUBLE) / nt)
               * (m.n - CAST(n_a * n_b AS DOUBLE) / nt)
               / (CAST(n_a * n_b AS DOUBLE) / nt) AS contrib,
             CAST((ka - 1) * (kb - 1) AS BIGINT) AS dof
      FROM m CROSS JOIN tot
    ),
    chi AS (
      SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                      list(contrib ORDER BY a, b)),
                         (x, y) -> x + y) AS chi2
      FROM c
    )
    SELECT a, b, n,
           floor(e * 1e6) / 1e6 AS expected,
           floor(contrib * 1e6) / 1e6 AS contrib,
           floor(chi2 * 1e6) / 1e6 AS chi2,
           dof
    FROM c CROSS JOIN chi ORDER BY a, b
    """,
)
def q364_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-squared independence test of document language vs
    source — "does this crawl source skew the language mix?", the
    categorical-association audit a corpus-mixing pipeline runs before
    trusting per-source quotas (q268's mixture weights assume the
    answer).  operators/hypothesis.chi2_independence: one groupBy to the
    bounded lang x source cell axis DENSIFIED to the full ka x kb grid
    (zero-count cells contribute exactly E — Pearson chi2 is understated
    without them), marginals broadcast back, the chi2 sum an ordered fold
    over the sorted cell list — integer counts make expected/contrib
    bit-identical cross-engine.  Scale: corpus scan is one
    map-side-partial count; everything after is axis-sized."""
    from .operators.hypothesis import chi2_independence

    d = table(spark, sf_dir, "documents")
    return chi2_independence(d, "lang", "source").orderBy("a", "b")


# ---------------------------------------------------------------------------
# q365: one-way ANOVA (value by event_type)
# ---------------------------------------------------------------------------


@query(
    "q365_anova_oneway",
    oracle=f"""
    WITH g AS (
      SELECT event_type AS grp,
             CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum({_CENTS}) AS BIGINT) AS s_g,
             CAST(sum({_CENTS} * {_CENTS}) AS BIGINT) AS ss_g
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(n_g) AS BIGINT) AS nt,
             CAST(sum(s_g) AS BIGINT) AS st,
             CAST(sum(ss_g) AS BIGINT) AS sst,
             CAST(count(*) AS BIGINT) AS k,
             list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                 list(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) / n_g
                      ORDER BY grp)),
               (x, y) -> x + y) AS between_raw
      FROM g
    )
    SELECT grp, n_g AS n,
           floor(CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE) / 100.0 * 1e6)
             / 1e6 AS mean_value,
           floor((between_raw - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / nt)
                 / 1e4 * 1e6) / 1e6 AS ss_between,
           floor((CAST(sst AS DOUBLE) - between_raw) / 1e4 * 1e6) / 1e6
             AS ss_within,
           CAST(k - 1 AS BIGINT) AS df1,
           CAST(nt - k AS BIGINT) AS df2,
           floor(((between_raw - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / nt)
                  / (k - 1))
                 / ((CAST(sst AS DOUBLE) - between_raw) / (nt - k))
                 * 1e6) / 1e6 AS f_stat
    FROM g CROSS JOIN tot ORDER BY grp
    """,
)
def q365_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of event value across event types — "do the
    event-type populations share a mean?", the k-group generalization of
    the two-arm readouts (q234/q349).  operators/hypothesis.anova_oneway:
    per-group (n, sum, sum-of-squares) on EXACT integer cents in one
    map-side-partial pass, sums-of-squares identities on those ints, the
    single bounded cross-group fold sorted by group — F statistic
    bit-identical across engines, no tolerance.  Scale: one scan; the
    group axis (~5 event types) rides a scalar broadcast."""
    from .operators.hypothesis import anova_oneway

    ev = load_events(spark, sf_dir)
    return anova_oneway(ev, "event_type", "value").orderBy("grp")


# ---------------------------------------------------------------------------
# q366: Mann-Whitney U (rank-sum) between the two user-parity arms
# ---------------------------------------------------------------------------


@query(
    "q366_mann_whitney",
    oracle=f"""
    WITH v AS (
      SELECT CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS arm,
             {_CENTS} AS v
      FROM events
    ),
    per AS (
      SELECT v, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(arm) AS BIGINT) AS cnt1
      FROM v GROUP BY 1
    ),
    r AS (
      SELECT v, cnt, cnt1,
             CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS below_incl
      FROM per
    ),
    ranked AS (
      SELECT v, cnt, cnt1,
             CAST(below_incl - cnt AS DOUBLE) + (cnt + 1) / 2.0 AS midrank
      FROM r
    ),
    s AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS n,
             CAST(sum(cnt1) AS BIGINT) AS n1,
             sum(cnt1 * midrank) AS r1,
             sum(CAST(cnt AS DOUBLE) * cnt * cnt - CAST(cnt AS DOUBLE))
               AS tie_term
      FROM ranked
    )
    SELECT CAST(n - n1 AS BIGINT) AS n0,
           n1,
           r1 AS rank_sum_1,
           r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0 AS u1,
           CAST(n - n1 AS DOUBLE) * n1
             - (r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0) AS u0,
           floor(((r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0)
                  - CAST(n - n1 AS DOUBLE) * n1 / 2.0)
                 / sqrt(CAST(n - n1 AS DOUBLE) * n1 / 12.0
                        * (CAST(n + 1 AS DOUBLE)
                           - tie_term / (CAST(n AS DOUBLE) * (n - 1))))
                 * 1e6) / 1e6 AS z_score
    FROM s
    """,
)
def q366_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U between the two user-parity arms of the events
    value — the rank-based two-sample test that needs no normality
    (heavy-tailed engagement metrics are the norm, not the exception).
    operators/hypothesis.mann_whitney_u: mid-ranks per DISTINCT cents
    value with the global prefix count on training.global_cumsum
    (two-phase range partitioning — no single-partition window), and
    every mid-rank an exact multiple of 0.5 so the rank sum is
    order-independent by construction.  The z-score (tie-corrected) is
    the one float output.  Scale: rank table is distinct-value sized,
    not corpus sized."""
    from .operators.hypothesis import mann_whitney_u

    ev = load_events(spark, sf_dir)
    return mann_whitney_u(ev, "user_id", "value")


# ---------------------------------------------------------------------------
# q367: Benjamini-Hochberg FDR over the per-event-type mean-shift family
# ---------------------------------------------------------------------------

_BH_ALPHA = 0.2


@query(
    "q367_bh_fdr",
    oracle=f"""
    WITH g AS (
      SELECT event_type AS grp,
             CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum({_CENTS}) AS BIGINT) AS s_g
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(n_g) AS BIGINT) AS nt,
             CAST(sum(s_g) AS BIGINT) AS st,
             (SELECT CAST(sum({_CENTS} * {_CENTS}) AS BIGINT) FROM events)
               AS sst,
             CAST(count(*) AS BIGINT) AS m
      FROM g
    ),
    z AS (
      SELECT grp, n_g,
             (CAST(s_g AS DOUBLE) / n_g - CAST(st AS DOUBLE) / nt)
             / (sqrt((CAST(sst AS DOUBLE)
                      - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / nt)
                     / (nt - 1))
                / sqrt(CAST(n_g AS DOUBLE))) AS z,
             m
      FROM g CROSS JOIN tot
    ),
    xt AS (
      SELECT grp, n_g, z, m,
             abs(z) / sqrt(2.0) AS x,
             1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t
      FROM z
    ),
    p AS (
      SELECT grp, n_g, z, m,
             t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                 + t * (-1.453152027 + t * 1.061405429)))) * exp(-x * x)
               AS p
      FROM xt
    ),
    ranked AS (
      SELECT grp, n_g, z, m, p,
             CAST(row_number() OVER (ORDER BY p, grp) AS BIGINT) AS rnk
      FROM p
    ),
    flagged AS (
      SELECT *, p <= rnk * {_BH_ALPHA} / m AS passes FROM ranked
    ),
    cut AS (
      SELECT coalesce(max(CASE WHEN passes THEN rnk END), 0) AS k_max
      FROM flagged
    )
    SELECT grp, n_g AS n,
           floor(z * 1e6) / 1e6 AS z_score,
           floor(p * 1e6) / 1e6 AS p_value,
           rnk AS p_rank,
           floor(rnk * {_BH_ALPHA} / m * 1e6) / 1e6 AS bh_critical,
           rnk <= k_max AS rejected
    FROM flagged CROSS JOIN cut ORDER BY rnk
    """,
)
def q367_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over the family of per-event-type
    mean-shift tests — the multiplicity step every metrics platform needs
    once it tests more than one hypothesis per release.  One z-score per
    event type (exact integer cent sums; pooled sd), the TRUE two-sided
    normal p-value p = erfc(|z|/sqrt(2)) computed via the
    Abramowitz-Stegun 7.1.26 rational approximation (max abs error
    1.5e-7 — far below any BH threshold gap here, so the alpha=0.2 level
    is meaningful; neither engine exposes a builtin erfc, and the
    identical scalar dag keeps the exact-hash gate), then the step-up
    rule p_(i) <= i/m * alpha with all i <= k_max rejected.  The ranking
    window runs on the bounded event-type axis (~5 rows — PLANLINT
    sp-allowed).  Scale: one scan to the group axis; everything after is
    axis-sized."""
    ev = load_events(spark, sf_dir)
    from .operators.hypothesis import cents

    g = ev.select(
        F.col("event_type").alias("grp"), cents(F.col("value")).alias("v")
    ).groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("v").cast("bigint").alias("s_g"),
        F.sum(F.col("v") * F.col("v")).cast("bigint").alias("ss_g"),
    )
    tot = g.agg(
        F.sum("n_g").cast("bigint").alias("nt"),
        F.sum("s_g").cast("bigint").alias("st"),
        F.sum("ss_g").cast("bigint").alias("sst"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
    )
    sd_all = F.sqrt(
        (
            F.col("sst").cast("double")
            - F.col("st").cast("double") * F.col("st").cast("double") / F.col("nt")
        )
        / (F.col("nt") - 1)
    )
    z = (
        F.col("s_g").cast("double") / F.col("n_g")
        - F.col("st").cast("double") / F.col("nt")
    ) / (sd_all / F.sqrt(F.col("n_g").cast("double")))
    zs = g.crossJoin(F.broadcast(tot)).select(
        "grp", "n_g", z.alias("z"), F.col("m")
    )
    # true two-sided normal tail: p = erfc(|z|/sqrt(2)), A&S 7.1.26
    # (identical scalar dag to the DuckDB oracle — one exp, rest IEEE
    # add/mul/div, so the exact-hash gate still holds)
    x = F.abs(F.col("z")) / F.sqrt(F.lit(2.0))
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * x)
    erfc = (
        t
        * (
            F.lit(0.254829592)
            + t
            * (
                F.lit(-0.284496736)
                + t
                * (
                    F.lit(1.421413741)
                    + t * (F.lit(-1.453152027) + t * F.lit(1.061405429))
                )
            )
        )
        * F.exp(-x * x)
    )
    p = zs.select("grp", "n_g", "z", "m", erfc.alias("p"))
    w = Window.orderBy("p", "grp")
    ranked = p.withColumn("rnk", F.row_number().over(w).cast("bigint"))
    flagged = ranked.withColumn(
        "passes", F.col("p") <= F.col("rnk") * _BH_ALPHA / F.col("m")
    )
    cut = flagged.agg(
        F.coalesce(
            F.max(F.when(F.col("passes"), F.col("rnk"))), F.lit(0)
        ).alias("k_max")
    )
    return (
        flagged.crossJoin(F.broadcast(cut))
        .select(
            "grp",
            F.col("n_g").alias("n"),
            (F.floor(F.col("z") * 1e6) / 1e6).alias("z_score"),
            (F.floor(F.col("p") * 1e6) / 1e6).alias("p_value"),
            F.col("rnk").alias("p_rank"),
            (F.floor(F.col("rnk") * _BH_ALPHA / F.col("m") * 1e6) / 1e6).alias(
                "bh_critical"
            ),
            (F.col("rnk") <= F.col("k_max")).alias("rejected"),
        )
        .orderBy("p_rank")
    )


# ---------------------------------------------------------------------------
# q368: deterministic permutation test (md5 relabeling)
# ---------------------------------------------------------------------------

_PERM_R = 24


def _perm_oracle() -> str:
    u_cols = ", ".join(
        f"CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || '#perm{b}'),"
        f" 32, 1)) AS UBIGINT) % 2 AS a{b}"
        for b in range(_PERM_R)
    )
    arms = " UNION ALL ".join(
        f"SELECT {b} AS replica, a{b} AS parm, v FROM u" for b in range(_PERM_R)
    )
    return f"""
    WITH base AS (
      SELECT event_id,
             CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS arm,
             {_CENTS} AS v
      FROM events
    ),
    obs AS (
      SELECT CAST(count(*) AS BIGINT) AS n_all,
             CAST(sum(arm) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN arm = 1 THEN v ELSE 0 END) AS BIGINT) AS s1,
             CAST(sum(v) AS BIGINT) AS s_all
      FROM base
    ),
    u AS (SELECT event_id, v, {u_cols} FROM base),
    r AS ({arms}),
    per_rep AS (
      SELECT replica,
             CAST(sum(parm) AS BIGINT) AS pn1,
             CAST(sum(CASE WHEN parm = 1 THEN v ELSE 0 END) AS BIGINT) AS ps1,
             CAST(count(*) AS BIGINT) AS pn,
             CAST(sum(v) AS BIGINT) AS ps
      FROM r GROUP BY replica
    ),
    rep_stat AS (
      SELECT replica,
             (pn1 = 0 OR pn1 = pn) AS degenerate,
             CASE WHEN pn1 > 0 AND pn1 < pn
                  THEN abs(CAST(ps1 AS DOUBLE) / pn1
                           - CAST(ps - ps1 AS DOUBLE) / (pn - pn1))
             END AS t
      FROM per_rep
    ),
    tail AS (
      SELECT CAST(count(*) AS BIGINT) AS r,
             CAST(sum(CASE WHEN degenerate
                           OR t >= (SELECT abs(CAST(s1 AS DOUBLE) / n1
                                        - CAST(s_all - s1 AS DOUBLE)
                                          / (n_all - n1)) FROM obs)
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_ge
      FROM rep_stat
    )
    SELECT CAST(n_all - n1 AS BIGINT) AS n0,
           n1,
           floor(abs(CAST(s1 AS DOUBLE) / n1
                     - CAST(s_all - s1 AS DOUBLE) / (n_all - n1))
                 / 100.0 * 1e6) / 1e6 AS obs_abs_diff,
           r AS replicas,
           n_ge AS n_as_extreme,
           CAST(1 + n_ge AS DOUBLE) / (r + 1) AS p_value
    FROM obs CROSS JOIN tail
    """


@query("q368_permutation_test", oracle=_perm_oracle())
def q368_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Design-based BERNOULLI RANDOMIZATION test of the user-parity arm
    difference in mean event value — the assumption-free companion of
    q366's rank test and q227's bootstrap: relabel arms under H0,
    recompute the statistic, read the tail.
    operators/hypothesis.permutation_test: replica b's labels are the
    low md5 bit of (event_id, b) — an independent fair coin per row
    (iid-assignment null, Binomial(n, 1/2) arm sizes — the null a
    hash-split design actually draws from; NOT a fixed-margin label
    permutation), deterministic and replayable; a degenerate one-arm
    replica counts as extreme (conservative).  Each replica statistic is
    a ratio of exact int64 cent sums, so tail comparisons are
    bit-deterministic and the p-value is the exact rational
    (1 + #extreme)/(R + 1).  Scale: one explode to R=24 replicas
    combining map-side into R x 2 groups — shuffle payload O(R), not
    O(rows x R)."""
    from .operators.hypothesis import permutation_test

    ev = load_events(spark, sf_dir)
    return permutation_test(
        ev, "event_id", "user_id", "value", replicas=_PERM_R
    )


# ---------------------------------------------------------------------------
# q369: two-round gradient-boosted stumps on histogram cells
# ---------------------------------------------------------------------------


@query(
    "q369_boosted_stumps",
    oracle="""
    WITH f AS (
      SELECT CAST(embedding[1] AS DOUBLE) AS x1,
             CAST(embedding[2] AS DOUBLE) AS x2,
             CAST(label % 2 AS BIGINT) AS y
      FROM embeddings
    ),
    bounds AS (
      SELECT min(x1) AS lo1, max(x1) AS hi1,
             min(x2) AS lo2, max(x2) AS hi2
      FROM f
    ),
    cells AS (
      SELECT least(15, CAST(floor((x1 - lo1) / (hi1 - lo1 + 1e-12) * 16)
                            AS INT)) AS b1,
             least(15, CAST(floor((x2 - lo2) / (hi2 - lo2 + 1e-12) * 16)
                            AS INT)) AS b2,
             y, CAST(count(*) AS BIGINT) AS cnt
      FROM f, bounds GROUP BY 1, 2, 3
    ),
    bins1 AS (
      SELECT b1, CAST(sum(cnt) AS BIGINT) AS n,
             CAST(sum(y * cnt) AS BIGINT) AS sy
      FROM cells GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(sy) AS BIGINT) AS syt
      FROM bins1
    ),
    grid AS (SELECT unnest(generate_series(1, 15)) AS s),
    sweep1 AS (
      SELECT g.s,
             CAST(coalesce(sum(CASE WHEN b.b1 < g.s THEN b.n END), 0)
                  AS BIGINT) AS nl,
             CAST(coalesce(sum(CASE WHEN b.b1 < g.s THEN b.sy END), 0)
                  AS BIGINT) AS sl
      FROM grid g CROSS JOIN bins1 b GROUP BY 1
    ),
    g1 AS (
      SELECT s, nl, nt - nl AS nr, sl, syt - sl AS sr,
             CASE WHEN nl = 0 OR nt - nl = 0 THEN -1.0
                  ELSE CAST(sl AS DOUBLE) * sl / nl
                       + CAST(syt - sl AS DOUBLE) * (syt - sl) / (nt - nl)
             END AS gain
      FROM sweep1, tot
    ),
    best1 AS (
      SELECT s AS s1, nl AS nl1, nr AS nr1,
             CAST(sl AS DOUBLE) / nl AS m1l,
             CAST(sr AS DOUBLE) / nr AS m1r
      FROM g1 ORDER BY gain DESC, s ASC LIMIT 1
    ),
    rc AS (
      SELECT b2, leaf_l, y, CAST(sum(cnt) AS BIGINT) AS cnt, min(r) AS r
      FROM (
        SELECT c.b2, c.b1 < s1 AS leaf_l, c.y, c.cnt,
               CAST(c.y AS DOUBLE)
                 - (CASE WHEN c.b1 < s1 THEN m1l ELSE m1r END) AS r
        FROM cells c, best1)
      GROUP BY 1, 2, 3
    ),
    bins2 AS (
      SELECT b2, CAST(sum(cnt) AS BIGINT) AS n,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                      list(cnt * r ORDER BY leaf_l, y)),
                         (a, b) -> a + b) AS sr2
      FROM rc GROUP BY 1
    ),
    tot2 AS (
      SELECT CAST(sum(n) AS BIGINT) AS nt,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                      list(sr2 ORDER BY b2)),
                         (a, b) -> a + b) AS srt
      FROM bins2
    ),
    sweep2 AS (
      SELECT g.s,
             CAST(coalesce(sum(CASE WHEN b.b2 < g.s THEN b.n END), 0)
                  AS BIGINT) AS nl,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(CASE WHEN b.b2 < g.s THEN b.sr2 ELSE 0.0 END
                    ORDER BY b.b2)),
               (a, b) -> a + b) AS sl
      FROM grid g CROSS JOIN bins2 b GROUP BY 1
    ),
    g2 AS (
      SELECT s, nl, nt - nl AS nr, sl, srt - sl AS sr,
             CASE WHEN nl = 0 OR nt - nl = 0 THEN -1.0
                  ELSE sl * sl / nl + (srt - sl) * (srt - sl) / (nt - nl)
             END AS gain
      FROM sweep2, tot2
    ),
    best2 AS (
      SELECT s AS s2, nl AS nl2, nr AS nr2,
             sl / nl AS m2l, sr / nr AS m2r
      FROM g2 ORDER BY gain DESC, s ASC LIMIT 1
    ),
    sse AS (
      SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(cnt * r1 * r1 ORDER BY b1, b2, y)), (a, b) -> a + b)
               AS sse1,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(cnt * r2 * r2 ORDER BY b1, b2, y)), (a, b) -> a + b)
               AS sse2
      FROM (
        SELECT c.b1, c.b2, c.y, c.cnt,
               CAST(c.y AS DOUBLE)
                 - (CASE WHEN c.b1 < s1 THEN m1l ELSE m1r END) AS r1,
               (CAST(c.y AS DOUBLE)
                 - (CASE WHEN c.b1 < s1 THEN m1l ELSE m1r END))
                 - (CASE WHEN c.b2 < s2 THEN m2l ELSE m2r END) AS r2
        FROM cells c, best1, best2)
    )
    SELECT 1 AS round, 'x1' AS feature, CAST(s1 AS INT) AS split_bin,
           floor((lo1 + s1 * (hi1 - lo1 + 1e-12) / 16) * 1e6) / 1e6
             AS threshold,
           nl1 AS n_left, nr1 AS n_right,
           floor(m1l * 1e6) / 1e6 AS left_value,
           floor(m1r * 1e6) / 1e6 AS right_value,
           floor(sse1 * 1e6) / 1e6 AS sse_after
    FROM best1, bounds, sse
    UNION ALL
    SELECT 2, 'x2', CAST(s2 AS INT),
           floor((lo2 + s2 * (hi2 - lo2 + 1e-12) / 16) * 1e6) / 1e6,
           nl2, nr2,
           floor(m2l * 1e6) / 1e6, floor(m2r * 1e6) / 1e6,
           floor(sse2 * 1e6) / 1e6
    FROM best2, bounds, sse
    ORDER BY round
    """,
)
def q369_boosted_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two rounds of squared-loss gradient boosting with decision-stump
    weak learners over embedding dims 1/2 vs the parity label — the
    histogram-GBDT training pattern (XGBoost/LightGBM approximate split
    finding) that q353's single stump grows into an actual boosting
    step.  operators/boosting.boosted_stumps: ONE corpus pass builds the
    joint (bin1, bin2, y) integer cell table (persisted, nbins^2 x 2
    rows); both 15-candidate split sweeps, the residual bookkeeping and
    the final SSE are bounded-axis algebra on those cells — no
    per-round re-scan, which is precisely why this trains at 100 TB.
    Round-2 residuals take only 4 distinct values, so every float sum is
    an ordered fold over a sorted bounded list; split argmaxes are
    max_by aggregates (1-row scalar broadcasts).  sse_after is pinned
    non-increasing across rounds by the boosting contract."""
    from .operators.boosting import boosted_stumps

    e = table(spark, sf_dir, "embeddings").select(
        F.element_at("embedding", 1).cast("double").alias("x1"),
        F.element_at("embedding", 2).cast("double").alias("x2"),
        (F.col("label") % 2).alias("y"),
    )
    return boosted_stumps(e, "x1", "x2", "y", nbins=16)


# ---------------------------------------------------------------------------
# q370: simplified silhouette (centroid-based cluster-quality audit)
# ---------------------------------------------------------------------------


@query(
    "q370_silhouette",
    oracle="""
    WITH e AS (SELECT vec_id, label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
    dims AS (SELECT label, vec_id, d.i AS dim, emb[d.i] AS v
             FROM e CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) d),
    cent AS (SELECT label, dim, sum(v) / count(*) AS c
             FROM dims GROUP BY label, dim),
    cvec AS (SELECT label AS clabel, list(c ORDER BY dim) AS cv
             FROM cent GROUP BY label),
    d2 AS (
      SELECT e.vec_id, e.label, cv.clabel,
             sqrt(list_reduce(list_prepend(0.0,
               list_transform(list_zip(e.emb, cv.cv),
                              p -> (p[1] - p[2]) * (p[1] - p[2]))),
               (s, x) -> s + x)) AS dist
      FROM e CROSS JOIN cvec cv
    ),
    ab AS (
      SELECT vec_id, label,
             max(CASE WHEN label = clabel THEN dist END) AS a,
             min(CASE WHEN label != clabel THEN dist END) AS b
      FROM d2 GROUP BY vec_id, label
    ),
    s AS (
      SELECT vec_id, label,
             CASE WHEN greatest(a, b) = 0 THEN 0.0
                  ELSE (b - a) / greatest(a, b) END AS sil
      FROM ab
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN sil < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_negative,
           CAST(sum(CASE WHEN least(4, CAST(floor((sil + 1) / 2 * 5) AS INT))
                         = 0 THEN 1 ELSE 0 END) AS BIGINT) AS bin0,
           CAST(sum(CASE WHEN least(4, CAST(floor((sil + 1) / 2 * 5) AS INT))
                         = 1 THEN 1 ELSE 0 END) AS BIGINT) AS bin1,
           CAST(sum(CASE WHEN least(4, CAST(floor((sil + 1) / 2 * 5) AS INT))
                         = 2 THEN 1 ELSE 0 END) AS BIGINT) AS bin2,
           CAST(sum(CASE WHEN least(4, CAST(floor((sil + 1) / 2 * 5) AS INT))
                         = 3 THEN 1 ELSE 0 END) AS BIGINT) AS bin3,
           CAST(sum(CASE WHEN least(4, CAST(floor((sil + 1) / 2 * 5) AS INT))
                         = 4 THEN 1 ELSE 0 END) AS BIGINT) AS bin4
    FROM s GROUP BY label ORDER BY label
    """,
)
def q370_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based) silhouette audit of the label
    clustering in embedding space — a(i) = distance to the OWN label
    centroid, b(i) = distance to the nearest OTHER centroid,
    s = (b-a)/max(a,b) — the O(n*k) cluster-quality readout that
    replaces the O(n^2) full silhouette at corpus scale (the k-means /
    label-QA companion of q221's per-label outliers and q361's
    collapse audit).  Centroids come from similarity.mean_pool (exact
    float32-in-double sums — order-independent); distances are ordered
    zip folds; the output is a 5-bin silhouette HISTOGRAM plus the
    negative count per label — integer counts, so the gate is exact
    (a per-label float MEAN of s would be partition-order-dependent).
    Scale: one (label, dim) shuffle for centroids, then a k-row
    centroid broadcast against the corpus — vectors never shuffle."""
    from .operators.similarity import as_double, mean_pool

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("emb")
    )
    cents = mean_pool(e, "label", "emb").select(
        F.col("label").alias("clabel"), F.col("pooled").alias("cv")
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("emb"), F.col("cv"), lambda x, c: (x - c) * (x - c)
            ),
            F.lit(0.0),
            lambda s, v: s + v,
        )
    )
    d2 = e.crossJoin(F.broadcast(cents)).select(
        "vec_id", "label", "clabel", dist.alias("dist")
    )
    ab = d2.groupBy("vec_id", "label").agg(
        F.max(F.when(F.col("label") == F.col("clabel"), F.col("dist"))).alias(
            "a"
        ),
        F.min(F.when(F.col("label") != F.col("clabel"), F.col("dist"))).alias(
            "b"
        ),
    )
    sil = F.when(F.greatest("a", "b") == 0, F.lit(0.0)).otherwise(
        (F.col("b") - F.col("a")) / F.greatest("a", "b")
    )
    sb = ab.select(
        "label",
        sil.alias("sil"),
        F.least(F.lit(4), F.floor((sil + 1) / 2 * 5).cast("int")).alias("bin"),
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("sil") < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_negative")]
    aggs += [
        F.sum(F.when(F.col("bin") == i, 1).otherwise(0))
        .cast("bigint")
        .alias(f"bin{i}")
        for i in range(5)
    ]
    return sb.groupBy("label").agg(*aggs).orderBy("label")


# ---------------------------------------------------------------------------
# q371: blocked edit-distance (Levenshtein) similarity join
# ---------------------------------------------------------------------------


@query(
    "q371_edit_distance_join",
    oracle="""
    WITH names AS (
      SELECT p_name AS nm, CAST(count(*) AS BIGINT) AS n_parts
      FROM part GROUP BY 1
    ),
    keyed AS (
      SELECT nm, n_parts, split_part(nm, ' ', 2) AS blk, length(nm) AS ln
      FROM names
    )
    SELECT a.nm AS name_a, b.nm AS name_b,
           CAST(levenshtein(a.nm, b.nm) AS INT) AS edit_dist,
           a.n_parts AS n_a, b.n_parts AS n_b
    FROM keyed a JOIN keyed b
      ON a.blk = b.blk AND a.nm < b.nm
         AND abs(a.ln - b.ln) <= 2
    WHERE levenshtein(a.nm, b.nm) <= 2
    ORDER BY name_a, name_b
    """,
)
def q371_edit_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-duplicate detection by edit distance with blocking — the
    record-linkage primitive between exact dedup (q70, digest equality)
    and token-set similarity (q249, Jaccard prefix join): catch
    near-identical catalog names that differ by a typo.  Candidate-
    then-verify discipline: (1) compare DISTINCT names, never part rows
    (the exact_dedup per-distinct-content trick — the quadratic factor
    is distinct-name block size, not corpus size); (2) block on the
    noun token so only same-noun names ever meet; (3) a cheap
    |length diff| <= 2 necessary-condition filter runs before the DP;
    (4) the O(len^2) levenshtein kernel (JVM built-in, codegen'd) only
    touches surviving candidates.  At 100 TB the block key generalizes
    to any cheap canonical signature (sorted tokens, phonetic key,
    length band).  Edit distances and counts are integers — exact."""
    p = table(spark, sf_dir, "part")
    names = p.groupBy(F.col("p_name").alias("nm")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts")
    )
    keyed = names.select(
        "nm",
        "n_parts",
        F.split_part(F.col("nm"), F.lit(" "), F.lit(2)).alias("blk"),
        F.length("nm").alias("ln"),
    )
    a = keyed.select(
        F.col("nm").alias("name_a"),
        F.col("n_parts").alias("n_a"),
        F.col("blk"),
        F.col("ln").alias("ln_a"),
    )
    b = keyed.select(
        F.col("nm").alias("name_b"),
        F.col("n_parts").alias("n_b"),
        F.col("blk"),
        F.col("ln").alias("ln_b"),
    )
    return (
        a.join(b, "blk")
        .filter(
            (F.col("name_a") < F.col("name_b"))
            & (F.abs(F.col("ln_a") - F.col("ln_b")) <= 2)
        )
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("int").alias("edit_dist"),
            "n_a",
            "n_b",
        )
        .filter(F.col("edit_dist") <= 2)
        .orderBy("name_a", "name_b")
    )


# ---------------------------------------------------------------------------
# q372: offline changepoint scan over the day axis (mean-shift CUSUM-free)
# ---------------------------------------------------------------------------


@query(
    "q372_changepoint_scan",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n_d,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS s_d
      FROM events GROUP BY 1
    ),
    c AS (
      SELECT day, n_d, s_d,
             CAST(sum(n_d) OVER (ORDER BY day) AS BIGINT) AS nb,
             CAST(sum(s_d) OVER (ORDER BY day) AS BIGINT) AS sb,
             CAST(sum(n_d) OVER () AS BIGINT) AS nt,
             CAST(sum(s_d) OVER () AS BIGINT) AS st
      FROM d
    ),
    t AS (
      SELECT day, nb, nt - nb AS na,
             CAST(sb AS DOUBLE) / nb / 100.0 AS mean_before,
             CAST(st - sb AS DOUBLE) / (nt - nb) / 100.0 AS mean_after,
             CASE WHEN nb = 0 OR nt - nb = 0 THEN -1.0
                  ELSE abs(CAST(sb AS DOUBLE) / nb
                           - CAST(st - sb AS DOUBLE) / (nt - nb))
                       * sqrt(CAST(nb AS DOUBLE) * (nt - nb) / nt) / 100.0
             END AS t_stat
      FROM c
    )
    SELECT day, nb AS n_before, na AS n_after,
           floor(mean_before * 1e6) / 1e6 AS mean_before,
           floor(mean_after * 1e6) / 1e6 AS mean_after,
           floor(t_stat * 1e6) / 1e6 AS t_stat,
           t_stat = max(t_stat) OVER () AS is_best
    FROM t WHERE na > 0
    ORDER BY day
    """,
)
def q372_changepoint_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline single-changepoint scan: for every candidate day boundary,
    the scaled mean-shift statistic |mean_before - mean_after| *
    sqrt(nb*na/n) — the retrospective complement of q228's online CUSUM
    (CUSUM alarms as data arrives; this localizes WHERE the level
    shifted once the window is closed).  The corpus reduces to per-day
    exact integer cent sums in one map-side-partial pass; the candidate
    sweep is a cumulative over the bounded ~31-row day axis (PLANLINT
    sp-allowed, the q312 convention), so every prefix mean is a ratio of
    exact int64 sums — the argmax flag replays bit-identically.  Scale:
    axis-sized after the first aggregate; at 100 TB the day axis is
    still ~tens of rows."""
    ev = load_events(spark, sf_dir)
    from .operators.hypothesis import cents

    d = ev.select(
        F.col("ts").cast("date").alias("day"), cents(F.col("value")).alias("v")
    ).groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_d"),
        F.sum("v").cast("bigint").alias("s_d"),
    )
    wc = Window.orderBy("day")
    wall = Window.partitionBy()
    c = d.select(
        "day",
        F.sum("n_d").over(wc).cast("bigint").alias("nb"),
        F.sum("s_d").over(wc).cast("bigint").alias("sb"),
        F.sum("n_d").over(wall).cast("bigint").alias("nt"),
        F.sum("s_d").over(wall).cast("bigint").alias("st"),
    )
    na = F.col("nt") - F.col("nb")
    t_stat = (
        F.when((F.col("nb") == 0) | (na == 0), F.lit(-1.0))
        .otherwise(
            F.abs(
                F.col("sb").cast("double") / F.col("nb")
                - (F.col("st") - F.col("sb")).cast("double") / na
            )
            * F.sqrt(F.col("nb").cast("double") * na / F.col("nt"))
            / 100.0
        )
    )
    t = c.select(
        "day",
        F.col("nb").alias("n_before"),
        na.alias("n_after"),
        (
            F.floor(F.col("sb").cast("double") / F.col("nb") / 100.0 * 1e6)
            / 1e6
        ).alias("mean_before"),
        (
            F.floor(
                (F.col("st") - F.col("sb")).cast("double") / na / 100.0 * 1e6
            )
            / 1e6
        ).alias("mean_after"),
        t_stat.alias("t_raw"),
    ).filter(F.col("n_after") > 0)
    return t.select(
        "day",
        "n_before",
        "n_after",
        "mean_before",
        "mean_after",
        (F.floor(F.col("t_raw") * 1e6) / 1e6).alias("t_stat"),
        (F.col("t_raw") == F.max("t_raw").over(wall)).alias("is_best"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# q373: source-concentration audit (Herfindahl index per language)
# ---------------------------------------------------------------------------


@query(
    "q373_herfindahl",
    oracle="""
    WITH ls0 AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY 1, 2
    ),
    ls AS (
      SELECT lang, source, n,
             CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS n_l
      FROM ls0
    ),
    l AS (
      SELECT lang, CAST(max(n_l) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_sources,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list((CAST(n AS DOUBLE) / n_l) * (CAST(n AS DOUBLE) / n_l)
                    ORDER BY source)),
               (a, b) -> a + b) AS hhi
      FROM ls GROUP BY lang
    ),
    top AS (
      SELECT lang, source AS top_source, n AS top_n
      FROM (SELECT lang, source, n,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY n DESC, source DESC) AS rn
            FROM ls)
      WHERE rn = 1
    )
    SELECT l.lang, n_docs, n_sources,
           floor(hhi * 1e6) / 1e6 AS hhi,
           top_source,
           floor(CAST(top_n AS DOUBLE) / n_docs * 1e6) / 1e6 AS top_share
    FROM l JOIN top USING (lang) ORDER BY lang
    """,
)
def q373_herfindahl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-concentration audit per language: the Herfindahl-Hirschman
    index of source shares plus the dominant source and its share — the
    portfolio-risk readout for a training mix ("is my German data all
    one crawl?") that complements q268's mixture weights and q362's
    leave-one-out ablation: HHI near 1 means the LOO delta for the top
    source IS the corpus.  One groupBy to the bounded (lang, source)
    axis; shares are exact integer ratios; the HHI square-sum folds the
    source axis in sorted order (exact-hash gate, no tolerance); the
    top-source pick is a per-lang row_number window on the bounded cell
    table.  Scale: axis-sized everything after one corpus scan."""
    d = table(spark, sf_dir, "documents")
    ls = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wl = Window.partitionBy("lang")
    share = F.col("n").cast("double") / F.sum("n").over(wl)
    shared = ls.select("lang", "source", "n", (share * share).alias("sh2"))
    lagg = shared.groupBy("lang").agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("source", F.col("sh2").alias("v")))
                ),
                lambda s: s["v"],
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias("hhi"),
    )
    wr = Window.partitionBy("lang").orderBy(
        F.col("n").desc(), F.col("source").desc()
    )
    top = (
        ls.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select("lang", F.col("source").alias("top_source"), F.col("n").alias("top_n"))
    )
    return (
        lagg.join(top, "lang")
        .select(
            "lang",
            "n_docs",
            "n_sources",
            (F.floor(F.col("hhi") * 1e6) / 1e6).alias("hhi"),
            "top_source",
            (
                F.floor(F.col("top_n").cast("double") / F.col("n_docs") * 1e6)
                / 1e6
            ).alias("top_share"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q374: grid-bucketed DBSCAN over the embedding 2-D projection
# ---------------------------------------------------------------------------


@query(
    "q374_dbscan",
    oracle="""
    WITH RECURSIVE pts AS (
      SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
             CAST(embedding[2] AS DOUBLE) AS y
      FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM pts a JOIN pts b ON a.vec_id < b.vec_id
      WHERE sqrt(pow(a.x - b.x, 2) + pow(a.y - b.y, 2)) < 0.02
    ),
    sym AS (SELECT id_a, id_b FROM pairs
            UNION ALL SELECT id_b, id_a FROM pairs),
    deg AS (SELECT id_a AS pid, CAST(count(*) AS BIGINT) AS nb
            FROM sym GROUP BY 1),
    roles AS (
      SELECT p.vec_id AS pid, coalesce(nb, 0) + 1 >= 5 AS is_core
      FROM pts p LEFT JOIN deg ON p.vec_id = deg.pid
    ),
    core_edges AS (
      SELECT id_a, id_b FROM pairs
      WHERE id_a IN (SELECT pid FROM roles WHERE is_core)
        AND id_b IN (SELECT pid FROM roles WHERE is_core)
    ),
    cedges AS (SELECT id_a AS a, id_b AS b FROM core_edges
               UNION SELECT id_b, id_a FROM core_edges),
    reach(a, b) AS (
      SELECT DISTINCT a, a FROM cedges
      UNION SELECT r.a, e.b FROM reach r JOIN cedges e ON r.b = e.a
    ),
    comp AS (SELECT a AS pid, min(b) AS cluster_id FROM reach GROUP BY a),
    core_labeled AS (
      SELECT r.pid, CAST(coalesce(c.cluster_id, r.pid) AS BIGINT)
               AS cluster_id
      FROM roles r LEFT JOIN comp c USING (pid) WHERE r.is_core
    ),
    border AS (
      SELECT r.pid, CAST(min(cl.cluster_id) AS BIGINT) AS cluster_id
      FROM roles r JOIN sym s ON r.pid = s.id_a
           JOIN core_labeled cl ON s.id_b = cl.pid
      WHERE NOT r.is_core GROUP BY r.pid
    )
    SELECT pid AS id, 'core' AS role, cluster_id FROM core_labeled
    UNION ALL SELECT pid, 'border', cluster_id FROM border
    UNION ALL
    SELECT r.pid, 'noise', CAST(NULL AS BIGINT) FROM roles r
    WHERE NOT r.is_core AND r.pid NOT IN (SELECT pid FROM border)
    ORDER BY id
    """,
)
def q374_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN density clustering of the embedding (dim1, dim2)
    projection, eps=0.02, minPts=5 — the arbitrary-shape/noise-aware
    clustering family next to k-means (q166, centroid-convex) and the
    label-driven audits (q370): find dense regions, label the sparse
    rest as noise.  operators/spatial.dbscan composes two existing
    scale primitives instead of porting the textbook recursion: the 3x3
    grid-cell radius join supplies epsilon-neighborhoods (per-point cost
    bounded by local density, AQE-splittable) and large-star/small-star
    CC (dedup.dup_clusters_star) merges core points — a DBSCAN cluster
    IS a connected component of cores plus borders.  Border points join
    their MINIMUM core neighbor's cluster (plain DBSCAN is
    order-dependent there; the min makes both engines agree exactly).
    The oracle brute-forces neighborhoods and replays CC as a recursive
    CTE (fine at 500 points; the operator is the scale path)."""
    from .operators.spatial import dbscan

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
    )
    return dbscan(e, "vec_id", "x", "y", eps=0.02, min_pts=5).orderBy("id")


# ---------------------------------------------------------------------------
# q375: SPRT sequential conversion-rate monitor over the day axis
# ---------------------------------------------------------------------------


@query(
    "q375_sprt_monitor",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n_d,
             CAST(sum(CASE WHEN value > 50.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS k_d
      FROM events GROUP BY 1
    ),
    c AS (
      SELECT day,
             CAST(sum(n_d) OVER (ORDER BY day) AS BIGINT) AS n_cum,
             CAST(sum(k_d) OVER (ORDER BY day) AS BIGINT) AS k_cum
      FROM d
    ),
    llr AS (
      SELECT day, n_cum, k_cum,
             k_cum * ln(0.55 / 0.45)
               + (n_cum - k_cum) * ln(0.45 / 0.55) AS llr
      FROM c
    ),
    dec AS (
      SELECT *,
             CASE WHEN llr >= ln(19.0) THEN 'accept_h1'
                  WHEN llr <= -ln(19.0) THEN 'accept_h0'
                  ELSE 'continue' END AS decision
      FROM llr
    ),
    firstx AS (
      SELECT min(day) AS d0 FROM dec WHERE decision != 'continue'
    )
    SELECT day, n_cum, k_cum,
           floor(llr * 1e6) / 1e6 AS llr,
           decision,
           (decision != 'continue' AND day = d0) AS is_decision_day
    FROM dec CROSS JOIN firstx ORDER BY day
    """,
)
def q375_sprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT sequential monitor of the conversion rate (value > 50):
    H0 p=0.45 vs H1 p=0.55, alpha=beta=0.05 — the always-valid
    stop-early readout a metrics platform runs DAILY instead of waiting
    for the fixed-horizon tests (q365-q368): cross ln(19) accept H1,
    cross -ln(19) accept H0, else keep collecting.  The corpus reduces
    to per-day integer (n, conversions) cells; the LLR is
    k*ln(p1/p0) + (n-k)*ln((1-p1)/(1-p0)) on exact cumulative int64
    counts — two products and a sum per day, bit-identical cross-engine
    (the ln convention).  First-crossing flag via min-day over the
    bounded day axis (PLANLINT sp-allowed).  Note 1-p1 = p0 here so the
    two log terms are symmetric — the classic balanced design."""
    ev = load_events(spark, sf_dir)
    d = ev.select(
        F.col("ts").cast("date").alias("day"),
        F.when(F.col("value") > 50.0, 1).otherwise(0).alias("k"),
    ).groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_d"),
        F.sum("k").cast("bigint").alias("k_d"),
    )
    wc = Window.orderBy("day")
    c = d.select(
        "day",
        F.sum("n_d").over(wc).cast("bigint").alias("n_cum"),
        F.sum("k_d").over(wc).cast("bigint").alias("k_cum"),
    )
    llr = (
        F.col("k_cum") * F.log(F.lit(0.55) / F.lit(0.45))
        + (F.col("n_cum") - F.col("k_cum")) * F.log(F.lit(0.45) / F.lit(0.55))
    )
    a_bound = F.log(F.lit(19.0))
    dec = c.select(
        "day",
        "n_cum",
        "k_cum",
        llr.alias("llr_raw"),
        F.when(llr >= a_bound, F.lit("accept_h1"))
        .when(llr <= -a_bound, F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
    )
    firstx = dec.filter(F.col("decision") != "continue").agg(
        F.min("day").alias("d0")
    )
    return (
        dec.crossJoin(F.broadcast(firstx))
        .select(
            "day",
            "n_cum",
            "k_cum",
            (F.floor(F.col("llr_raw") * 1e6) / 1e6).alias("llr"),
            "decision",
            (
                (F.col("decision") != "continue")
                & (F.col("day") == F.col("d0"))
            ).alias("is_decision_day"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# q376: jackknife (leave-one-source-out) variance of the corpus mean
# ---------------------------------------------------------------------------


@query(
    "q376_jackknife",
    oracle="""
    WITH g AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(n_chars) AS BIGINT) AS s_g
      FROM documents GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(n_g) AS BIGINT) AS nt, CAST(sum(s_g) AS BIGINT) AS st,
             CAST(count(*) AS BIGINT) AS gk
      FROM g
    ),
    theta AS (
      SELECT source, n_g,
             CAST(st - s_g AS DOUBLE) / (nt - n_g) AS theta_i
      FROM g CROSS JOIN tot
    ),
    jbar AS (
      SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                      list(theta_i ORDER BY source)),
                         (a, b) -> a + b)
             / (SELECT gk FROM tot) AS theta_bar
      FROM theta
    ),
    var_j AS (
      SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list((theta_i - theta_bar) * (theta_i - theta_bar)
                    ORDER BY source)),
               (a, b) -> a + b)
             * (SELECT gk - 1 FROM tot) / (SELECT gk FROM tot) AS v
      FROM theta CROSS JOIN jbar
    )
    SELECT source, n_g AS n_docs,
           floor(theta_i * 1e6) / 1e6 AS loo_mean_chars,
           floor((theta_i - theta_bar) * 1e6) / 1e6 AS dev_from_jack_mean,
           floor(sqrt(v) * 1e6) / 1e6 AS jackknife_se
    FROM theta CROSS JOIN jbar CROSS JOIN var_j
    ORDER BY source
    """,
)
def q376_jackknife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-GROUP jackknife over sources: the variance certificate
    for q362's leave-one-out ablation — q362 reports each source's LOO
    delta; this turns the same g leave-one-out estimates into a standard
    error, var_jack = (g-1)/g * sum((theta_i - theta_bar)^2), the honest
    uncertainty on the corpus mean chars-per-doc under source-level
    dependence (documents within a crawl source are NOT iid, so the iid
    SE lies; the grouped jackknife doesn't).  All theta_i are ratios of
    exact int64 sums; the two cross-source folds run sorted (bounded
    source axis) — exact-hash green.  Scale: one corpus scan to the
    source axis, then axis-sized scalar algebra."""
    d = table(spark, sf_dir, "documents")
    g = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("n_chars").cast("bigint").alias("s_g"),
    )
    tot = g.agg(
        F.sum("n_g").cast("bigint").alias("nt"),
        F.sum("s_g").cast("bigint").alias("st"),
        F.count(F.lit(1)).cast("bigint").alias("gk"),
    )
    theta = g.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_g",
        "gk",
        (
            (F.col("st") - F.col("s_g")).cast("double")
            / (F.col("nt") - F.col("n_g"))
        ).alias("theta_i"),
    )
    jbar = theta.agg(
        (
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("source", F.col("theta_i").alias("v"))
                        )
                    ),
                    lambda s: s["v"],
                ),
                F.lit(0.0),
                lambda a, b: a + b,
            )
            / F.max("gk")
        ).alias("theta_bar")
    )
    dev = theta.crossJoin(F.broadcast(jbar))
    var_j = dev.agg(
        (
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "source",
                                (
                                    (F.col("theta_i") - F.col("theta_bar"))
                                    * (F.col("theta_i") - F.col("theta_bar"))
                                ).alias("v"),
                            )
                        )
                    ),
                    lambda s: s["v"],
                ),
                F.lit(0.0),
                lambda a, b: a + b,
            )
            * (F.max("gk") - 1)
            / F.max("gk")
        ).alias("v")
    )
    return (
        dev.crossJoin(F.broadcast(var_j))
        .select(
            "source",
            F.col("n_g").alias("n_docs"),
            (F.floor(F.col("theta_i") * 1e6) / 1e6).alias("loo_mean_chars"),
            (
                F.floor((F.col("theta_i") - F.col("theta_bar")) * 1e6) / 1e6
            ).alias("dev_from_jack_mean"),
            (F.floor(F.sqrt(F.col("v")) * 1e6) / 1e6).alias("jackknife_se"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q377: exact 1-Wasserstein + KS between the two arms
# ---------------------------------------------------------------------------


@query(
    "q377_wasserstein",
    oracle=f"""
    WITH v AS (
      SELECT CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS arm,
             {_CENTS} AS v
      FROM events
    ),
    per AS (
      SELECT v, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(arm) AS BIGINT) AS cnt1
      FROM v GROUP BY 1
    ),
    c AS (
      SELECT v, cnt - cnt1 AS cnt0, cnt1,
             CAST(sum(cnt - cnt1) OVER (ORDER BY v) AS BIGINT) AS cum0,
             CAST(sum(cnt1) OVER (ORDER BY v) AS BIGINT) AS cum1,
             lead(v) OVER (ORDER BY v) AS next_v
      FROM per
    ),
    tot AS (
      SELECT CAST(sum(cnt - cnt1) AS BIGINT) AS n0,
             CAST(sum(cnt1) AS BIGINT) AS n1
      FROM per
    ),
    s AS (
      SELECT CAST(sum(abs(cum0 * n1 - cum1 * n0)
                       * coalesce(next_v - v, 0)) AS BIGINT) AS w1num,
             CAST(max(abs(cum0 * n1 - cum1 * n0)) AS BIGINT) AS ksnum
      FROM c CROSS JOIN tot
    )
    SELECT n0, n1,
           floor(CAST(w1num AS DOUBLE) / (CAST(n0 AS DOUBLE) * n1)
                 / 100.0 * 1e6) / 1e6 AS w1,
           floor(CAST(ksnum AS DOUBLE) / (CAST(n0 AS DOUBLE) * n1)
                 * 1e6) / 1e6 AS ks_stat
    FROM s CROSS JOIN tot
    """,
)
def q377_wasserstein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact earth-mover (1-Wasserstein) distance plus the KS statistic
    between the user-parity arms' value distributions — the
    transport-cost member of the drift family (PSI q239 counts bin
    moves; KS q237 takes the worst CDF gap; W1 weighs HOW FAR the mass
    traveled, the metric that actually orders 'small shift everywhere'
    vs 'one bin teleported').  operators/hypothesis.wasserstein_ks: on
    the cent lattice both statistics have EXACT int64 numerators
    (|cum0*n1 - cum1*n0|, summed times integer gaps), so no float fold
    discipline is needed at all.  The distinct-value axis is bounded by
    value RANGE, not corpus size; cumulatives and the next-value lookup
    ride the two-phase global_cumsum / global_row_number primitives —
    no single-partition window."""
    ev = load_events(spark, sf_dir)
    from .operators.hypothesis import wasserstein_ks

    return wasserstein_ks(ev, "user_id", "value")


# ---------------------------------------------------------------------------
# q378: AMS second-frequency-moment sketch with exact-error audit
# ---------------------------------------------------------------------------

_AMS_K = 16


def _ams_oracle() -> str:
    signs = ", ".join(
        f"CAST(CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || '#s{j}'),"
        f" 32, 1)) AS UBIGINT) % 2 AS BIGINT) * 2 - 1 AS s{j}"
        for j in range(_AMS_K)
    )
    ests = ", ".join(
        f"CAST(sum(s{j} * f) AS BIGINT) AS z{j}" for j in range(_AMS_K)
    )
    sq = ", ".join(f"z{j} * z{j}" for j in range(_AMS_K))
    return f"""
    WITH f AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS f
      FROM events GROUP BY 1
    ),
    s AS (SELECT user_id, f, {signs} FROM f),
    z AS (
      SELECT CAST(sum(f) AS BIGINT) AS n_events,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(f * f) AS BIGINT) AS f2_exact,
             {ests}
      FROM s
    ),
    m AS (
      SELECT n_events, n_users, f2_exact,
             list_sort([{sq}]) AS sq
      FROM z
    )
    SELECT n_events, n_users, f2_exact,
           (CAST(sq[{_AMS_K // 2}] AS DOUBLE)
            + CAST(sq[{_AMS_K // 2 + 1}] AS DOUBLE)) / 2.0 AS f2_est,
           floor(abs((CAST(sq[{_AMS_K // 2}] AS DOUBLE)
                      + CAST(sq[{_AMS_K // 2 + 1}] AS DOUBLE)) / 2.0
                     - f2_exact)
                 / f2_exact * 1e6) / 1e6 AS rel_err
    FROM m
    """


@query("q378_ams_f2_sketch", oracle=_ams_oracle())
def q378_ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS (Alon-Matias-Szegedy) second-frequency-moment sketch of the
    per-user event counts, with the exact F2 computed alongside as an
    in-query error audit — completing the sketch shelf (HLL
    cardinality, count-min point queries q332, Misra-Gries heavy
    hitters q340, Bloom membership q242): F2 = sum f_u^2 is the
    self-join size / skew indicator, and the AMS estimator is its
    mergeable one-pass form.  Each of the 16 estimators is
    (sum_u s_j(u) * f_u)^2 with s_j the +-1 md5 coin — EXACT int64 all
    the way (signs are ints, counts are ints), so even the median (mean
    of the two middle order statistics, a .5-lattice value) replays
    bit-identically; the only division is the relative-error display.
    Scale: one groupBy to per-user counts, then a single 16-sum
    aggregate — map-side partial, O(1) rows out; the estimator sums are
    exactly what you'd merge across partitions/streams."""
    ev = load_events(spark, sf_dir)
    f = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("bigint").alias("f"))

    def sign(j: int):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("user_id").cast("string"), F.lit(f"#s{j}")
                        )
                    ),
                    32,
                    1,
                ),
                16,
                10,
            ).cast("bigint")
            % 2
        ) * 2 - 1

    z = f.agg(
        F.sum("f").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(F.col("f") * F.col("f")).cast("bigint").alias("f2_exact"),
        *[
            F.sum(sign(j) * F.col("f")).cast("bigint").alias(f"z{j}")
            for j in range(_AMS_K)
        ],
    )
    sq = F.array_sort(
        F.array(*[F.col(f"z{j}") * F.col(f"z{j}") for j in range(_AMS_K)])
    )
    est = (
        F.element_at(sq, _AMS_K // 2).cast("double")
        + F.element_at(sq, _AMS_K // 2 + 1).cast("double")
    ) / 2.0
    return z.select(
        "n_events",
        "n_users",
        "f2_exact",
        est.alias("f2_est"),
        (
            F.floor(
                F.abs(est - F.col("f2_exact")) / F.col("f2_exact") * 1e6
            )
            / 1e6
        ).alias("rel_err"),
    )


# ---------------------------------------------------------------------------
# q379: SPRT monitor fed by a REAL streaming aggregation
# ---------------------------------------------------------------------------


@query(
    "q379_stream_sprt",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n_d,
             CAST(sum(CASE WHEN value > 50.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS k_d
      FROM events GROUP BY 1
    ),
    c AS (
      SELECT day,
             CAST(sum(n_d) OVER (ORDER BY day) AS BIGINT) AS n_cum,
             CAST(sum(k_d) OVER (ORDER BY day) AS BIGINT) AS k_cum
      FROM d
    )
    SELECT day, n_cum, k_cum,
           floor((k_cum * ln(0.55 / 0.45)
                  + (n_cum - k_cum) * ln(0.45 / 0.55)) * 1e6) / 1e6 AS llr,
           CASE WHEN k_cum * ln(0.55 / 0.45)
                     + (n_cum - k_cum) * ln(0.45 / 0.55) >= ln(19.0)
                THEN 'accept_h1'
                WHEN k_cum * ln(0.55 / 0.45)
                     + (n_cum - k_cum) * ln(0.45 / 0.55) <= -ln(19.0)
                THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM c ORDER BY day
    """,
)
def q379_stream_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q375's SPRT monitor with its data-reduction stage executed as a
    REAL Structured Streaming query: readStream -> watermark -> per-day
    (trials, conversions) aggregation -> availableNow into a memory
    sink; the LLR walk and Wald decisions then run on the bounded
    day-axis sink output.  This is the deployment shape of sequential
    testing — the stream maintains ONLY per-day integer cells in state
    (bounded by the day axis, trimmed by the watermark), and the
    O(days) decision algebra replays identically every trigger.
    Batch parity is the oracle: the same SQL that checks q375's
    fixed-horizon cells checks the streaming cells — exact, because
    the state is integer counts."""
    from .streaming import ops as st

    from .catalog_rank import _stream_events

    stream = _stream_events(spark, sf_dir)
    per_day = (
        stream.withWatermark("ts", "48 hours")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_d"),
            F.sum(F.when(F.col("value") > 50.0, 1).otherwise(0))
            .cast("bigint")
            .alias("k_d"),
        )
        .select(F.col("w.start").cast("date").alias("day"), "n_d", "k_d")
    )
    cells = st.run_available_now(per_day, "q379_sink")
    wc = Window.orderBy("day")
    c = cells.select(
        "day",
        F.sum("n_d").over(wc).cast("bigint").alias("n_cum"),
        F.sum("k_d").over(wc).cast("bigint").alias("k_cum"),
    )
    llr = (
        F.col("k_cum") * F.log(F.lit(0.55) / F.lit(0.45))
        + (F.col("n_cum") - F.col("k_cum")) * F.log(F.lit(0.45) / F.lit(0.55))
    )
    a_bound = F.log(F.lit(19.0))
    return c.select(
        "day",
        "n_cum",
        "k_cum",
        (F.floor(llr * 1e6) / 1e6).alias("llr"),
        F.when(llr >= a_bound, F.lit("accept_h1"))
        .when(llr <= -a_bound, F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# q380: small-file compaction planner (bin packing on the manifest)
# ---------------------------------------------------------------------------


@query(
    "q380_compaction_plan",
    oracle="""
    WITH files AS (
      SELECT CAST(o_orderkey // 1000 AS BIGINT) AS file_id,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM orders GROUP BY 1
    ),
    c AS (
      SELECT file_id, n_rows,
             CAST(sum(n_rows) OVER (ORDER BY n_rows DESC, file_id ASC)
                  AS BIGINT) AS cum
      FROM files
    ),
    plan AS (
      SELECT file_id, n_rows,
             CAST(floor((cum - n_rows) / 2000) AS BIGINT) AS bin
      FROM c
    )
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(n_rows) AS BIGINT) AS rows_total,
           floor(CAST(sum(n_rows) AS DOUBLE) / 2000 * 1e6) / 1e6
             AS fill_ratio,
           CAST(min(file_id) AS BIGINT) AS first_file,
           CAST(max(file_id) AS BIGINT) AS last_file
    FROM plan GROUP BY bin ORDER BY bin
    """,
)
def q380_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction (OPTIMIZE) planning: pack a file manifest
    into rewrite bins of ~2000 rows each — the operational companion of
    the manifest/skipping family (q220 builds the per-file stats, q304
    does write-audit-publish; this plans the rewrite that keeps scan
    parallelism healthy once streaming ingestion fragments a table).
    operators/layout.compaction_plan: next-fit over (size DESC, file)
    with the bin boundary as a floor of the GLOBAL prefix sum — the
    prefix rides the two-phase global_cumsum, so planning a
    million-file manifest never single-tasks.  The manifest here is
    data-derived (orders keyspace chunks as 'files', row counts as
    sizes) so the plan is engine-replayable; tests feed the same
    operator the real build_manifest output.  All integers; bins
    overflow by at most one straddling file (the Delta OPTIMIZE
    guarantee)."""
    from .operators.layout import compaction_plan

    o = table(spark, sf_dir, "orders")
    files = o.groupBy(
        (F.col("o_orderkey") / 1000).cast("bigint").alias("file_id")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    plan = compaction_plan(files, "file_id", "n_rows", target=2000)
    return (
        plan.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("size").cast("bigint").alias("rows_total"),
            (
                F.floor(F.sum("size").cast("double") / 2000 * 1e6) / 1e6
            ).alias("fill_ratio"),
            F.min("file").cast("bigint").alias("first_file"),
            F.max("file").cast("bigint").alias("last_file"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# q381: Platt scaling (3 Newton steps on calibration-bin cells)
# ---------------------------------------------------------------------------


def _sig(z):
    return 1.0 / (1.0 + F.exp(-z))


def _platt_fold(expr_alias: str, value):
    """Ordered fold of `value` over the 10 bins (sorted by bin)."""
    return F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct("bin", value.alias("v")))),
            lambda s: s["v"],
        ),
        F.lit(0.0),
        lambda a, b: a + b,
    ).alias(expr_alias)


def _platt_newton_sql(i: int) -> str:
    """One Newton step in DuckDB SQL: state{i} -> state{i+1}."""
    p = f"1.0 / (1.0 + exp(-(a * x + b)))"
    return f"""
    g{i} AS (
      SELECT a, b,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(n * ({p} - y) * x ORDER BY bin)), (u, v) -> u + v) AS g1,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(n * ({p} - y) ORDER BY bin)), (u, v) -> u + v) AS g2,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(n * {p} * (1 - {p}) * x * x ORDER BY bin)),
               (u, v) -> u + v) AS h11,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(n * {p} * (1 - {p}) * x ORDER BY bin)),
               (u, v) -> u + v) AS h12,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(n * {p} * (1 - {p}) ORDER BY bin)), (u, v) -> u + v) AS h22
      FROM cells CROSS JOIN state{i} GROUP BY a, b
    ),
    state{i + 1} AS (
      SELECT a - (h22 * g1 - h12 * g2) / (h11 * h22 - h12 * h12) AS a,
             b - (h11 * g2 - h12 * g1) / (h11 * h22 - h12 * h12) AS b
      FROM g{i}
    )"""


def _platt_oracle() -> str:
    steps = ",".join(_platt_newton_sql(i) for i in range(3))
    return f"""
    WITH scored AS (
      SELECT CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || '#score'),
                   1, 8)) AS UBIGINT) / 4294967296.0
             + CASE WHEN value > 50.0 THEN 0.15 ELSE 0.0 END AS score,
             CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS label
      FROM events
    ),
    cells AS (
      SELECT least(9, CAST(floor(score / 1.15 * 10) AS INT)) AS bin,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(label) AS BIGINT) AS pos,
             (least(9, CAST(floor(score / 1.15 * 10) AS INT)) + 0.5) / 10.0
               * 1.15 AS x,
             CAST(sum(label) AS DOUBLE) / count(*) AS y
      FROM scored GROUP BY 1
    ),
    state0 AS (SELECT CAST(1.0 AS DOUBLE) AS a, CAST(0.0 AS DOUBLE) AS b),
    {steps}
    SELECT bin, n, pos,
           floor(x * 1e6) / 1e6 AS bin_center,
           floor(y * 1e6) / 1e6 AS pos_rate,
           floor((1.0 / (1.0 + exp(-(a * x + b)))) * 1e6) / 1e6
             AS platt_rate,
           floor(a * 1e6) / 1e6 AS platt_a,
           floor(b * 1e6) / 1e6 AS platt_b
    FROM cells CROSS JOIN state3 ORDER BY bin
    """


@query("q381_platt_scaling", oracle=_platt_oracle())
def q381_platt_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Platt scaling — fit sigma(a*score + b) to the classifier's
    calibration bins by three unrolled Newton steps — the PARAMETRIC
    calibrator next to q339's isotonic (PAVA) and q261's reliability
    diagram: two parameters instead of a step function, monotone by
    construction, stable on few positives.  The distributed-training
    pattern mirrors q369's GBDT: the corpus reduces ONCE to 10 integer
    calibration cells (q288's md5 score fixture), and every Newton
    iteration is gradient/Hessian folds over the SORTED bounded bin
    axis with a 2x2 Cramer solve — a 1-row state frame joined back by
    scalar broadcast, three lazy stages, no driver loop, no re-scan.
    Exact-hash green: cells are integers, folds are ordered, the solve
    is a fixed scalar dag."""
    ev = load_events(spark, sf_dir)
    score = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("event_id").cast("string"), F.lit("#score"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        / 4294967296.0
        + F.when(F.col("value") > 50.0, 0.15).otherwise(0.0)
    )
    scored = ev.select(
        score.alias("score"),
        F.when(F.col("value") > 50.0, 1).otherwise(0).alias("label"),
    )
    binc = F.least(F.lit(9), F.floor(F.col("score") / 1.15 * 10).cast("int"))
    cells = (
        scored.select(binc.alias("bin"), "label")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("label").cast("bigint").alias("pos"),
        )
        .select(
            "bin",
            "n",
            "pos",
            ((F.col("bin") + 0.5) / 10.0 * 1.15).alias("x"),
            (F.col("pos").cast("double") / F.col("n")).alias("y"),
        )
    )
    from .operators.cache import persist_tracked

    cells = persist_tracked(cells)
    # the (1.0, 0.0) Newton start as a 1-row AGGREGATE of the cached
    # cell table (not spark.range/createDataFrame): the plan lint's
    # bnlj-scalar heuristic recognizes Aggregate broadcast subtrees as
    # scalar attachments, and the agg costs one pass over 10 cached rows
    state = cells.agg(
        F.max(F.lit(1.0)).alias("a"), F.max(F.lit(0.0)).alias("b")
    )
    for _ in range(3):
        p = _sig(F.col("a") * F.col("x") + F.col("b"))
        g = (
            cells.crossJoin(F.broadcast(state))
            .groupBy("a", "b")
            .agg(
                _platt_fold("g1", F.col("n") * (p - F.col("y")) * F.col("x")),
                _platt_fold("g2", F.col("n") * (p - F.col("y"))),
                _platt_fold(
                    "h11", F.col("n") * p * (1 - p) * F.col("x") * F.col("x")
                ),
                _platt_fold("h12", F.col("n") * p * (1 - p) * F.col("x")),
                _platt_fold("h22", F.col("n") * p * (1 - p)),
            )
        )
        det = F.col("h11") * F.col("h22") - F.col("h12") * F.col("h12")
        state = g.select(
            (
                F.col("a")
                - (F.col("h22") * F.col("g1") - F.col("h12") * F.col("g2")) / det
            ).alias("a"),
            (
                F.col("b")
                - (F.col("h11") * F.col("g2") - F.col("h12") * F.col("g1")) / det
            ).alias("b"),
        )
    fitted = _sig(F.col("a") * F.col("x") + F.col("b"))
    return (
        cells.crossJoin(F.broadcast(state))
        .select(
            "bin",
            "n",
            "pos",
            (F.floor(F.col("x") * 1e6) / 1e6).alias("bin_center"),
            (F.floor(F.col("y") * 1e6) / 1e6).alias("pos_rate"),
            (F.floor(fitted * 1e6) / 1e6).alias("platt_rate"),
            (F.floor(F.col("a") * 1e6) / 1e6).alias("platt_a"),
            (F.floor(F.col("b") * 1e6) / 1e6).alias("platt_b"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# q382: sample-size / power calculator from measured variance
# ---------------------------------------------------------------------------


@query(
    "q382_power_analysis",
    oracle=f"""
    WITH m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum({_CENTS}) AS BIGINT) AS s,
             CAST(sum({_CENTS} * {_CENTS}) AS BIGINT) AS ss
      FROM events
    ),
    sd AS (
      SELECT n, s,
             sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1))
               AS sd_c
      FROM m
    ),
    grid AS (SELECT CAST(unnest([0.01, 0.02, 0.05, 0.10, 0.20]) AS DOUBLE) AS rel_effect)
    SELECT rel_effect,
           floor(sd_c / 100.0 * 1e6) / 1e6 AS sd_value,
           floor(rel_effect * (CAST(s AS DOUBLE) / n) / 100.0 * 1e6) / 1e6
             AS abs_effect,
           CAST(ceil(2.0 * (1.959964 + 0.841621) * (1.959964 + 0.841621)
                     * (sd_c * sd_c)
                     / ((rel_effect * (CAST(s AS DOUBLE) / n))
                        * (rel_effect * (CAST(s AS DOUBLE) / n))))
                AS BIGINT) AS n_per_arm
    FROM sd CROSS JOIN grid ORDER BY rel_effect
    """,
)
def q382_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-size planning from MEASURED variance: for a grid of relative
    effect sizes, the per-arm n needed at alpha=0.05 (two-sided),
    power=0.80 — n = 2(z_a + z_b)^2 sd^2 / delta^2 — the experiment-
    design front door to the testing battery (q365-q368 tell you what
    happened; this tells you how long to run the next one, with sd taken
    from THIS corpus, not a guess).  Variance comes from exact integer
    cent sums in one pass; the grid is a 5-row literal; z constants are
    shared literals.  All axis-sized after one scan."""
    ev = load_events(spark, sf_dir)
    from .operators.hypothesis import cents

    m = ev.select(cents(F.col("value")).alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("s"),
        F.sum(F.col("v") * F.col("v")).cast("bigint").alias("ss"),
    )
    sd_c = F.sqrt(
        (
            F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s") / F.col("n")
        )
        / (F.col("n") - 1)
    )
    grid = _lrd(spark, 
        [(0.01,), (0.02,), (0.05,), (0.10,), (0.20,)], ["rel_effect"]
    )
    zsum = 1.959964 + 0.841621
    eff = F.col("rel_effect") * (F.col("s").cast("double") / F.col("n"))
    return (
        grid.crossJoin(F.broadcast(m))
        .select(
            "rel_effect",
            (F.floor(sd_c / 100.0 * 1e6) / 1e6).alias("sd_value"),
            (F.floor(eff / 100.0 * 1e6) / 1e6).alias("abs_effect"),
            F.ceil(2.0 * zsum * zsum * (sd_c * sd_c) / (eff * eff))
            .cast("bigint")
            .alias("n_per_arm"),
        )
        .orderBy("rel_effect")
    )


# ---------------------------------------------------------------------------
# q383: IPW + stratified ATE under planted confounding
# ---------------------------------------------------------------------------


@query(
    "q383_ipw_ate",
    oracle=f"""
    WITH u AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev,
             CAST(sum({_CENTS}) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    x AS (
      SELECT user_id, y,
             CASE WHEN n_ev < 60 THEN 0 WHEN n_ev < 73 THEN 1 ELSE 2 END
               AS stratum,
             CASE WHEN n_ev < 60 THEN 0.2 WHEN n_ev < 73 THEN 0.5
                  ELSE 0.8 END AS p
      FROM u
    ),
    t AS (
      SELECT *,
             CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)
                        || '#treat'), 1, 8)) AS UBIGINT) / 4294967296.0 < p
                  THEN 1 ELSE 0 END AS treat
      FROM x
    ),
    s AS (
      SELECT stratum, max(p) AS p,
             CAST(count(*) AS BIGINT) AS n_s,
             CAST(sum(treat) AS BIGINT) AS nt_s,
             CAST(sum(treat * y) AS BIGINT) AS yt_s,
             CAST(sum((1 - treat) * y) AS BIGINT) AS yc_s
      FROM t GROUP BY 1
    ),
    agg AS (
      SELECT CAST(sum(n_s) AS BIGINT) AS n,
             CAST(sum(nt_s) AS BIGINT) AS nt,
             CAST(sum(yt_s) AS BIGINT) AS yt,
             CAST(sum(yc_s) AS BIGINT) AS yc,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list((CAST(n_s AS DOUBLE) / (SELECT sum(n_s) FROM s))
                    * (CAST(yt_s AS DOUBLE) / nt_s
                       - CAST(yc_s AS DOUBLE) / (n_s - nt_s))
                    ORDER BY stratum)), (a, b) -> a + b) AS strat_ate_c,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(CAST(yt_s AS DOUBLE) / p ORDER BY stratum)),
               (a, b) -> a + b) AS ipw_yt,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(CAST(nt_s AS DOUBLE) / p ORDER BY stratum)),
               (a, b) -> a + b) AS ipw_nt,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(CAST(yc_s AS DOUBLE) / (1 - p) ORDER BY stratum)),
               (a, b) -> a + b) AS ipw_yc,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(CAST(n_s - nt_s AS DOUBLE) / (1 - p) ORDER BY stratum)),
               (a, b) -> a + b) AS ipw_nc
      FROM s
    )
    SELECT s.stratum, s.n_s, s.nt_s,
           floor(s.p * 1e6) / 1e6 AS propensity,
           floor(CAST(s.yt_s AS DOUBLE) / s.nt_s / 100.0 * 1e6) / 1e6
             AS mean_y_treated,
           floor(CAST(s.yc_s AS DOUBLE) / (s.n_s - s.nt_s) / 100.0 * 1e6)
             / 1e6 AS mean_y_control,
           floor((CAST(yt AS DOUBLE) / nt - CAST(yc AS DOUBLE) / (n - nt))
                 / 100.0 * 1e6) / 1e6 AS naive_diff,
           floor((ipw_yt / ipw_nt - ipw_yc / ipw_nc) / 100.0 * 1e6) / 1e6
             AS ipw_ate,
           floor(strat_ate_c / 100.0 * 1e6) / 1e6 AS stratified_ate
    FROM s CROSS JOIN agg ORDER BY s.stratum
    """,
)
def q383_ipw_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity weighting + stratification under PLANTED
    confounding — the observational-causal member of the experimentation
    family (q234 CUPED and q349 DiD assume clean assignment; this is
    what you run when assignment wasn't random): treatment probability
    rises with user activity (0.2/0.5/0.8 by activity stratum, md5
    coin), outcome is total user spend — so the NAIVE treated-control
    difference is strongly positive by construction while the true
    effect is exactly zero (treatment never touches outcomes).  The
    readout shows naive_diff biased and both the Hajek IPW estimate
    (known propensities) and the stratified ATE collapsing toward zero
    — the textbook deconfounding demo, engine-replayable.  All
    estimators are built from per-stratum exact int64 (y, n) sums with
    sorted folds over the 3-stratum axis; one corpus scan to user
    level, then axis-sized algebra."""
    ev = load_events(spark, sf_dir)
    from .operators.hypothesis import cents

    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ev"),
        F.sum(cents(F.col("value"))).cast("bigint").alias("y"),
    )
    stratum = (
        F.when(F.col("n_ev") < 60, 0).when(F.col("n_ev") < 73, 1).otherwise(2)
    )
    p = (
        F.when(F.col("n_ev") < 60, 0.2)
        .when(F.col("n_ev") < 73, 0.5)
        .otherwise(0.8)
    )
    coin = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit("#treat"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        / 4294967296.0
    )
    t = u.select(
        "y",
        stratum.alias("stratum"),
        p.alias("p"),
        F.when(coin < p, 1).otherwise(0).alias("treat"),
    )
    s = t.groupBy("stratum").agg(
        F.max("p").alias("p"),
        F.count(F.lit(1)).cast("bigint").alias("n_s"),
        F.sum("treat").cast("bigint").alias("nt_s"),
        F.sum(F.col("treat") * F.col("y")).cast("bigint").alias("yt_s"),
        F.sum((1 - F.col("treat")) * F.col("y")).cast("bigint").alias("yc_s"),
    )
    from .operators.cache import persist_tracked

    s = persist_tracked(s)

    def fold(alias, value):
        return F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("stratum", value.alias("v")))),
                lambda r: r["v"],
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias(alias)

    ntot = s.agg(F.sum("n_s").cast("bigint").alias("n_all"))
    s2 = s.crossJoin(F.broadcast(ntot))
    agg = s2.agg(
        F.max("n_all").alias("n"),
        F.sum("nt_s").cast("bigint").alias("nt"),
        F.sum("yt_s").cast("bigint").alias("yt"),
        F.sum("yc_s").cast("bigint").alias("yc"),
        fold(
            "strat_ate_c",
            (F.col("n_s").cast("double") / F.col("n_all"))
            * (
                F.col("yt_s").cast("double") / F.col("nt_s")
                - F.col("yc_s").cast("double") / (F.col("n_s") - F.col("nt_s"))
            ),
        ),
        fold("ipw_yt", F.col("yt_s").cast("double") / F.col("p")),
        fold("ipw_nt", F.col("nt_s").cast("double") / F.col("p")),
        fold("ipw_yc", F.col("yc_s").cast("double") / (1 - F.col("p"))),
        fold(
            "ipw_nc",
            (F.col("n_s") - F.col("nt_s")).cast("double") / (1 - F.col("p")),
        ),
    )
    naive = (
        F.col("yt").cast("double") / F.col("nt")
        - F.col("yc").cast("double") / (F.col("n") - F.col("nt"))
    )
    ipw = F.col("ipw_yt") / F.col("ipw_nt") - F.col("ipw_yc") / F.col("ipw_nc")
    return (
        s.crossJoin(F.broadcast(agg))
        .select(
            "stratum",
            "n_s",
            "nt_s",
            (F.floor(F.col("p") * 1e6) / 1e6).alias("propensity"),
            (
                F.floor(
                    F.col("yt_s").cast("double") / F.col("nt_s") / 100.0 * 1e6
                )
                / 1e6
            ).alias("mean_y_treated"),
            (
                F.floor(
                    F.col("yc_s").cast("double")
                    / (F.col("n_s") - F.col("nt_s"))
                    / 100.0
                    * 1e6
                )
                / 1e6
            ).alias("mean_y_control"),
            (F.floor(naive / 100.0 * 1e6) / 1e6).alias("naive_diff"),
            (F.floor(ipw / 100.0 * 1e6) / 1e6).alias("ipw_ate"),
            (F.floor(F.col("strat_ate_c") / 100.0 * 1e6) / 1e6).alias(
                "stratified_ate"
            ),
        )
        .orderBy("stratum")
    )


# ---------------------------------------------------------------------------
# q384: Cochran-Mantel-Haenszel stratified association test
# ---------------------------------------------------------------------------


@query(
    "q384_cmh_test",
    oracle=f"""
    WITH s AS (
      SELECT event_type AS stratum,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n1p,
             CAST(sum(CASE WHEN value > 50.0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS np1,
             CAST(sum(CASE WHEN user_id % 2 = 1 AND value > 50.0
                           THEN 1 ELSE 0 END) AS BIGINT) AS n11
      FROM events GROUP BY 1
    ),
    agg AS (
      SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(n11 - CAST(n1p * np1 AS DOUBLE) / n ORDER BY stratum)),
               (a, b) -> a + b) AS dev,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(CAST(n1p AS DOUBLE) * (n - n1p) * np1 * (n - np1)
                    / (CAST(n AS DOUBLE) * n * (n - 1)) ORDER BY stratum)),
               (a, b) -> a + b) AS var
      FROM s
    )
    SELECT stratum, n, n1p, np1, n11,
           floor(CAST(n1p * np1 AS DOUBLE) / n * 1e6) / 1e6 AS expected,
           floor(dev * dev / var * 1e6) / 1e6 AS cmh_stat,
           CAST(1 AS BIGINT) AS dof
    FROM s CROSS JOIN agg ORDER BY stratum
    """,
)
def q384_cmh_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Mantel-Haenszel test: does the user-parity arm associate
    with conversion AFTER controlling for event type — the
    stratified-association complement of q364 (which would confound if
    conversion base rates differ by type) and the TEST-side companion of
    q383's IPW estimation (same stratify-then-pool logic, continuity
    correction omitted and documented).  Per-stratum 2x2 integer cells
    from one scan; CMH = (sum(n11 - E_s))^2 / sum(V_s) with both
    cross-stratum folds sorted — exact-hash green.  Scale: corpus to
    the ~5-stratum axis in one map-side-partial pass."""
    ev = load_events(spark, sf_dir)
    s = ev.groupBy(F.col("event_type").alias("stratum")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1p"),
        F.sum(F.when(F.col("value") > 50.0, 1).otherwise(0))
        .cast("bigint")
        .alias("np1"),
        F.sum(
            F.when((F.col("user_id") % 2 == 1) & (F.col("value") > 50.0), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("n11"),
    )
    from .operators.cache import persist_tracked

    s = persist_tracked(s)

    def fold(alias, value):
        return F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("stratum", value.alias("v")))
                ),
                lambda r: r["v"],
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias(alias)

    e_s = (F.col("n1p") * F.col("np1")).cast("double") / F.col("n")
    v_s = (
        F.col("n1p").cast("double")
        * (F.col("n") - F.col("n1p"))
        * F.col("np1")
        * (F.col("n") - F.col("np1"))
        / (F.col("n").cast("double") * F.col("n") * (F.col("n") - 1))
    )
    agg = s.agg(
        fold("dev", F.col("n11") - e_s), fold("var", v_s)
    )
    return (
        s.crossJoin(F.broadcast(agg))
        .select(
            "stratum",
            "n",
            "n1p",
            "np1",
            "n11",
            (F.floor(e_s * 1e6) / 1e6).alias("expected"),
            (
                F.floor(F.col("dev") * F.col("dev") / F.col("var") * 1e6) / 1e6
            ).alias("cmh_stat"),
            F.lit(1).cast("bigint").alias("dof"),
        )
        .orderBy("stratum")
    )


# ---------------------------------------------------------------------------
# q385: McNemar's paired test between two deterministic quality rules
# ---------------------------------------------------------------------------


@query(
    "q385_mcnemar",
    oracle="""
    WITH r AS (
      SELECT doc_id,
             n_chars >= 500 AS rule_len,
             len(string_split(text, ' ')) >= 80 AS rule_tok
      FROM documents
    ),
    c AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN rule_len AND rule_tok THEN 1 ELSE 0 END)
                  AS BIGINT) AS both_pass,
             CAST(sum(CASE WHEN NOT rule_len AND NOT rule_tok THEN 1
                           ELSE 0 END) AS BIGINT) AS both_fail,
             CAST(sum(CASE WHEN rule_len AND NOT rule_tok THEN 1 ELSE 0 END)
                  AS BIGINT) AS b,
             CAST(sum(CASE WHEN NOT rule_len AND rule_tok THEN 1 ELSE 0 END)
                  AS BIGINT) AS c
      FROM r
    )
    SELECT n, both_pass, both_fail, b, c,
           CASE WHEN b + c = 0 THEN 0.0
                ELSE floor(CAST((b - c) * (b - c) AS DOUBLE) / (b + c) * 1e6)
                     / 1e6 END AS mcnemar_chi2
    FROM c
    """,
)
def q385_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test on PAIRED binary verdicts — do two quality filters
    (char-length vs token-count) disagree systematically on the same
    documents?  The right test when comparing two classifiers on one
    corpus (a two-sample chi2 ignores the pairing and loses power):
    only the DISCORDANT counts b, c matter, chi2 = (b-c)^2/(b+c),
    continuity correction omitted and documented.  One scan to four
    integer cells; the statistic is a fixed dag — exact-hash green.
    Swap in any two of the repo's deterministic classifiers (q315
    hashed-linear, q317 bigram-LM, q355 NB) for the same readout."""
    d = table(spark, sf_dir, "documents")
    r = d.select(
        (F.col("n_chars") >= 500).alias("rule_len"),
        (F.size(F.split(F.col("text"), " ")) >= 80).alias("rule_tok"),
    )
    c = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("rule_len") & F.col("rule_tok"), 1).otherwise(0))
        .cast("bigint")
        .alias("both_pass"),
        F.sum(F.when(~F.col("rule_len") & ~F.col("rule_tok"), 1).otherwise(0))
        .cast("bigint")
        .alias("both_fail"),
        F.sum(F.when(F.col("rule_len") & ~F.col("rule_tok"), 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
        F.sum(F.when(~F.col("rule_len") & F.col("rule_tok"), 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
    )
    stat = F.when(F.col("b") + F.col("c") == 0, F.lit(0.0)).otherwise(
        F.floor(
            ((F.col("b") - F.col("c")) * (F.col("b") - F.col("c")))
            .cast("double")
            / (F.col("b") + F.col("c"))
            * 1e6
        )
        / 1e6
    )
    return c.select(
        "n", "both_pass", "both_fail", "b", "c", stat.alias("mcnemar_chi2")
    )


# ---------------------------------------------------------------------------
# q386: Cohen's kappa of the stopword-vote LID against gold labels
# ---------------------------------------------------------------------------


@query(
    "q386_cohens_kappa",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS uw
      FROM documents
    ), s AS (
      SELECT doc_id, lang,
        len(list_filter(uw, x -> list_contains(['the','a','of','and','to','in','is','it','for','on'], x))) AS s_en,
        len(list_filter(uw, x -> list_contains(['der','die','das','und','ist','von','zu','mit','den','ein'], x))) AS s_de,
        len(list_filter(uw, x -> list_contains(['le','la','les','de','et','un','une','est','pour','dans'], x))) AS s_fr,
        len(list_filter(uw, x -> list_contains(['el','la','los','de','y','un','una','es','para','en'], x))) AS s_es,
        len(list_filter(uw, x -> list_contains(['的','是','了','在','和','有','我','不','人','这'], x))) AS s_zh
      FROM t
    ), p AS (
      SELECT lang AS gold,
             CASE WHEN s_zh = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'zh'
                  WHEN s_fr = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'fr'
                  WHEN s_es = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'es'
                  WHEN s_en = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'en'
                  ELSE 'de' END AS pred
      FROM s
    ),
    cell AS (
      SELECT gold, pred, CAST(count(*) AS BIGINT) AS n
      FROM p GROUP BY 1, 2
    ),
    m AS (
      SELECT CAST(sum(n) AS BIGINT) AS nt,
             CAST(sum(CASE WHEN gold = pred THEN n ELSE 0 END) AS BIGINT)
               AS agree
      FROM cell
    ),
    marg AS (
      SELECT coalesce(g.gold, pr.pred) AS cls,
             coalesce(g.ng, 0) AS ng, coalesce(pr.np, 0) AS np
      FROM (SELECT gold, CAST(sum(n) AS BIGINT) AS ng FROM cell GROUP BY 1) g
      FULL OUTER JOIN
           (SELECT pred, CAST(sum(n) AS BIGINT) AS np FROM cell GROUP BY 1) pr
        ON g.gold = pr.pred
    ),
    pe AS (
      SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(CAST(ng AS DOUBLE) * np ORDER BY cls)),
               (a, b) -> a + b) AS pe_num
      FROM marg
    )
    SELECT cell.gold, cell.pred, cell.n,
           floor(CAST(agree AS DOUBLE) / nt * 1e6) / 1e6 AS po,
           floor(pe_num / (CAST(nt AS DOUBLE) * nt) * 1e6) / 1e6 AS pe,
           floor((CAST(agree AS DOUBLE) / nt
                  - pe_num / (CAST(nt AS DOUBLE) * nt))
                 / (1 - pe_num / (CAST(nt AS DOUBLE) * nt)) * 1e6) / 1e6
             AS kappa
    FROM cell CROSS JOIN m CROSS JOIN pe ORDER BY gold, pred
    """,
)
def q386_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa of the stopword-vote language classifier (q79,
    operators/text.language_id) against the gold ``lang`` labels —
    chance-corrected agreement, the honest upgrade of raw accuracy when
    class priors are skewed (a majority-class guesser scores high
    accuracy but kappa ~ 0).  The full confusion matrix rides one
    groupBy; po is the integer agreement ratio, pe the sorted fold of
    marginal products over the bounded class axis, kappa a fixed scalar
    dag — exact-hash green.  Scale: one corpus scan to the k x k
    confusion cells (k = 5 languages); marginals and folds are
    axis-sized."""
    from .operators import text as tx

    d = table(spark, sf_dir, "documents")
    pred = tx.language_id(d, "doc_id", "text").select(
        "doc_id", F.col("pred_lang").alias("pred")
    )
    p = d.select("doc_id", F.col("lang").alias("gold")).join(pred, "doc_id")
    cell = p.groupBy("gold", "pred").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    from .operators.cache import persist_tracked

    cell = persist_tracked(cell)
    m = cell.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum(F.when(F.col("gold") == F.col("pred"), F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("agree"),
    )
    g = cell.groupBy("gold").agg(F.sum("n").cast("bigint").alias("ng"))
    pr = cell.groupBy("pred").agg(F.sum("n").cast("bigint").alias("np"))
    marg = (
        g.join(pr, g.gold == pr.pred, "full")
        .select(
            F.coalesce(F.col("gold"), F.col("pred")).alias("cls"),
            F.coalesce(F.col("ng"), F.lit(0)).alias("ng"),
            F.coalesce(F.col("np"), F.lit(0)).alias("np"),
        )
    )
    pe = marg.agg(
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "cls",
                            (F.col("ng").cast("double") * F.col("np")).alias(
                                "v"
                            ),
                        )
                    )
                ),
                lambda r: r["v"],
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias("pe_num")
    )
    po = F.col("agree").cast("double") / F.col("nt")
    pev = F.col("pe_num") / (F.col("nt").cast("double") * F.col("nt"))
    return (
        cell.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(pe))
        .select(
            "gold",
            "pred",
            "n",
            (F.floor(po * 1e6) / 1e6).alias("po"),
            (F.floor(pev * 1e6) / 1e6).alias("pe"),
            (F.floor((po - pev) / (1 - pev) * 1e6) / 1e6).alias("kappa"),
        )
        .orderBy("gold", "pred")
    )
