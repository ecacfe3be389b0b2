"""Distribution-comparison and robust-statistics operators.

The drift family the repo already has (TVD q214) compares histograms; this
module adds the classical *test statistics* a data-quality / model-monitoring
pipeline reports alongside them:

* :func:`ks_2sample` — two-sample Kolmogorov-Smirnov statistic (max ECDF gap),
  computed on *binned* values so the ECDF support is bounded.
* :func:`chi2_independence` — chi-squared statistic + Cramér's V for a
  two-way contingency table.
* :func:`psi` — Population Stability Index over fixed-width bins, the
  standard score-drift monitor.
* :func:`mad_outliers` — robust z-scores from median/MAD (the Iglewicz-
  Hoaglin modified z-score), per group.

Scale posture (all four): the heavy input scan reduces to a tiny keyed
aggregate (bins × groups, contingency cells) *before* any window or join, so
the shuffle payload is bounded by the statistic's support, never by the data.
The only ordered window (`ks_2sample` ECDF cumsum) runs over the bounded bin
axis.  ``mad_outliers`` uses exact interpolated percentiles (== DuckDB
`quantile_cont`); at 100 TB substitute `percentile_approx` and document the
error bound, as q26 does.

Reference parity: the reference exposes describe-style stats only
(`/root/reference/src/table.rs:244-290` hist, `dataframe.rs` aggregates);
this module is net-new capability in the training-data-pipeline direction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "ks_2sample",
    "chi2_independence",
    "psi",
    "mad_outliers",
    "kaplan_meier",
    "mmd2_terms",
    "isotonic_calibrate",
]


def _binned(value: Column, lo: float, hi: float, nbins: int) -> Column:
    """Fixed-width bin index in [0, nbins+1] (width_bucket semantics:
    0 = below lo, nbins+1 = at-or-above hi).  Deterministic, engine-agnostic
    float math — the same expression a DuckDB oracle writes."""
    w = (hi - lo) / nbins
    raw = F.floor((value - F.lit(lo)) / F.lit(w)) + F.lit(1)
    return (
        F.when(value < lo, F.lit(0))
        .when(value >= hi, F.lit(nbins + 1))
        .otherwise(raw)
        .cast("int")
    )


def ks_2sample(
    df: DataFrame,
    value_col: str,
    group_col: Column,
    *,
    lo: float,
    hi: float,
    nbins: int = 1000,
) -> DataFrame:
    """Two-sample KS statistic: ``D = max_x |F_a(x) - F_b(x)|`` where the
    ECDFs are evaluated on ``nbins`` fixed-width bins of ``value_col`` and
    ``group_col`` is a boolean column (true = sample a).

    One row out: ``(ks_stat, n_a, n_b)``.

    Shape: scan → groupBy(bin) partial-agg (bounded at nbins+2 rows) →
    single-partition cumsum window over bins → global max.  The window is
    over the *bin axis*, so its size is fixed regardless of input rows; at
    100 TB only the first aggregate touches data volume.  Binning makes D a
    lower bound of the exact statistic with error ≤ max bin probability —
    the standard streaming/distributed KS trade documented here rather than
    hidden.
    """
    b = df.select(
        _binned(F.col(value_col), lo, hi, nbins).alias("bin"),
        group_col.cast("int").alias("is_a"),
    )
    per_bin = b.groupBy("bin").agg(
        F.sum("is_a").alias("ca"),
        F.sum(1 - F.col("is_a")).alias("cb"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    ecdf = per_bin.select(
        "bin",
        (F.sum("ca").over(w) / F.sum("ca").over(tot)).alias("fa"),
        (F.sum("cb").over(w) / F.sum("cb").over(tot)).alias("fb"),
        F.sum("ca").over(tot).alias("n_a"),
        F.sum("cb").over(tot).alias("n_b"),
    )
    return ecdf.groupBy().agg(
        F.max(F.abs(F.col("fa") - F.col("fb"))).alias("ks_stat"),
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
    )


def chi2_independence(df: DataFrame, row_col: str, col_col: str) -> DataFrame:
    """Pearson chi-squared test of independence on the ``row_col`` ×
    ``col_col`` contingency table, plus Cramér's V effect size and degrees
    of freedom.  One row out: ``(chi2, dof, cramers_v, n)``.

    Shape: one groupBy over the pair (cells), margins derived from the cell
    table by two more tiny aggregates, one broadcast-sized join back.  Cell
    count bounds every post-scan structure; the input scan is the only
    data-volume term.
    """
    cells = df.groupBy(
        F.col(row_col).alias("r"), F.col(col_col).alias("c")
    ).agg(F.count(F.lit(1)).alias("o"))
    rm = cells.groupBy("r").agg(F.sum("o").alias("rn"))
    cm = cells.groupBy("c").agg(F.sum("o").alias("cn"))
    n = cells.groupBy().agg(F.sum("o").alias("n"))
    # complete the table: a (row, col) pair with zero observations still
    # contributes (0 - e)^2 / e — the margin cross-product supplies the
    # missing cells (all post-scan, all bounded by category counts).
    # NULL categories are real categories: the join back to cells is
    # null-safe (a plain ["r","c"] join would zero out a NULL-keyed
    # observed cell while its count stays in the margins, corrupting chi2),
    # and nr/nc count the NULL level explicitly.
    full = (
        rm.crossJoin(cm)
        .alias("m")
        .join(
            cells.alias("x"),
            F.col("m.r").eqNullSafe(F.col("x.r"))
            & F.col("m.c").eqNullSafe(F.col("x.c")),
            "left",
        )
        .select(
            F.col("m.r").alias("r"),
            F.col("m.c").alias("c"),
            F.col("m.rn").alias("rn"),
            F.col("m.cn").alias("cn"),
            F.coalesce(F.col("x.o"), F.lit(0)).alias("o"),
        )
    )
    j = full.crossJoin(F.broadcast(n))
    term = (F.col("o") - F.col("rn") * F.col("cn") / F.col("n")) ** 2 / (
        F.col("rn") * F.col("cn") / F.col("n")
    )
    agg = j.groupBy().agg(
        F.sum(term).alias("chi2"),
        (
            F.count_distinct("r")
            + F.max(F.when(F.col("r").isNull(), 1).otherwise(0))
        ).alias("nr"),
        (
            F.count_distinct("c")
            + F.max(F.when(F.col("c").isNull(), 1).otherwise(0))
        ).alias("nc"),
        F.max("n").alias("n"),
    )
    return agg.select(
        "chi2",
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("bigint").alias("dof"),
        F.sqrt(
            F.col("chi2") / (F.col("n") * F.least(F.col("nr") - 1, F.col("nc") - 1))
        ).alias("cramers_v"),
        F.col("n").cast("bigint").alias("n"),
    )


def psi(
    df: DataFrame,
    value_col: str,
    is_reference: Column,
    *,
    lo: float,
    hi: float,
    nbins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between the reference slice
    (``is_reference`` true) and the current slice, over ``nbins``
    fixed-width bins: ``PSI = Σ (q_i - p_i) · ln(q_i / p_i)`` with
    ``eps``-floored proportions (the conventional guard for empty bins —
    part of the statistic's definition here, so oracles replay it exactly).

    One row out: ``(psi, n_ref, n_cur)``.  Rule of thumb: <0.1 stable,
    0.1-0.25 moderate shift, >0.25 major shift.

    Shape: scan → groupBy(bin) → one bounded aggregate.  No window, no join.
    """
    b = df.select(
        _binned(F.col(value_col), lo, hi, nbins).alias("bin"),
        is_reference.cast("int").alias("is_ref"),
    )
    per_bin = b.groupBy("bin").agg(
        F.sum("is_ref").alias("cr"),
        F.sum(1 - F.col("is_ref")).alias("cc"),
    )
    tot = Window.partitionBy()
    props = per_bin.select(
        F.greatest(F.col("cr") / F.sum("cr").over(tot), F.lit(eps)).alias("p"),
        F.greatest(F.col("cc") / F.sum("cc").over(tot), F.lit(eps)).alias("q"),
        F.sum("cr").over(tot).alias("n_ref"),
        F.sum("cc").over(tot).alias("n_cur"),
    )
    return props.groupBy().agg(
        F.sum((F.col("q") - F.col("p")) * F.log(F.col("q") / F.col("p"))).alias("psi"),
        F.max("n_ref").alias("n_ref"),
        F.max("n_cur").alias("n_cur"),
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    threshold: float = 3.5,
    consistency: float = 1.4826,
    approx: bool = False,
) -> DataFrame:
    """Robust per-group outlier statistics via the modified z-score
    ``0.6745·(x - median) / MAD`` — equivalently ``(x - median) /
    (1.4826·MAD)`` (Iglewicz & Hoaglin): immune to the outliers it hunts,
    unlike mean/stddev fences.

    Returns one row per group: ``(group, med, mad, n, n_outliers,
    max_absz, mad_zero)``.

    Two exact-percentile passes (median, then median of absolute
    deviations) joined back — medians are not algebraic, so two passes is
    the honest distributed shape.  Spark ``percentile`` == DuckDB
    ``quantile_cont`` (linear interpolation), keeping oracles bit-aligned.
    ``approx=True`` swaps both passes to ``percentile_approx`` (mergeable
    sketch, no per-group value buffer — the 100 TB form; rank error ≤
    n/accuracy, same certificate machinery as scale.py's other degrade
    paths); q240 selects it via ``scale.use_approx`` above the row
    threshold.

    MAD == 0 guard (ADVICE r3): when over half a group's values equal the
    median — common for integer or low-cardinality metrics — MAD is 0 and
    the naive division would yield NULL in Spark (silently suppressing
    every outlier) and ±inf in DuckDB, breaking cross-engine parity.
    Following Iglewicz & Hoaglin, the score falls back to the meanAD form
    ``(x - median) / (1.253314·meanAD)``; if meanAD is also 0 (a constant
    group) every score is 0.  ``mad_zero`` flags groups that took the
    fallback so callers can tell which scale estimator produced the flag.
    """
    if approx:
        from ..scale import APPROX_ACCURACY

        def _median(col):
            return F.percentile_approx(
                col, F.lit(0.5), F.lit(APPROX_ACCURACY)
            ).cast("double")
    else:
        def _median(col):
            return F.percentile(col, F.lit(0.5))

    med = df.groupBy(group_col).agg(
        _median(value_col).alias("med"),
        F.count(F.lit(1)).alias("n"),
    )
    dev = df.join(F.broadcast(med), group_col).withColumn(
        "absdev", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = dev.groupBy(group_col).agg(
        _median("absdev").alias("mad"),
        F.avg("absdev").alias("__meanad"),
    )
    z = dev.join(F.broadcast(mad), group_col).withColumn(
        "absz",
        F.when(
            F.col("mad") > 0,
            F.col("absdev") / (F.lit(consistency) * F.col("mad")),
        )
        .when(
            F.col("__meanad") > 0,
            F.col("absdev") / (F.lit(1.253314) * F.col("__meanad")),
        )
        .otherwise(F.lit(0.0)),
    )
    return z.groupBy(group_col).agg(
        F.max("med").alias("med"),
        F.max("mad").alias("mad"),
        F.max("n").alias("n"),
        F.sum((F.col("absz") > threshold).cast("int")).alias("n_outliers"),
        F.max("absz").alias("max_absz"),
        F.max(F.col("mad") == 0).alias("mad_zero"),
    )


def kaplan_meier(
    df: DataFrame, duration_col: str, observed_col: str
) -> DataFrame:
    """Kaplan-Meier survival estimator with right censoring: one row per
    distinct *event* time t — ``(t, n_at_risk, d_events, survival)`` with
    ``S(t) = Π_{u ≤ t} (1 - d_u / n_u)``.  Censored subjects (observed =
    false) count toward risk sets up to their censoring time but never as
    events — dropping them instead (the naive mistake) biases S downward.

    Shape: the subject table collapses to per-distinct-duration counts
    first, so every window below runs over the *time axis*, bounded by the
    measurement resolution (days here), never by subject count.  The
    running product is ``exp(Σ ln(...))`` — both this and the DuckDB
    oracle use the identical log-sum form so the float path matches.
    """
    per_t = df.groupBy(F.col(duration_col).alias("t")).agg(
        F.sum(F.col(observed_col).cast("int")).alias("d"),
        F.count(F.lit(1)).alias("c"),
    )
    risk_w = (
        Window.orderBy(F.desc("t")).rowsBetween(Window.unboundedPreceding, 0)
    )
    at_risk = per_t.withColumn("n_at_risk", F.sum("c").over(risk_w))
    events = at_risk.filter(F.col("d") > 0)
    surv_w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    # the log-sum trick needs an absorbing-zero guard: when d == n_at_risk
    # the factor is exactly 0 and ln() is undefined (null in Spark, -inf in
    # DuckDB) — flag it with a running max and pin survival to 0 from that
    # point on, contributing ln(1)=0 to the sum instead
    factor = 1.0 - F.col("d") / F.col("n_at_risk")
    hit_zero = F.max((factor <= 0.0).cast("int")).over(surv_w)
    safe_ln = F.log(F.when(factor > 0.0, factor).otherwise(F.lit(1.0)))
    return events.select(
        "t",
        F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
        F.col("d").cast("bigint").alias("d_events"),
        F.when(hit_zero == 1, F.lit(0.0))
        .otherwise(F.exp(F.sum(safe_ln).over(surv_w)))
        .alias("survival"),
    )


def mmd2_terms(
    df: DataFrame,
    split_col: str,
    vec_col: str,
    dim: int,
    *,
    quant: int = 512,
) -> DataFrame:
    """Maximum Mean Discrepancy (quadratic-kernel MMD^2) between the two
    embedding populations given by binary ``split_col`` — the kernel
    two-sample drift test for EMBEDDING columns, completing the drift family
    (ks_2sample/psi compare scalar scores; this compares distributions in
    R^dim).  For the polynomial kernel k(x,y) = (x.y)^2 the V-statistic
    decomposes exactly: MMD^2 = ||Mx - My||_F^2 where M_g[i][j] = mean over
    group g of x_i * x_j — so the all-pairs kernel sum collapses to one
    second-moment aggregation per group and NO pairwise join.

    Determinism contract: vectors are quantized as floor(x * quant) with
    ``quant`` a power of two (exact IEEE scaling, no rounding), so the
    per-cell moment sums are integer-exact and order-independent; the final
    per-row Frobenius fold runs left-to-right over the sorted column axis.
    Every float op after the integer sums is a single exactly-rounded IEEE
    op replayed identically by the DuckDB oracle.

    Returns one row per vector row index i: (i, n_a, n_b, mmd_term) with
    mmd_term = sum_j (Ma[i][j] - Mb[i][j])^2; total MMD^2 is their sum.

    Scale design (the 100 TB story): a mapInPandas partial reduces each
    Arrow batch to one (group, dim*dim int sums, count) row via an integer
    einsum — executors reduce the full corpus map-side to n_partitions * 2
    tiny rows; the only shuffle carries those partials.  Corpus vectors
    never shuffle and nothing is ever collected.
    """
    import numpy as np  # noqa: F401 - fail fast on driver if absent

    if quant & (quant - 1) or quant <= 0:
        raise ValueError("quant must be a positive power of two (exact scaling)")

    qv = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(float(quant))).cast("long"),
    )
    base = df.select(F.col(split_col).cast("int").alias("g"), qv.alias("q"))

    def _partial(batches):
        import numpy as np
        import pandas as pd

        sums: dict[int, "np.ndarray"] = {}
        counts: dict[int, int] = {}
        for pdf in batches:
            for g, sub in pdf.groupby("g"):
                m = np.stack(sub["q"].to_numpy()).astype(np.int64)
                if m.shape[1] != dim:
                    raise ValueError(f"expected dim {dim}, got {m.shape[1]}")
                s = (m.T @ m).reshape(-1)
                if g in sums:
                    sums[g] += s
                    counts[g] += len(sub)
                else:
                    sums[g] = s
                    counts[g] = len(sub)
        if sums:
            yield pd.DataFrame(
                {
                    "g": list(sums),
                    "s": [sums[g].tolist() for g in sums],
                    "n": [int(counts[g]) for g in sums],
                }
            )

    parts = base.mapInPandas(_partial, "g int, s array<bigint>, n bigint")
    cells = (
        parts.select("g", "n", F.posexplode("s").alias("idx", "v"))
        .groupBy("g", "idx")
        .agg(F.sum("v").alias("s"), F.sum("n").alias("nn"))
    )
    a = cells.filter(F.col("g") == 0).select(
        "idx", F.col("s").alias("sa"), F.col("nn").alias("na")
    )
    b = cells.filter(F.col("g") == 1).select(
        "idx", F.col("s").alias("sb"), F.col("nn").alias("nb")
    )
    diff = (
        a.join(b, "idx")
        .select(
            (F.col("idx") / dim).cast("int").alias("i"),
            (F.col("idx") % dim).cast("int").alias("j"),
            "na",
            "nb",
            (
                (F.col("sa") / F.col("na") - F.col("sb") / F.col("nb"))
                * (F.col("sa") / F.col("na") - F.col("sb") / F.col("nb"))
            ).alias("d2"),
        )
    )
    return diff.groupBy("i").agg(
        F.first("na").alias("n_a"),
        F.first("nb").alias("n_b"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "d2"))), lambda s: s["d2"]
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("mmd_term"),
    )


def isotonic_calibrate(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    nbins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Isotonic calibration (the PAVA fit q261's reliability diagram
    diagnoses): bins ``score_col`` into ``nbins`` fixed-width bins and fits
    the least-squares MONOTONE positive-rate curve over the bin axis, via
    the closed-form minimax characterization of isotonic regression:

        iso[i] = max_{j<=i} min_{k>=i} (sum of labels in bins j..k)
                                       / (count in bins j..k)

    Returns (bin, n, pos_rate, iso_rate) with iso_rate non-decreasing — the
    calibration map a quality-classifier threshold policy applies.

    Determinism: label sums/counts are integers, every interval average is
    one exact-integer division, and min/max over deterministic doubles are
    deterministic — the oracle replays identically.  Scale: the corpus pays
    ONE map-side-combined aggregation to nbins rows; everything after
    (cumsum window, interval self-join, minimax) runs on the bounded bin
    axis (O(nbins^3) pairs, nbins<=~100), the same bounded-axis-window
    policy as ks_2sample/q247.
    """
    if nbins < 1:
        raise ValueError("nbins must be >= 1")
    width = (hi - lo) / nbins
    b = F.floor((F.col(score_col) - F.lit(lo)) / F.lit(width)).cast("int")
    b = F.least(F.greatest(b, F.lit(0)), F.lit(nbins - 1))
    bins = (
        df.select(b.alias("bin"), F.col(label_col).cast("bigint").alias("y"))
        .groupBy("bin")
        .agg(F.sum("y").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy().orderBy("bin")  # bounded axis: nbins rows
    cums = bins.select(
        "bin",
        "s",
        "n",
        F.sum("s").over(w).alias("cs"),
        F.sum("n").over(w).alias("cn"),
    )
    j = cums.select(
        F.col("bin").alias("j"),
        (F.col("cs") - F.col("s")).alias("cs_prev"),
        (F.col("cn") - F.col("n")).alias("cn_prev"),
    )
    k = cums.select(F.col("bin").alias("k"), "cs", "cn")
    pairs = j.join(k, F.col("j") <= F.col("k")).select(
        "j",
        "k",
        (
            (F.col("cs") - F.col("cs_prev")) / (F.col("cn") - F.col("cn_prev"))
        ).alias("avg_jk"),
    )
    axis = bins.select(F.col("bin").alias("i"))
    inner = (
        axis.join(pairs, (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")))
        .groupBy("i", "j")
        .agg(F.min("avg_jk").alias("m"))
    )
    iso = inner.groupBy("i").agg(F.max("m").alias("iso_rate"))
    return (
        bins.join(iso, bins["bin"] == iso["i"])
        .select(
            "bin",
            "n",
            (F.col("s") / F.col("n")).alias("pos_rate"),
            "iso_rate",
        )
    )
