"""Inline pipeline metrics via ``DataFrame.observe`` (Observation API).

A training-data pipeline at 100 TB cannot afford a second pass to learn "how
many rows survived the filter" or "how many nulls did the join introduce" —
``observe`` attaches named aggregate metrics to the plan itself, computed by
accumulators *during* the one real pass (zero extra jobs, zero extra scans,
no driver collect beyond the scalar metric values).

No reference analog (it has no metrics facility); this is operational upside
that Spark gives for free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation, functions as F


def with_metrics(df: DataFrame, **metrics: Column) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to ``df``'s next action.

    Returns ``(observed_df, observation)`` — run any action on the returned
    frame, then read ``observation.get`` (a dict keyed by the kwarg names).

    Example::

        out, obs = with_metrics(df, n_rows=F.count(F.lit(1)),
                                n_null_ids=F.count_if(F.col("id").isNull()))
        out.write.parquet(...)
        obs.get  # {'n_rows': ..., 'n_null_ids': ...}
    """
    obs = Observation()
    observed = df.observe(obs, *[expr.alias(name) for name, expr in metrics.items()])
    return observed, obs


def constraint_audit(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Declarative data-quality audit (the Deequ/expectations shape): every
    rule is a boolean Column that is True when a row PASSES; the result is
    one long row per rule — ``(rule, n_rows, n_pass, n_fail)``.

    All rules evaluate in ONE scan: each compiles to a conditional count in
    a single global aggregate (map-side partial, one 1-row result), then a
    stack() unpivot to long form — adding a rule adds an expression, not a
    pass.  Referential rules need a join — see :func:`referential_orphans`
    and union the rows.
    """
    from pyspark.sql import functions as F

    if not checks:
        raise ValueError("checks must be non-empty")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (_, cond) in enumerate(checks.items()):
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(f"__p{i}"))
    wide = df.agg(*aggs)
    k = len(checks)
    stack_args = ", ".join(
        f"'{name}', __p{i}" for i, name in enumerate(checks)
    )
    return wide.select(
        F.expr(f"stack({k}, {stack_args}) AS (rule, n_pass)"), F.col("__n").alias("n_rows")
    ).select(
        "rule",
        "n_rows",
        "n_pass",
        (F.col("n_rows") - F.col("n_pass")).cast("bigint").alias("n_fail"),
    )


def referential_orphans(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str, *, rule: str
) -> DataFrame:
    """Referential-integrity rule as one audit row: child rows whose key has
    no match in parent.  Same output schema as constraint_audit, so the rows
    union into one report — and the whole thing stays ONE lazy plan (left
    join on distinct parent keys + conditional count; no driver actions).
    Scale: only keys move; the distinct-parent side broadcasts when small,
    else AQE plans the shuffle."""
    from pyspark.sql import functions as F

    j = child.select(F.col(child_key).alias("__ck")).join(
        parent.select(F.col(parent_key).alias("__pk")).distinct(),
        F.col("__ck") == F.col("__pk"),
        "left",
    )
    return j.agg(
        F.lit(rule).alias("rule"),
        F.count(F.lit(1)).alias("n_rows"),
        F.count("__pk").alias("n_pass"),
        (F.count(F.lit(1)) - F.count("__pk")).cast("bigint").alias("n_fail"),
    )


def tukey_outliers(
    df: DataFrame,
    value_col: str,
    *,
    group_cols: list[str],
    k: float = 1.5,
) -> DataFrame:
    """Robust per-group outlier detection by Tukey fences: a value is an
    outlier if outside [p25 - k*IQR, p75 + k*IQR].  Returns the input plus
    (lo, hi, is_outlier).

    Deliberately quantile-based, not z-score: exact interpolated percentiles
    are pure functions of the sorted data (no accumulation-order float
    drift), so the fences — and therefore the outlier SET — are bit-identical
    across engines, retries, and partitionings.  A mean/stddev fence is
    cheaper (one pass, no sort buffer) but its boundary floats with
    partial-aggregation order; for 100 TB swap `percentile` for
    `approx_percentile` and accept the documented rank error instead.

    Shape: one grouped percentile pass (tiny result — one row per group,
    broadcast back) + one codegen'd filter over the scan.
    """
    from pyspark.sql import functions as F

    bounds = df.groupBy(*group_cols).agg(
        F.percentile(value_col, F.lit(0.25)).alias("__p25"),
        F.percentile(value_col, F.lit(0.75)).alias("__p75"),
    )
    bounds = bounds.select(
        *group_cols,
        (F.col("__p25") - k * (F.col("__p75") - F.col("__p25"))).alias("lo"),
        (F.col("__p75") + k * (F.col("__p75") - F.col("__p25"))).alias("hi"),
    )
    joined = df.join(F.broadcast(bounds), group_cols)
    return joined.withColumn(
        "is_outlier", (F.col(value_col) < F.col("lo")) | (F.col(value_col) > F.col("hi"))
    )


def robust_group_stats(df: DataFrame, value_col: str, *, group_cols: list[str]) -> DataFrame:
    """Per-group median + MAD (median absolute deviation) via grouped-map
    ``applyInPandas`` — the batch Pandas-API surface (each group arrives as
    one pandas DataFrame; Arrow both ways).

    Exists as the grouped-map DEMONSTRATOR: median/MAD are expressible with
    two built-in percentile passes (and at 100 TB that form — or
    approx_percentile — is what you run, since a grouped-map materializes
    each whole group in one python worker's memory).  Grouped-map is the
    right tool when per-group logic is genuinely iterative/stateful
    (model-fit-per-group, per-group optimization), with group size bounded
    by construction.
    """
    import pandas as pd

    from pyspark.sql import functions as F  # noqa: F401

    gcols = list(group_cols)
    schema = ", ".join(
        [f"{c} string" for c in gcols] + ["n bigint", "med double", "mad double"]
    )

    def _stats(pdf: pd.DataFrame) -> pd.DataFrame:
        med = pdf[value_col].median()
        mad = (pdf[value_col] - med).abs().median()
        out = {c: [pdf[c].iloc[0]] for c in gcols}
        out.update({"n": [len(pdf)], "med": [med], "mad": [mad]})
        return pd.DataFrame(out)

    return df.groupBy(*gcols).applyInPandas(_stats, schema=schema)


def distribution_drift(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    *,
    nbins: int,
    lo: float,
    hi: float,
) -> DataFrame:
    """Distribution drift between two samples of the same metric — the
    train/serve-skew and snapshot-regression check an ML data platform runs
    between corpus versions.  Both samples histogram into the same fixed
    ``nbins`` equal-width buckets over [lo, hi); drift is the total
    variation distance ``TVD = 0.5 * sum_i |p_i - q_i|`` in [0, 1].

    PSI/KL need per-bucket logs (per-engine libm hazard, and undefined on
    empty buckets); TVD is the log-free drift metric with the same
    monitoring role, computed INTEGER-EXACT: with counts n_i/N and m_i/M,
    ``TVD = sum_i |n_i*M - m_i*N| / (2*N*M)`` — one exact integer sum and a
    single closing division, bit-identical across engines, partitionings
    and retries.  Returns one row: (n_a, n_b, used_bins, tvd_num, tvd).

    Scale: two map-side-combined histogram aggregates (nbins rows each), a
    bucket-keyed outer join of two tiny frames, one 1-row cross join for the
    totals.  Values outside [lo, hi) clamp into the edge buckets so both
    engines bucket identically.
    """
    if nbins < 1 or not (lo < hi):
        raise ValueError(f"need nbins >= 1 and lo < hi, got {nbins}, [{lo}, {hi})")
    span = float(hi) - float(lo)

    def bucketed(df: DataFrame, out: str) -> DataFrame:
        v = F.col(value_col).cast("double")
        raw = F.floor((v - F.lit(float(lo))) / F.lit(span) * nbins).cast("bigint") + 1
        bkt = F.least(
            F.lit(nbins).cast("bigint"), F.greatest(F.lit(1).cast("bigint"), raw)
        )
        return (
            df.select(bkt.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(out))
        )

    ca = bucketed(a, "n_i")
    cb = bucketed(b, "m_i")
    j = ca.join(cb, "bucket", "full_outer").select(
        "bucket",
        F.coalesce(F.col("n_i"), F.lit(0)).alias("n_i"),
        F.coalesce(F.col("m_i"), F.lit(0)).alias("m_i"),
    )
    totals = j.agg(F.sum("n_i").alias("__n"), F.sum("m_i").alias("__m"))
    cells = j.crossJoin(F.broadcast(totals))
    num = F.sum(F.abs(F.col("n_i") * F.col("__m") - F.col("m_i") * F.col("__n")))
    return cells.groupBy().agg(
        F.sum("n_i").alias("n_a"),
        F.sum("m_i").alias("n_b"),
        F.count(F.lit(1)).alias("used_bins"),
        num.alias("tvd_num"),
        F.round(
            num.cast("double")
            / (F.lit(2.0) * (F.max("__n") * F.max("__m")).cast("double")),
            6,
        ).alias("tvd"),
    )
