"""Event-sequence analytics: conversion funnels and retention cohorts.

No reference analog (it has no event/temporal operators at all); these are
the standard large-scale event-table queries a product/data pipeline runs
daily, built purely from joins + aggregates so Catalyst plans them.

Scale posture: both operators aggressively reduce to per-user aggregates
*before* any join — the per-user frame is orders of magnitude smaller than
the raw event log (150 users per 10k events in testdata; similar ratios in
production), so every subsequent join is AQE-broadcastable and the raw log
is scanned exactly once per funnel step / once for cohorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered conversion funnel: for each step i, count users whose first
    step-i event happened *strictly after* their entry into step i-1.

    Returns (step_idx int, stage string, n_users bigint), one row per step.
    """
    prev = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
    )
    summaries = [
        prev.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(0).alias("step_idx"), F.lit(steps[0]).alias("stage"), "n_users"
        )
    ]
    for i, step in enumerate(steps[1:], start=1):
        prev = (
            events.filter(F.col(type_col) == step)
            .join(prev.select(user_col, F.col("_t").alias("_t_prev")), user_col)
            .filter(F.col(ts_col) > F.col("_t_prev"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("_t"))
        )
        summaries.append(
            prev.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i).alias("step_idx"), F.lit(step).alias("stage"), "n_users"
            )
        )
    out = summaries[0]
    for s in summaries[1:]:
        out = out.unionAll(s)
    return out.orderBy("step_idx")


def retention_cohorts(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Retention matrix: cohort = period (ISO week or month) of a user's
    first event; each (cohort_start, period_offset) cell counts distinct
    users active that many periods after joining.

    Returns (cohort_start date, period_offset int, n_users bigint).
    """
    if period not in ("week", "month"):
        raise ValueError("period must be 'week' or 'month'")
    first = events.groupBy(user_col).agg(
        F.date_trunc(period, F.min(ts_col)).alias("_c0")
    )
    if period == "week":
        offset = F.floor(
            F.datediff(F.to_date(ts_col), F.to_date("_c0")) / 7.0
        ).cast("int")
    else:
        offset = (
            (F.year(ts_col) - F.year("_c0")) * 12 + (F.month(ts_col) - F.month("_c0"))
        ).cast("int")
    return (
        events.join(first, user_col)
        .select(
            F.col("_c0").cast("date").alias("cohort_start"),
            offset.alias("period_offset"),
            F.col(user_col),
        )
        .groupBy("cohort_start", "period_offset")
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
        .orderBy("cohort_start", "period_offset")
    )


def cogroup_view_purchase(views: DataFrame, purchases: DataFrame, key_col: str) -> DataFrame:
    """Per-key view/purchase attribution via ``cogroup().applyInPandas`` —
    the two-frame Pandas-API surface: both sides of a key arrive together as
    two pandas frames, no join materialization in between.

    Returns (key, n_views, n_purchases, first_view_ts, lag_us) where lag_us
    is micros from the first view to the first purchase at-or-after it
    (NULL when either side is empty or no purchase follows).

    The same answer is expressible as joins+windows (and that form scales
    better — cogroup holds both groups in one worker's memory); cogroup is
    the right tool when the per-key merge logic is genuinely procedural
    (per-user session replay, policy simulation).

    Implementation note: each side's ``ts`` is re-aliased to a side-specific
    name BEFORE the cogroup.  When both inputs derive from the same scan,
    their ``ts`` attributes share one expression id and Catalyst's column
    pruning keeps the column on only ONE side of the cogroup (the other
    pandas frame silently arrives without it); the alias mints fresh ids,
    making pruning see two distinct columns.
    """
    import pandas as pd

    v_in = views.select(F.col(key_col), F.col("ts").alias("__vts"))
    p_in = purchases.select(F.col(key_col), F.col("ts").alias("__pts"))

    def _merge(v: pd.DataFrame, p: pd.DataFrame) -> pd.DataFrame:
        key = v[key_col].iloc[0] if len(v) else p[key_col].iloc[0]
        first_view = v["__vts"].min() if len(v) else pd.NaT
        lag = None
        if len(v) and len(p):
            after = p.loc[p["__pts"] >= first_view, "__pts"]
            if len(after):
                lag = int((after.min() - first_view).value // 1000)
        return pd.DataFrame(
            {
                key_col: [key],
                "n_views": [len(v)],
                "n_purchases": [len(p)],
                "first_view_ts": [first_view],
                "lag_us": [lag],
            }
        )

    return (
        v_in.groupBy(key_col)
        .cogroup(p_in.groupBy(key_col))
        .applyInPandas(
            _merge,
            schema=f"{key_col} bigint, n_views bigint, n_purchases bigint, "
            "first_view_ts timestamp, lag_us bigint",
        )
    )
