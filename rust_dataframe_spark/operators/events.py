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
