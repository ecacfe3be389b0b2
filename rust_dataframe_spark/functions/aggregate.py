"""Aggregate function catalog (SURVEY §2.5).

Reference ``AggregateFunction`` enum (expression.rs:695-710) plus the
whole-column kernels (functions/aggregate.rs).  Notes:

* ``min`` maps to the real ``F.min`` — the reference's kernel called max
  (functions/aggregate.rs:22-31); the bug is NOT reproduced.
* The five plan-time-rejected members (Kurtosis/Skewness/StdDev/SumDistinct/
  Variance, expression.rs:202-210) are first-class here.
* Count/CountDistinct were typed UInt32 in the reference (expression.rs:
  180-193); Spark counts are LongType (no unsigned types, SURVEY §1.3).
"""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = ["AGGREGATE_FUNCTIONS", "get"]

AGGREGATE_FUNCTIONS: dict[str, object] = {
    "sum": F.sum,
    "max": F.max,
    "min": F.min,
    "avg": F.avg,
    "count": F.count,
    "count_distinct": F.count_distinct,
    "first": F.first,
    "last": F.last,
    "kurtosis": F.kurtosis,
    "skewness": F.skewness,
    "stddev": F.stddev,
    "stddev_pop": F.stddev_pop,
    "stddev_samp": F.stddev_samp,
    "sum_distinct": F.sum_distinct,
    "variance": F.variance,
    "var_pop": F.var_pop,
    "var_samp": F.var_samp,
    # declared as array stubs "maybe aggregate" (array.rs:404-405)
    "collect_list": F.collect_list,
    "collect_set": F.collect_set,
    # free upside
    "median": F.median,
    "mode": F.mode,
    "percentile_approx": F.percentile_approx,
    "corr": F.corr,
    "covar_pop": F.covar_pop,
    "covar_samp": F.covar_samp,
    "approx_count_distinct": F.approx_count_distinct,
}


def get(name: str):
    return AGGREGATE_FUNCTIONS[name]
