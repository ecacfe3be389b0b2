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


def geometric_mean_udaf():
    """Custom aggregate (UDAF) as a grouped-agg Pandas UDF — the registration
    path the reference's Context.functions placeholder gestured at
    (context.rs:8-23) but never implemented.  Arrow ships each group's column
    to Python as one vector; the log-sum-exp form avoids overflow.

    Scale: grouped-agg UDFs have NO partial aggregation — every raw value
    shuffles to its group's reducer (unlike built-in aggregates, which
    combine map-side).  Use for genuinely custom math on bounded groups; for
    algebraic things prefer composing built-ins (geomean == exp(avg(ln x)),
    which DOES partial-aggregate — that form is the oracle-checked one in
    q20-style queries).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType

    # type-hint form (pd.Series -> scalar infers a grouped-agg UDF); the
    # PandasUDFType enum is deprecated since Spark 3.0.  Annotations are set
    # as live objects because `from __future__ import annotations` would
    # stringify inline hints, which the inference layer rejects.
    def _geomean(v):
        arr = v.to_numpy(dtype="float64")
        arr = arr[arr > 0]
        if arr.size == 0:
            return None
        return float(np.exp(np.log(arr).mean()))

    _geomean.__annotations__ = {"v": pd.Series, "return": float}
    return F.pandas_udf(_geomean, DoubleType())
