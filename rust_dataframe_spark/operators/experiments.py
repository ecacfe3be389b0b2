"""Experiment-analysis operators: CUPED variance reduction.

Complements the A/B readout with per-arm bootstrap uncertainty
(catalog_analytics q234): CUPED (Controlled-experiment Using Pre-Existing
Data, Deng et al., WSDM'13) shrinks metric variance with a pre-experiment
covariate, which shortens experiments at any scale for free — the adjustment
is a closed-form linear correction, no model fitting.

``adjusted_y = y - θ·(x - x̄)`` with ``θ = cov(x, y) / var(x)`` estimated
pooled across arms (the standard practice: θ from pooled data is unbiased
under randomization because x predates assignment).

Scale: two aggregates over the unit table (θ and x̄ are single scalars —
broadcast back), then per-arm moments.  The unit table itself comes from one
groupBy over raw events.  Nothing here is row-order dependent, so the whole
computation is plain partial-aggregation — shuffle payload is per-unit rows,
then per-arm scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["cuped"]


def cuped(
    units: DataFrame,
    arm_col: str,
    metric_col: str,
    covariate_col: str,
) -> DataFrame:
    """Per-arm CUPED readout from a unit-level table (one row per
    randomization unit with its arm, experiment metric y, and
    pre-experiment covariate x).

    Returns one row per arm: ``(arm, n, mean_y, mean_adj, var_y, var_adj,
    var_reduction, theta)`` where ``var_reduction = 1 - var_adj/var_y``
    (equals the squared x-y correlation in expectation — the CUPED
    guarantee) and theta is the pooled coefficient (same value every row,
    kept for auditability).
    """
    y, x = F.col(metric_col), F.col(covariate_col)
    g = units.groupBy().agg(
        (F.covar_pop(covariate_col, metric_col) / F.var_pop(covariate_col)).alias(
            "theta"
        ),
        F.avg(covariate_col).alias("xbar"),
    )
    adj = units.crossJoin(F.broadcast(g)).withColumn(
        "adj_y", y - F.col("theta") * (x - F.col("xbar"))
    )
    return adj.groupBy(F.col(arm_col).alias("arm")).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(metric_col).alias("mean_y"),
        F.avg("adj_y").alias("mean_adj"),
        F.var_pop(metric_col).alias("var_y"),
        F.var_pop("adj_y").alias("var_adj"),
        (1 - F.var_pop("adj_y") / F.var_pop(metric_col)).alias("var_reduction"),
        F.max("theta").alias("theta"),
    )
