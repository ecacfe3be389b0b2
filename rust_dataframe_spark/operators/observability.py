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

from pyspark.sql import Column, DataFrame, Observation


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
