"""Equal-width histogram as a distributed two-pass operator.

Reference: ``Column::hist(nbins, density)`` (table.rs:244-290) computed
equal-width buckets over Int64/Float64 columns single-threaded.  The Spark-first
form is two scans with no driver-side data beyond the 2-value min/max row:

1. one aggregate for ``min``/``max`` (map-side partial agg, tiny shuffle);
2. ``width_bucket`` -> groupBy(bucket).count() (map-side combine, shuffle is
   at most ``nbins`` rows per partition).

At 100 TB this is scan-bound; the shuffle is O(nbins * partitions) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["hist"]


def hist(df: DataFrame, column: str, nbins: int = 10, density: bool = False) -> DataFrame:
    """Histogram of ``column`` with ``nbins`` equal-width buckets.

    Returns columns ``bucket`` (1-based), ``lo``, ``hi``, and ``count``
    (or ``density`` when density=True).  Values equal to the max fall in the
    last bucket (matching the reference's closed top bucket, table.rs:267-276).
    """
    c = F.col(column)
    bounds = df.agg(
        F.min(c).cast("double").alias("mn"), F.max(c).cast("double").alias("mx")
    ).collect()[0]
    mn, mx = bounds["mn"], bounds["mx"]
    if mn is None:  # all-null column
        return df.sparkSession.createDataFrame(
            [], "bucket int, lo double, hi double, count bigint"
        )
    if mx == mn:
        mx = mn + 1.0  # single-valued column: one degenerate bucket
    width = (mx - mn) / nbins
    bucket = F.least(
        F.lit(nbins), F.greatest(F.lit(1), F.width_bucket(c.cast("double"), F.lit(mn), F.lit(mx), F.lit(nbins)))
    )
    out = (
        df.where(c.isNotNull())
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .count()
        .withColumn("lo", F.lit(mn) + (F.col("bucket") - 1) * F.lit(width))
        .withColumn("hi", F.lit(mn) + F.col("bucket") * F.lit(width))
        .select("bucket", "lo", "hi", "count")
        .orderBy("bucket")
    )
    if density:
        total = df.where(c.isNotNull()).count()
        out = out.withColumn(
            "density", (F.col("count") / F.lit(float(total)) / F.lit(width))
        ).drop("count")
    return out
