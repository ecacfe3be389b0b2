"""Skew-mitigation utilities for joins and aggregations.

AQE's skew-join splitting (on by default in context.py) handles most skew at
runtime by subdividing oversized shuffle partitions.  These helpers cover the
cases AQE can't: a *single hot key* whose build-side rows must be replicated
(AQE only splits the probe side), and skewed aggregations where the hot key
serializes one reducer.

The pattern is the textbook salt/replicate scheme:

* probe (big, skewed) side: append a uniform random salt in [0, n_salts);
* build (small per-key) side: replicate each row n_salts times, one per salt;
* join on (key, salt) — the hot key's rows now spread over n_salts reducers;
* for aggregations: aggregate on (key, salt) first (partial), then re-agg on
  key — two small shuffles instead of one hot one.

Cost model: replication multiplies the build side by n_salts, so pick
n_salts ≈ ceil(hot-key rows / target-partition rows), not "big".  At 100 TB
you'd detect hot keys with a cheap approx count first (see ``hot_keys``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["salted_join", "salted_agg_count", "hot_keys"]


def hot_keys(df: DataFrame, key_col: str, *, min_rows: int = 1_000_000) -> DataFrame:
    """Keys whose row count exceeds ``min_rows`` — the skew candidates.

    One pass, partial-aggregated; at scale run it on a sample
    (``df.sample(0.01)``) and scale the threshold accordingly.
    """
    return (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") >= min_rows)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    *,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to a hot key on the ``big`` side.

    ``big`` gets a random salt column; ``small`` is exploded n_salts times so
    every (key, salt) pair finds its match.  The join key becomes (key, salt),
    spreading each hot key over n_salts shuffle partitions.  Result columns ==
    a plain ``big.join(small, key, how)`` (salt is dropped).

    The salt uses a deterministic per-row hash (xxhash64 of all big-side
    columns + a seed) rather than rand() so retried tasks produce identical
    output — nondeterministic columns break Spark's task-retry contract.

    Only ``inner`` and ``left`` are supported: under right/full, an unmatched
    small-side row would surface once per replica (n_salts copies), diverging
    from the plain join this function promises to mirror.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: the small side is "
            "replicated n_salts times, so right/full would emit unmatched small rows "
            "once per replica"
        )
    salt = (F.abs(F.xxhash64(*[F.col(c) for c in big.columns], F.lit(42))) % n_salts).cast("int")
    b = big.withColumn("__salt", salt)
    s = small.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = b.join(s, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def salted_agg_count(df: DataFrame, key_col: str, *, n_salts: int = 8) -> DataFrame:
    """Two-stage count-by-key for skewed keys: (key, salt) partial, then key
    final.  Same result as ``df.groupBy(key).count()``; the hot key's partial
    counts arrive at the final stage as n_salts rows, not n rows.

    (For algebraic aggregates Spark's own partial aggregation already does
    map-side combining — this helps when the *reduce* side itself is the
    bottleneck, e.g. count_distinct re-shuffles raw values per key.)

    The salt hashes every data column (+ seed), like ``salted_join``: a
    nondeterministic salt (rand/monotonic id) in a shuffle key double-counts
    or drops rows when a task retries after a fetch failure.  Identical
    duplicate rows share a salt — acceptable: counts are still exact, the
    spread is merely no finer than the distinct-row population.
    """
    salt = (F.abs(F.xxhash64(*[F.col(c) for c in df.columns], F.lit(7))) % n_salts).cast("int")
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(key_col, "__salt")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return partial.groupBy(key_col).agg(F.sum("__n").cast("bigint").alias("count"))
