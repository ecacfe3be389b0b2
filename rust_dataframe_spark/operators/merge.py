"""Merge / upsert (SCD-1) — incremental corpus refresh without a table format.

No reference analog (its sinks are whole-table writes, `dataframe.rs:545-594`);
this is the operator a training-data pipeline needs to apply a day's crawl
delta to a canonical document table.

Semantics are SQL MERGE's matched/not-matched arms restricted to
WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED THEN INSERT *: a source row
replaces the whole target row on key match (including overwriting with its
NULLs — this is row-level, not per-column coalesce), unmatched source rows
insert, untouched target rows carry over.

Scale: one full-outer shuffle join on the key. At 100 TB the levers are
(a) bucket or partition the canonical table by the merge key so the join is
exchange-free on the big side, and (b) pair with dynamic partition overwrite
(see streaming/ops.foreach_batch_parquet) so only touched partitions rewrite.
Delta/Iceberg MERGE is this same plan with a transaction log on top.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """Upsert ``source`` rows into ``target`` by ``keys`` (row-level replace).

    Both frames must share the same columns; key columns must be non-null in
    ``source`` (they define the match).
    """
    cols = target.columns
    if set(cols) != set(source.columns):
        raise ValueError(f"schema mismatch: {cols} vs {source.columns}")
    t, s = target.alias("t"), source.alias("s")
    cond = reduce(
        lambda a, b: a & b, [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys]
    )
    matched = F.col(f"s.{keys[0]}").isNotNull()
    return t.join(s, cond, "full_outer").select(
        *[F.when(matched, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c) for c in cols]
    )


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, *, compare_cols: list[str] | None = None
) -> DataFrame:
    """Row-level diff of two table snapshots — the CDC primitive when there
    is no change log: classify every key as ``added`` / ``removed`` /
    ``changed`` / ``unchanged``.  ``compare_cols`` limits which columns
    define "changed" (default: every shared non-key column); comparison is
    null-safe (NULL -> value counts as a change, NULL -> NULL does not).

    Returns one row per key: ``(key, change_type)`` plus the new-side
    columns (old-side for removals).  Feed ``changed + added`` into
    merge_upsert to apply the delta; at 100 TB this one full-outer join on
    the key (bucketed layout makes it exchange-free) replaces re-publishing
    the whole table.
    """
    shared = [c for c in new.columns if c in set(old.columns) and c != key]
    cols = compare_cols if compare_cols is not None else shared
    missing = [c for c in cols if c not in shared]
    if missing or not cols:
        raise ValueError(f"compare_cols must be shared non-key columns, bad: {missing or cols}")
    o = old.select(key, *cols).alias("o")
    n = new.select(key, *cols).alias("n")
    j = o.join(n, F.col(f"o.{key}") == F.col(f"n.{key}"), "full")
    differs = reduce(
        lambda a, b: a | b,
        [~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")) for c in cols],
    )
    change = (
        F.when(F.col(f"o.{key}").isNull(), F.lit("added"))
        .when(F.col(f"n.{key}").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out_cols = [
        F.coalesce(F.col(f"n.{key}"), F.col(f"o.{key}")).alias(key),
        change.alias("change_type"),
    ]
    for c in cols:
        out_cols.append(F.coalesce(F.col(f"n.{c}"), F.col(f"o.{c}")).alias(c))
    return j.select(*out_cols)


def agg_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Mergeable per-key aggregate STATE: (keys, n, s, ss, mn, mx) — count,
    sum, sum of squares, min, max.  The partial-aggregate form every
    distributive/algebraic aggregate reduces to; two states combine with
    :func:`merge_agg_state` and finalize to avg/variance with
    :func:`finalize_agg_state`.

    This is incremental-view maintenance without a table format: keep the
    state table, fold each day's batch in (one key-shuffle over the BATCH
    only), and never rescan history — the 100 TB alternative to recomputing
    a corpus-wide groupBy per refresh.
    """
    v = F.col(value_col).cast("double")
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("s"),
        F.sum(v * v).alias("ss"),
        F.min(v).alias("mn"),
        F.max(v).alias("mx"),
    )


def merge_agg_state(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """Combine two aggregate states by key (full-outer, null-safe): counts
    and sums add, min/max take the extremum, absent keys pass through.
    Associative and commutative — fold any number of batches in any order."""
    bb = b
    for c in ["n", "s", "ss", "mn", "mx"]:
        bb = bb.withColumnRenamed(c, f"__b_{c}")
    j = a.join(bb, keys, "full_outer")
    z = F.lit(0)
    return j.select(
        *keys,
        (F.coalesce(F.col("n"), z) + F.coalesce(F.col("__b_n"), z)).alias("n"),
        (F.coalesce(F.col("s"), F.lit(0.0)) + F.coalesce(F.col("__b_s"), F.lit(0.0))).alias("s"),
        (F.coalesce(F.col("ss"), F.lit(0.0)) + F.coalesce(F.col("__b_ss"), F.lit(0.0))).alias("ss"),
        F.coalesce(
            F.least(F.col("mn"), F.col("__b_mn")), F.col("mn"), F.col("__b_mn")
        ).alias("mn"),
        F.coalesce(
            F.greatest(F.col("mx"), F.col("__b_mx")), F.col("mx"), F.col("__b_mx")
        ).alias("mx"),
    )


def finalize_agg_state(state: DataFrame, keys: list[str]) -> DataFrame:
    """Read avg and population variance off a state frame:
    ``avg = s/n``, ``var_pop = ss/n - (s/n)^2`` — the algebraic identities
    the mergeable (n, s, ss) triple exists for.  With integer-valued inputs
    the sums are exact in doubles (up to 2^53), so the two closing ops are
    bit-identical across engines and merge orders; for wide-magnitude float
    inputs prefer Welford merging and document the rounding."""
    n = F.col("n").cast("double")
    avg = F.col("s") / n
    return state.select(
        *keys,
        "n",
        "s",
        "mn",
        "mx",
        F.round(avg, 6).alias("avg"),
        F.round(F.col("ss") / n - (F.col("s") / n) * (F.col("s") / n), 6).alias(
            "var_pop"
        ),
    )


def retract_agg_state(
    state: DataFrame,
    deletes: DataFrame,
    keys: list[str],
    *,
    unmatched_col: str | None = None,
) -> DataFrame:
    """Retract a batch of deleted rows' aggregate state from the running
    state — the deletion half of incremental view maintenance.  Counts and
    (co)sums are group-invertible and subtract exactly; **min/max are
    not**: if the deleted batch's extremum TOUCHES the state's extremum
    the stored value can no longer be trusted and is nulled with
    ``extrema_stale = true`` (the signal to rebuild that key's extrema
    from storage — the honest cost of retractable IVM, not hidden behind
    a wrong answer).  Keys whose count reaches zero drop out entirely.

    Staleness is STICKY (ADVICE r3): a key whose extrema were nulled by an
    earlier retraction stays ``extrema_stale = true`` through every later
    one (null mn/mx, or an incoming ``extrema_stale`` column, force the
    flag) — a comparison against a null extremum can never silently reset
    the flag to false.  Delete batches may also contain keys absent from
    the state (a bug in the caller's CDC feed); pass ``unmatched_col`` to
    surface them — the output gains that boolean column, unmatched keys
    appear as rows with ``n`` = the *negated* delete count and the flag
    set, instead of being silently dropped.
    """
    dd = deletes.drop("extrema_stale")
    for c in ["n", "s", "ss", "mn", "mx"]:
        dd = dd.withColumnRenamed(c, f"__d_{c}")
    how = "full_outer" if unmatched_col is not None else "left"
    j = state.join(dd, keys, how)
    z = F.lit(0)
    prior_stale = F.col("mn").isNull() | F.col("mx").isNull()
    if "extrema_stale" in state.columns:
        prior_stale = prior_stale | F.coalesce(
            F.col("extrema_stale"), F.lit(False)
        )
    matched = F.col("n").isNotNull()
    touched = (
        (F.col("__d_mn") <= F.col("mn")) | (F.col("__d_mx") >= F.col("mx"))
    )
    stale = F.coalesce(touched, F.lit(False)) | prior_stale
    cols = [
        *keys,
        (F.coalesce(F.col("n"), z) - F.coalesce(F.col("__d_n"), z)).alias("n"),
        (
            F.coalesce(F.col("s"), F.lit(0.0))
            - F.coalesce(F.col("__d_s"), F.lit(0.0))
        ).alias("s"),
        (
            F.coalesce(F.col("ss"), F.lit(0.0))
            - F.coalesce(F.col("__d_ss"), F.lit(0.0))
        ).alias("ss"),
        F.when(stale, F.lit(None)).otherwise(F.col("mn")).alias("mn"),
        F.when(stale, F.lit(None)).otherwise(F.col("mx")).alias("mx"),
        stale.alias("extrema_stale"),
    ]
    if unmatched_col is not None:
        cols.append((~matched).alias(unmatched_col))
        return j.select(*cols).filter((F.col("n") > 0) | F.col(unmatched_col))
    return j.select(*cols).filter(F.col("n") > 0)
