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
