"""Frame: the user-facing dataframe wrapper exposing the reference's verbs.

The reference has an eager ``DataFrame`` (src/dataframe.rs:30-33) and a lazy
``LazyFrame`` (src/lazyframe.rs:14-19); both map onto one class here because
``pyspark.sql.DataFrame`` is already lazy — transformations build a Catalyst
logical plan and nothing executes until an action.

Method-by-method parity (citations into /root/reference):

=====================  =====================================================
verb                   reference
=====================  =====================================================
select                 dataframe.rs:258-297, lazyframe.rs:164-193
drop                   dataframe.rs:302-337, lazyframe.rs:198-223
with_column            dataframe.rs:97-113, lazyframe.rs:58-95
with_column_renamed    dataframe.rs:116-124, lazyframe.rs:97-129
with_id                dataframe.rs:234-249
filter                 dataframe.rs:178-189, lazyframe.rs:149-161
limit                  dataframe.rs:166-175, lazyframe.rs:134-146
sort                   dataframe.rs:194-222, lazyframe.rs:253-283
join                   dataframe.rs:626-719, functions/join.rs:19-137
aggregate              lazyframe.rs:285-308 (execution panicked in the
                       reference, evaluation.rs:126 — implemented here)
intersect              dataframe.rs:251-253 (unimplemented!() stub)
union / except         absent in reference (free Spark upside, SURVEY §2.7)
uniques                table.rs:293-341
hist                   table.rs:244-290
display                dataframe.rs:227-229
=====================  =====================================================

Deviations from the reference are deliberate and follow SQL semantics (the
DuckDB oracle), per SURVEY §7.3:

* ``select`` raises on missing columns (the reference's eager path silently
  dropped them, dataframe.rs:272-280; its lazy path errored — we follow lazy).
* ``sort`` honours per-key ``nulls_first`` (the reference hard-coded
  nulls-last at execution, expression.rs:313-318).
* ``min`` is really min (reference bug: min called max, functions/aggregate.rs:22-31).
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence
from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["Frame", "SortCriteria", "JoinCriteria"]

_AGG_FNS = {
    # AggregateFunction enum (reference expression.rs:695-710).  The last five
    # were rejected at plan time in the reference ("not yet supported",
    # expression.rs:202-210); all are Spark built-ins.
    "sum": F.sum,
    "max": F.max,
    "min": F.min,  # reference's kernel had min==max bug; we use the real min
    "avg": F.avg,
    "count": F.count,
    "count_distinct": F.count_distinct,
    "first": F.first,
    "last": F.last,
    "kurtosis": F.kurtosis,
    "skewness": F.skewness,
    "stddev": F.stddev,
    "sum_distinct": F.sum_distinct,
    "variance": F.variance,
}


@dataclass(frozen=True)
class SortCriteria:
    """One sort key (reference expression.rs:305-310)."""

    column: str
    descending: bool = False
    nulls_first: bool | None = None  # None -> Spark default (asc: first, desc: last)

    def to_spark(self) -> Column:
        c = F.col(self.column)
        if self.descending:
            if self.nulls_first is True:
                return c.desc_nulls_first()
            if self.nulls_first is False:
                return c.desc_nulls_last()
            return c.desc()
        if self.nulls_first is True:
            return c.asc_nulls_first()
        if self.nulls_first is False:
            return c.asc_nulls_last()
        return c.asc()


_JOIN_TYPES = {
    # JoinType enum (reference expression.rs:334-340) + free Spark upside.
    "inner": "inner",
    "left": "left",
    "right": "right",
    "full": "outer",
    "outer": "outer",
    "semi": "left_semi",
    "anti": "left_anti",
    "cross": "cross",
}


@dataclass(frozen=True)
class JoinCriteria:
    """Multi-key equi-join spec (reference expression.rs:342-346)."""

    join_type: str
    criteria: Sequence[tuple[str, str]]  # (left_col, right_col) pairs


class Frame:
    """Thin wrapper over ``pyspark.sql.DataFrame`` with the reference verbs.

    Every method returns a new ``Frame``; the underlying Spark DataFrame is
    accessible as ``.df`` for interop and for dropping to raw Spark.
    """

    def __init__(self, df: DataFrame) -> None:
        self.df = df

    # -- schema access (reference dataframe.rs:61-94) -----------------------
    @property
    def schema(self):
        return self.df.schema

    @property
    def columns(self) -> list[str]:
        return self.df.columns

    def num_columns(self) -> int:
        return len(self.df.columns)

    def num_rows(self) -> int:
        return self.df.count()

    def column_by_name(self, name: str) -> Column:
        return self.df[name]

    def expr_column(self, name: str) -> Column:
        return F.col(name)

    # -- projection ---------------------------------------------------------
    def select(self, columns: Iterable[str | Column]) -> "Frame":
        cols = list(columns)
        if cols == ["*"]:
            return Frame(self.df.select("*"))
        return Frame(self.df.select(*cols))

    def drop(self, columns: Iterable[str]) -> "Frame":
        # Spark's drop ignores missing names, matching the reference's eager
        # semantics (dataframe.rs:302-337).
        return Frame(self.df.drop(*columns))

    def with_column(self, name: str, col: Column) -> "Frame":
        # Replaces in place when the name exists, like the reference
        # (dataframe.rs:97-113) — Spark's withColumn has identical semantics.
        return Frame(self.df.withColumn(name, col))

    def with_column_renamed(self, old: str, new: str) -> "Frame":
        return Frame(self.df.withColumnRenamed(old, new))

    def with_id(self, name: str = "id") -> "Frame":
        """Monotonically increasing (not contiguous) 64-bit id.

        The reference used chunk_index * 100_000 + offset (dataframe.rs:234-249);
        Spark's ``monotonically_increasing_id`` is partition_id << 33 + offset —
        same contract (unique, monotonic within partition, not dense), and it
        needs no global coordination so it scales to any cluster size.
        """
        return Frame(self.df.withColumn(name, F.monotonically_increasing_id()))

    def cast(self, name: str, dtype: str) -> "Frame":
        return Frame(self.df.withColumn(name, F.col(name).cast(dtype)))

    # -- filter / limit -----------------------------------------------------
    def filter(self, condition: Column | str) -> "Frame":
        return Frame(self.df.filter(condition))

    where = filter

    def limit(self, n: int) -> "Frame":
        return Frame(self.df.limit(n))

    # -- sort ---------------------------------------------------------------
    def sort(self, criteria: Sequence[SortCriteria | str]) -> "Frame":
        keys = [
            SortCriteria(c).to_spark() if isinstance(c, str) else c.to_spark()
            for c in criteria
        ]
        return Frame(self.df.orderBy(*keys))

    def top_k(self, criteria: Sequence[SortCriteria | str], k: int) -> "Frame":
        # Composed sort+limit (SURVEY §2.6); Spark plans TakeOrderedAndProject,
        # which holds only k rows per partition then k at the driver — the
        # scalable form of top-k (no full sort materialization).
        return self.sort(criteria).limit(k)

    # -- join ---------------------------------------------------------------
    def join(
        self,
        other: "Frame",
        criteria: JoinCriteria,
        *,
        broadcast_other: bool = False,
    ) -> "Frame":
        """Multi-key equi join with the reference's column-collision policy.

        Duplicate output names are prefixed ``a.``/``b.`` exactly like the
        reference's ``try_join`` (expression.rs:266-279).  Join-key columns keep
        both sides (the reference emitted both too — join keys can differ under
        outer joins).  ``broadcast_other`` hints Catalyst to broadcast the right
        side (for dim tables); AQE may also decide this at runtime.
        """
        how = _JOIN_TYPES[criteria.join_type]
        left, right = self.df, other.df
        if broadcast_other:
            right = F.broadcast(right)
        cond = None
        for lc, rc in criteria.criteria:
            # Plain equality: null keys never match (SQL semantics; the
            # reference excluded null-keyed rows too, functions/join.rs:64-68).
            clause = left[lc] == right[rc]
            cond = clause if cond is None else cond & clause
        joined = left.join(right, on=cond, how=how) if how != "cross" else left.crossJoin(right)
        if how in ("left_semi", "left_anti"):
            return Frame(joined)  # semi/anti emit left columns only
        # a./b. prefixing for duplicate names (reference expression.rs:266-279)
        lcols, rcols = set(self.df.columns), set(other.df.columns)
        dupes = lcols & rcols
        out = []
        for c in self.df.columns:
            out.append(left[c].alias(f"a.{c}") if c in dupes else left[c])
        for c in other.df.columns:
            out.append(right[c].alias(f"b.{c}") if c in dupes else right[c])
        return Frame(joined.select(*out))

    # -- aggregation (reference lazyframe.rs:285-308) -----------------------
    def aggregate(
        self,
        groups: Sequence[str],
        aggr: dict[str, Sequence[str]] | Sequence[tuple[str, str, str]],
    ) -> "Frame":
        """Group-by aggregation.

        ``aggr`` is either the reference shape ``{function: [columns...]}``
        (output names become ``fn(col)``, matching try_aggregate's naming,
        expression.rs:150-201) or a list of ``(function, column, alias)``.
        """
        exprs: list[Column] = []
        if isinstance(aggr, dict):
            for fn, cols in aggr.items():
                for c in cols:
                    exprs.append(_AGG_FNS[fn](c).alias(f"{fn}({c})"))
        else:
            for fn, c, alias in aggr:
                exprs.append(_AGG_FNS[fn](c).alias(alias))
        if groups:
            return Frame(self.df.groupBy(*groups).agg(*exprs))
        return Frame(self.df.agg(*exprs))

    def uniques(self, column: str) -> "Frame":
        """Distinct values of one column (reference table.rs:293-341)."""
        return Frame(self.df.select(column).distinct())

    def hist(self, column: str, nbins: int = 10, density: bool = False) -> "Frame":
        """Equal-width histogram (reference table.rs:244-290).

        Distributed form: one pass for min/max, then a width_bucket group-by —
        two scans, no driver-side data movement, scales linearly.
        """
        from .operators.histogram import hist

        return Frame(hist(self.df, column, nbins=nbins, density=density))

    # -- set ops (SURVEY §2.7) ----------------------------------------------
    def intersect(self, other: "Frame") -> "Frame":
        return Frame(self.df.intersect(other.df))

    def union(self, other: "Frame") -> "Frame":
        return Frame(self.df.unionByName(other.df))

    def except_all(self, other: "Frame") -> "Frame":
        return Frame(self.df.exceptAll(other.df))

    def distinct(self) -> "Frame":
        return Frame(self.df.distinct())

    # -- actions ------------------------------------------------------------
    def display(self, limit: int = 20) -> None:
        self.df.show(limit)

    def collect(self):
        return self.df.collect()

    def explain(self, mode: str = "formatted") -> None:
        self.df.explain(mode)

    # -- sinks (SURVEY §2.1) ------------------------------------------------
    def to_csv(self, path: str, mode: str = "overwrite") -> None:
        self.df.write.mode(mode).option("header", True).csv(path)

    def to_json(self, path: str, mode: str = "overwrite") -> None:
        self.df.write.mode(mode).json(path)

    def to_parquet(self, path: str, mode: str = "overwrite") -> None:
        self.df.write.mode(mode).parquet(path)
