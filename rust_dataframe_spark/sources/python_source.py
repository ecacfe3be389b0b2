"""Spark 4 Python DataSource — the reference's pluggable-source trait, realized.

Reference parity: `io/datasource.rs:87-111` declares a ``DataSource`` trait
(``next_batch`` plus pushdown capability flags) whose only implementation is
an all-``todo!`` ``CsvDataSource``, and `context.rs:8-23` sketches a
datasource registry.  Spark 4's Python DataSource API
(``pyspark.sql.datasource``) is the production form of exactly that idea: a
registered class supplies schema + partition list + per-partition row
iterator, and Spark handles distribution, projection, and planning.

``GraftRangeDataSource`` is a deterministic synthetic source (rows
``(id, val=sqrt(id))`` for ``id`` in ``[0, n)``) split into ``parts`` input
partitions — each partition is read by a separate task, so the source is
genuinely distributed, not a driver-side materialization.

Scale: a custom source's ``partitions()`` list is the unit of parallelism —
at 100 TB the implementor must return enough partitions (and make ``read``
streaming, as here) for the cluster to saturate; nothing is collected on the
driver.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class GraftRangeDataSource(DataSource):
    """``spark.read.format("graft_range").option("n", N).option("parts", P)``."""

    @classmethod
    def name(cls) -> str:
        return "graft_range"

    def schema(self) -> str:
        return "id bigint, val double"

    def reader(self, schema) -> "GraftRangeReader":
        return GraftRangeReader(self.options)


class GraftRangeReader(DataSourceReader):
    """Reader with genuine filter pushdown (the reference's
    ``supports_filtering`` capability flag, io/datasource.rs:94-106).

    ``pushFilters`` narrows the generated range for comparison filters on
    ``id`` BEFORE ``partitions()`` is computed, so pruned rows are never
    generated and fully-pruned partitions never become tasks.  Unsupported
    filters are returned for Spark to re-apply post-scan (the v2 contract).
    Limit pushdown has no hook in the Spark 4.1 Python DataSource API —
    documented in COVERAGE.md.
    """

    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = max(1, int(options.get("parts", 8)))
        self.lo = 0
        self.hi = self.n

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            attr = getattr(f, "attribute", None)
            value = getattr(f, "value", None)
            if tuple(attr or ()) == ("id",) and isinstance(value, int):
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, value + 1)
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, value)
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, value)
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, value + 1)
                    continue
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, value)
                    self.hi = min(self.hi, value + 1)
                    continue
            yield f  # not handled — Spark re-applies it after the scan

    def partitions(self):
        lo, hi = self.lo, min(self.hi, self.n)
        if hi <= lo:
            return [_RangePartition(0, 0)]  # fully pruned
        span = hi - lo
        step = max(1, -(-span // self.parts))
        return [_RangePartition(s, min(s + step, hi)) for s in range(lo, hi, step)]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield (i, math.sqrt(i))


def register(spark: SparkSession) -> None:
    """Idempotently register the source with this session."""
    spark.dataSource.register(GraftRangeDataSource)
