"""Plan inspection helpers: assert the physical plan has the shape you want
(pushdown reached the scan, the dim join broadcast, codegen is on).

These are the engine's guardrails for the 100 TB posture — used in tests so a
regression in plan shape fails CI, not production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = [
    "physical_plan",
    "pushed_filters",
    "read_schema_columns",
    "has_broadcast_join",
    "codegen_stage_count",
    "exchange_count",
    "has_take_ordered",
]


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the scan node(s)."""
    plan = formatted_plan(df)
    return "\n".join(line.strip() for line in plan.splitlines() if "PushedFilters" in line)


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the source (column pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            inner = line.split("struct<", 1)[-1].rstrip(">")
            cols.extend(f.split(":")[0] for f in inner.split(",") if ":" in f)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    """Count distinct WholeStageCodegen stages (the ``*(N)`` markers in the
    plan).  NB: with AQE the pre-execution plan is not final
    (isFinalPlan=false) and reports 0 — run an action on ``df`` first to
    inspect the real executed plan."""
    import re

    return len(set(re.findall(r"\*\((\d+)\)", physical_plan(df))))


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges — the metric to minimize."""
    plan = physical_plan(df)
    return sum(1 for line in plan.splitlines() if "Exchange" in line and "Broadcast" not in line)


def has_take_ordered(df: DataFrame) -> bool:
    """Top-k planned as TakeOrderedAndProject (not global sort + limit)."""
    return "TakeOrderedAndProject" in physical_plan(df)
