"""Window function catalog (SURVEY §2.10).

Reference: all declared, zero implemented (functions/window.rs:1-11 — the
comment says "sticking close to what Spark does"; src/window.rs:1-22 sketches
the WindowSpec trait with order_by/partition_by/range_between/rows_between).
``pyspark.sql.Window`` IS that spec; this module just names the mapping and
provides a builder mirroring the reference trait.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Window, WindowSpec, functions as F

__all__ = ["WINDOW_FUNCTIONS", "window_spec", "get"]

WINDOW_FUNCTIONS: dict[str, object] = {
    "cume_dist": F.cume_dist,
    "dense_rank": F.dense_rank,
    "lag": F.lag,
    "lead": F.lead,
    "percent_rank": F.percent_rank,
    "rank": F.rank,
    "row_number": F.row_number,
    "ntile": F.ntile,  # filed under scalar in the reference (scalar.rs:345)
    "nth_value": F.nth_value,  # free upside
}


def window_spec(
    partition_by: Sequence[str] = (),
    order_by: Sequence[str] = (),
    rows_between: tuple[int, int] | None = None,
    range_between: tuple[int, int] | None = None,
) -> WindowSpec:
    """Build a WindowSpec the way the reference trait sketches it
    (src/window.rs:8-21).  rows/range bounds accept
    Window.unboundedPreceding / Window.currentRow / Window.unboundedFollowing.
    """
    w = Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    if order_by:
        w = w.orderBy(*order_by)
    if rows_between is not None and range_between is not None:
        raise ValueError("specify rows_between or range_between, not both")
    if rows_between is not None:
        w = w.rowsBetween(*rows_between)
    if range_between is not None:
        w = w.rangeBetween(*range_between)
    return w


def get(name: str):
    return WINDOW_FUNCTIONS[name]
