"""Window-function catalog (SURVEY §2.10).

The reference declared the whole rank/lag/lead family plus a WindowSpec with
partition_by/order_by/rows_between/range_between but implemented none of it
(functions/window.rs:1-11, src/window.rs:1-22, "sticking close to what Spark
does").  Spark's ``Window`` spec is the exact target shape, so every query here
is spec-to-built-in.

Determinism rules for the oracle hash: ``row_number``/``lag``/``lead``/``ntile``
always run over a *total* order (unique tie-break key); ``rank``/``dense_rank``/
``percent_rank``/``cume_dist`` are tie-stable by definition; frame aggregates
use either a total order (ROWS) or tie-inclusive frames (RANGE).

Scale: a window over ``partitionBy(k)`` is one shuffle on k, same cost class as
a groupBy on k; skewed partitions are the hazard at 100 TB — for global-order
windows (q53) Spark uses a range-partitioned sort, which scales, but a single
giant partition key would not; extension operators avoid partition-free windows
except on pre-aggregated (small) inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .catalog import query, table


@query(
    "q50_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey,
           row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
           rank()       OVER (PARTITION BY o_custkey ORDER BY date_trunc('month', o_orderdate)) AS rnk,
           dense_rank() OVER (PARTITION BY o_custkey ORDER BY date_trunc('month', o_orderdate)) AS drnk
    FROM orders
    WHERE o_custkey < 50
    ORDER BY o_custkey, o_orderkey
    """,
)
def q50_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank (reference stubs functions/window.rs:5,8,10).

    row_number runs over a total order (date + unique orderkey); rank and
    dense_rank run over a coarser, tie-producing key (order month) to actually
    exercise tie semantics.
    """
    o = table(spark, sf_dir, "orders")
    w_total = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_ties = Window.partitionBy("o_custkey").orderBy(F.date_trunc("month", F.col("o_orderdate")))
    return (
        o.filter(F.col("o_custkey") < 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w_total).alias("rn"),
            F.rank().over(w_ties).alias("rnk"),
            F.dense_rank().over(w_ties).alias("drnk"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "q51_window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(lag(o_totalprice)  OVER w, 2)        AS prev_price,
           round(lead(o_totalprice) OVER w, 2)        AS next_price,
           round(lag(o_totalprice, 2, 0.0) OVER w, 2) AS prev2_price
    FROM orders
    WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def q51_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead with offsets and defaults (reference stubs window.rs:4,6)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.filter(F.col("o_custkey") < 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
            F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
            F.round(F.lag("o_totalprice", 2, 0.0).over(w), 2).alias("prev2_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "q52_window_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           round(avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4)         AS moving_avg
    FROM orders
    WHERE o_custkey < 50
    ORDER BY o_custkey, o_orderkey
    """,
)
def q52_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows_between frames (reference WindowSpec stub src/window.rs:14-19):
    running total + moving average."""
    o = table(spark, sf_dir, "orders")
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_mov = base.rowsBetween(-3, Window.currentRow)
    return (
        o.filter(F.col("o_custkey") < 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w_run), 2).alias("running_total"),
            F.round(F.avg("o_totalprice").over(w_mov), 4).alias("moving_avg"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "q53_window_ntile_cume",
    oracle="""
    SELECT o_orderkey,
           ntile(4)       OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cume
    FROM orders
    WHERE o_orderkey < 2000
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey
    """,
)
def q53_window_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile (reference stub scalar.rs:345), percent_rank, cume_dist
    (window.rs:1,7) over a global total order.

    Scale note: a partition-less window forces a single-range sort; acceptable
    only on pre-filtered/pre-aggregated inputs as here (keyspace < 2000 rows).
    """
    o = table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.filter(F.col("o_orderkey") < 2000)
        .select(
            "o_orderkey",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q54_window_range",
    oracle="""
    SELECT o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                 RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW), 2) AS range_sum,
           count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                 RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)     AS range_cnt
    FROM orders
    WHERE o_orderkey < 2000
    ORDER BY o_orderkey
    """,
)
def q54_window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """range_between value-based frames (reference WindowSpec stub
    src/window.rs:14-16): all peers within 10000 price units preceding.
    RANGE frames are tie-inclusive, so the result is deterministic without a
    tie-break key."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, Window.currentRow)
    )
    return (
        o.filter(F.col("o_orderkey") < 2000)
        .select(
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("range_sum"),
            F.count(F.lit(1)).over(w).alias("range_cnt"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q58_window_value_fns",
    oracle="""
    SELECT o_orderkey,
           o_custkey,
           first_value(o_orderkey) OVER w AS first_k,
           last_value(o_orderkey) OVER
             (PARTITION BY o_custkey ORDER BY o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_k,
           nth_value(o_orderkey, 2) OVER
             (PARTITION BY o_custkey ORDER BY o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_k
    FROM orders WHERE o_orderkey < 2000
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    ORDER BY o_orderkey
    """,
)
def q58_window_value_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value/nth_value over explicit frames — last/nth need
    the full-partition frame (the default RANGE..CURRENT ROW frame makes
    last_value just the current row, a classic window pitfall both engines
    share)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    w_run = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    w_full = w_run.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w_run).alias("first_k"),
        F.last("o_orderkey").over(w_full).alias("last_k"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_k"),
    ).orderBy("o_orderkey")
