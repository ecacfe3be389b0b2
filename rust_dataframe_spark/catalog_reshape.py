"""Reshape / frame-restructuring catalog: pivot, unpivot, grouping sets,
multiset set-ops, and GROUPS-mode window frames.

All of these are absent from the reference (SURVEY §2.5 lists cube/rollup as
'free upside'; §2.7's set ops are stubs `dataframe.rs:251-253`; §2.10's
WindowSpec `src/window.rs:14-19` declares only rows/range framing) — they
complete the SQL-surface the reference aspired to.

Scale notes inline; the common posture: each query is a single shuffle on its
grouping/partition key, pivot fan-out is bounded by an explicit value list
(never `pivot(col)` without values at scale — that triggers a driver-side
distinct collect), and set-ops hash-partition both sides on the full row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .catalog import query, table
from .sources.lakehouse_util import local_rows_df as _lrd


@query(
    "q98_window_groups",
    oracle="""
    WITH ranked AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice,
             dense_rank() OVER (PARTITION BY o_orderstatus
                                ORDER BY date_trunc('month', o_orderdate)) AS dr
      FROM orders WHERE o_orderkey < 2000
    )
    SELECT o_orderkey, o_orderstatus,
           round(sum(o_totalprice) OVER w, 2) AS grp_sum,
           count(*) OVER w AS grp_cnt
    FROM ranked
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY dr
                 RANGE BETWEEN 1 PRECEDING AND CURRENT ROW)
    ORDER BY o_orderkey
    """,
)
def q98_window_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPS-mode window frames (the third SQL framing mode, alongside the
    reference's declared rows/range `src/window.rs:14-19`).

    Spark has no GROUPS frames, so we emulate exactly: ``dense_rank`` numbers
    the peer groups consecutively, then a RANGE frame over that integer rank
    (``rangeBetween(-1, 0)``) selects precisely the current peer group plus
    the one preceding group — the definition of
    ``GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW``.  DuckDB has not
    implemented GROUPS mode either (parser error), so the oracle states the
    same dense-rank-over-RANGE formulation in SQL — the values are still
    computed independently by both engines.

    Scale: both windows partition on the same key → one exchange, two sorts
    (month, then rank); frames are tie-inclusive whole groups, so the result
    is deterministic without a tie-break key.
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    month = F.date_trunc("month", F.col("o_orderdate"))
    w_peer = Window.partitionBy("o_orderstatus").orderBy(month)
    ranked = o.withColumn("_dr", F.dense_rank().over(w_peer))
    w_grp = (
        Window.partitionBy("o_orderstatus").orderBy("_dr").rangeBetween(-1, Window.currentRow)
    )
    return (
        ranked.select(
            "o_orderkey",
            "o_orderstatus",
            F.round(F.sum("o_totalprice").over(w_grp), 2).alias("grp_sum"),
            F.count(F.lit(1)).over(w_grp).alias("grp_cnt"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q99_pivot",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
           round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS total_o,
           round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS total_f,
           round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS total_p
    FROM orders
    GROUP BY 1
    ORDER BY yr
    """,
)
def q99_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): revenue by year × order status.

    The value list is explicit (``['O','F','P']``) — at 100 TB an implicit
    ``pivot(col)`` first runs a driver-side ``distinct().collect()`` over the
    pivot column, which is both a hidden job and an OOM hazard; with explicit
    values the pivot compiles to two map-side-partial aggregate phases
    (agg by (yr, status), then PivotFirst by yr) whose shuffles each carry
    only O(groups × values) rows — the CASE-WHEN form the oracle uses does it
    in one phase, but both are group-bounded, not data-bounded.
    """
    o = table(spark, sf_dir, "orders")
    return (
        o.withColumn("yr", F.year("o_orderdate").cast("bigint"))
        .groupBy("yr")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
        .select(
            "yr",
            F.col("O").alias("total_o"),
            F.col("F").alias("total_f"),
            F.col("P").alias("total_p"),
        )
        .orderBy("yr")
    )


@query(
    "q100_unpivot",
    oracle="""
    SELECT c_custkey, 'acctbal' AS metric, round(c_acctbal, 2) AS value
    FROM customer WHERE c_custkey < 200
    UNION ALL
    SELECT c_custkey, 'namelen', CAST(length(c_name) AS DOUBLE)
    FROM customer WHERE c_custkey < 200
    UNION ALL
    SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE)
    FROM customer WHERE c_custkey < 200
    ORDER BY c_custkey, metric
    """,
)
def q100_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt (wide→long) via ``DataFrame.unpivot`` — the inverse of
    q99.  All value columns are cast to a common type (double) first, as
    unpivot requires a least-common-type value column.

    Scale: unpivot is a narrow (no-shuffle) row-expansion — output is
    k × input rows; the ORDER BY here is presentation-only.
    """
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    wide = c.select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.length("c_name").cast("double").alias("namelen"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    return wide.unpivot(
        ids=["c_custkey"],
        values=["acctbal", "namelen", "nationkey"],
        variableColumnName="metric",
        valueColumnName="value",
    ).orderBy("c_custkey", "metric")


@query(
    "q101_setops_all",
    oracle="""
    WITH s1 AS (SELECT l_quantity FROM lineitem WHERE l_orderkey < 300),
         s2 AS (SELECT l_quantity FROM lineitem WHERE l_orderkey BETWEEN 200 AND 500)
    SELECT
      (SELECT count(*) FROM (SELECT l_quantity FROM s1 INTERSECT ALL SELECT l_quantity FROM s2)) AS n_intersect_all,
      (SELECT count(*) FROM (SELECT l_quantity FROM s1 EXCEPT ALL SELECT l_quantity FROM s2))    AS n_except_all,
      (SELECT count(*) FROM (SELECT l_quantity FROM s1 UNION ALL SELECT l_quantity FROM s2))     AS n_union_all
    """,
)
def q101_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) set operations — INTERSECT ALL / EXCEPT ALL preserve
    duplicate multiplicity, completing q32's distinct-set variants (the
    reference's lone set-op stub is `dataframe.rs:251-253`).

    Scale: Spark plans both as a hash aggregation on the full row computing
    per-side multiplicities — one shuffle each, no driver materialization.
    """
    li = table(spark, sf_dir, "lineitem")
    s1 = li.filter(F.col("l_orderkey") < 300).select("l_quantity")
    s2 = li.filter(F.col("l_orderkey").between(200, 500)).select("l_quantity")
    n_i = s1.intersectAll(s2).count()
    n_e = s1.exceptAll(s2).count()
    n_u = s1.unionAll(s2).count()
    return _lrd(spark, 
        [(n_i, n_e, n_u)],
        "n_intersect_all bigint, n_except_all bigint, n_union_all bigint",
    )


_Q102_SQL = """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS cnt,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY status, priority
"""


@query("q102_grouping_sets", oracle=_Q102_SQL)
def q102_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form of q24's cube/rollup) — the
    exact same ANSI text runs through ``spark.sql`` and DuckDB (q04's
    one-dialect-two-engines pattern).  The grouped columns are non-null, so
    ``coalesce(..., 'ALL')`` unambiguously labels the grand-total rows.

    Scale: one shuffle computes all three grouping sets (Spark expands to an
    internal grouping-id key, still map-side partial).
    """
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_Q102_SQL)


@query(
    "q108_merge_upsert",
    oracle="""
    WITH tgt AS (
      SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal FROM customer
    ),
    src AS (
      SELECT c_custkey, 'UPDATED-' || c_name AS c_name,
             round(c_acctbal + 1000, 2) AS c_acctbal
      FROM customer WHERE c_custkey < 100
      UNION ALL
      SELECT c_custkey + 1000000, 'NEW-' || c_name, round(c_acctbal, 2)
      FROM customer WHERE c_custkey < 50
    ),
    merged AS (
      SELECT coalesce(s.c_custkey, t.c_custkey) AS c_custkey,
             CASE WHEN s.c_custkey IS NOT NULL THEN s.c_name    ELSE t.c_name    END AS c_name,
             CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal ELSE t.c_acctbal END AS c_acctbal
      FROM tgt t FULL JOIN src s ON t.c_custkey = s.c_custkey
    )
    SELECT c_custkey, c_name, c_acctbal FROM merged
    WHERE c_custkey < 150 OR c_custkey >= 1000000
    ORDER BY c_custkey
    """,
)
def q108_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-1 merge/upsert (operators/merge.merge_upsert): a delta of updated
    rows (keys < 100) and brand-new rows (keys + 1,000,000) merged into the
    canonical customer table; updated rows replace wholesale, new rows
    insert, the rest carry over.  Output window straddles all three classes.
    """
    from .operators.merge import merge_upsert

    c = table(spark, sf_dir, "customer")
    tgt = c.select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal"))
    updates = c.filter(F.col("c_custkey") < 100).select(
        "c_custkey",
        F.concat(F.lit("UPDATED-"), F.col("c_name")).alias("c_name"),
        F.round(F.col("c_acctbal") + 1000, 2).alias("c_acctbal"),
    )
    inserts = c.filter(F.col("c_custkey") < 50).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.lit("NEW-"), F.col("c_name")).alias("c_name"),
        F.round("c_acctbal", 2).alias("c_acctbal"),
    )
    merged = merge_upsert(tgt, updates.unionAll(inserts), keys=["c_custkey"])
    return merged.filter(
        (F.col("c_custkey") < 150) | (F.col("c_custkey") >= 1000000)
    ).orderBy("c_custkey")


_Q109_SQL = """
    SELECT o.o_orderkey,
           round(o.o_totalprice, 2) AS total,
           round(o.o_totalprice / (SELECT avg(o_totalprice) FROM orders), 6) AS vs_avg
    FROM orders o
    WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49
          )
      AND NOT EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
          )
      AND o.o_orderkey < 20000
    ORDER BY o.o_orderkey
"""


@query("q109_subqueries", oracle=_Q109_SQL)
def q109_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS + an uncorrelated scalar subquery —
    the q04 one-dialect-two-engines pattern (identical ANSI text through
    ``spark.sql`` and DuckDB).

    Scale: Catalyst decorrelates EXISTS into a left-semi and NOT EXISTS into
    a left-anti join on l_orderkey (no per-row re-execution — the subquery
    rewrite the reference never attempted, SURVEY §4.1); the scalar subquery
    evaluates once and broadcasts as a literal.
    """
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_Q109_SQL)


_Q110_SQL = """
    SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS total
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    WHERE c.c_custkey < 200
    ORDER BY c.c_custkey, total DESC, t.o_orderkey
"""


@query("q110_lateral_topn", oracle=_Q110_SQL)
def q110_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (top-2 orders per customer) — identical
    ANSI text through ``spark.sql`` and DuckDB.  The classic per-group top-n
    as a join shape instead of a row_number window.

    Scale: Spark decorrelates the lateral into a window/rank over a single
    shuffle on the correlation key — same cost class as the q50-style
    row_number formulation; nothing executes per-outer-row.
    """
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_Q110_SQL)
