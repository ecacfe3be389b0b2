"""Plan-shape guardrails for the completed TPC-H suite (catalog_tpch2).

Each test pins the property that makes the query survive a 100 TB scale-up:
no nested-loop joins anywhere, EXISTS/NOT-IN compiled to semi/anti hash
joins, dims broadcast, disjunctive predicate envelopes pushed to the scans.
"""

from __future__ import annotations

from rust_dataframe_spark import catalog
from rust_dataframe_spark.plans import inspect as pi

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    return pi.physical_plan(catalog.QUERIES[name](spark, SF))


def test_no_nested_loop_join_in_any_tpch_query(spark):
    """The whole 22-query suite plans without a single nested-loop or
    cartesian join — every scalar subquery is a 1-row broadcast, every
    EXISTS a hash semi join."""
    tpch = [
        "q01_pricing_summary", "q06_revenue_forecast", "q16_join_star_tpch5",
        "q103_tpch_q3", "q104_tpch_q18", "q169_tpch_q10", "q170_tpch_q7",
        "q183_tpch_q2", "q184_tpch_q4", "q185_tpch_q8", "q186_tpch_q9",
        "q187_tpch_q11", "q188_tpch_q12", "q189_tpch_q13", "q190_tpch_q14",
        "q191_tpch_q15", "q192_tpch_q16", "q193_tpch_q17", "q194_tpch_q19",
        "q195_tpch_q20", "q196_tpch_q21", "q197_tpch_q22",
    ]
    for name in tpch:
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        # 1-row scalar broadcasts legitimately use BroadcastNestedLoopJoin
        # (no join key exists); anything bigger must hash.
        for line in plan.splitlines():
            if "BroadcastNestedLoopJoin" in line:
                assert name in {
                    "q187_tpch_q11", "q190_tpch_q14", "q191_tpch_q15",
                    "q197_tpch_q22",
                }, f"{name}: unexpected NLJ: {line.strip()}"


def test_q2_dims_broadcast_and_windowed_min(spark):
    df = catalog.QUERIES["q183_tpch_q2"](spark, SF)
    plan = pi.physical_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "Window" in plan  # per-part min is one window, not a re-join
    # supply agg + window repartition: the big side never shuffles twice
    assert pi.exchange_count(df) <= 2


def test_q4_exists_via_preaggregate(spark):
    """EXISTS(line later than X) is computed as max(l_shipdate) per order —
    a map-side-combined HashAggregate — never a semi join over raw lines."""
    plan = _plan(spark, "q184_tpch_q4")
    assert "HashAggregate" in plan
    assert "partial_max(l_shipdate" in plan  # map-side combine before shuffle
    assert "LeftSemi" not in plan
    assert "CartesianProduct" not in plan


def test_q16_not_in_is_anti_join(spark):
    plan = _plan(spark, "q192_tpch_q16")
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan  # part dim + excluded suppliers


def test_q19_disjunction_envelope_pushed(spark):
    df = catalog.QUERIES["q194_tpch_q19"](spark, SF)
    pushed = pi.pushed_filters(df)
    # Catalyst extracts the common OR-envelope and pushes it to both scans
    assert "l_quantity" in pushed
    assert "p_brand" in pushed or "p_size" in pushed


def test_q21_single_pass_decorrelation(spark):
    """The EXISTS + NOT EXISTS pair costs one per-(order,supplier)
    aggregate plus a window on the already-shuffled order key — no expand
    (the count_distinct trap), no semi/anti join over lineitem."""
    df = catalog.QUERIES["q196_tpch_q21"](spark, SF)
    plan = pi.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Expand" not in plan  # no multi-distinct expansion
    assert plan.count("LeftSemi") + plan.count("LeftAnti") == 0
    assert pi.exchange_count(df) <= 3
    assert pi.has_take_ordered(df)  # top-50 never globally sorts


def test_q22_anti_join_and_broadcast_scalar(spark):
    plan = _plan(spark, "q197_tpch_q22")
    assert "LeftAnti" in plan


def test_q15_revenue_relation_not_scanned_twice(spark):
    """Q15's rev view feeds both the max scalar and the equality filter;
    lineitem must be scanned at most twice (once per branch) and the final
    result ordered without a global sort of anything big."""
    df = catalog.QUERIES["q191_tpch_q15"](spark, SF)
    plan = pi.physical_plan(df)
    assert plan.count("FileScan parquet") <= 3  # 2x lineitem branches + supplier
