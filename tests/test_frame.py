"""Frame wrapper tests reproducing the reference's fixtures (FIXTURES.md).

Fixture citations: join_test_j1/j2 (sql/postgresql/002.sql), sort fixture
(dataframe.rs:962-1003), aggregation micro-fixtures
(functions/aggregate.rs:122-146).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from rust_dataframe_spark import Frame, JoinCriteria, SortCriteria


@pytest.fixture(scope="module")
def j1(spark):
    # join_test_j1 (7 rows): nullable a with 3 NULLs + dup 6; b 1..6 + 60
    rows = [
        (1, 1, "alpha"), (None, 2, "beta"), (3, 3, "gamma"), (None, 4, "delta"),
        (5, 5, "epsilon"), (6, 6, "zeta"), (6, 60, "eta"),
    ]
    return Frame(spark.createDataFrame(rows, "a int, b int, c string"))


@pytest.fixture(scope="module")
def j2(spark):
    # join_test_j2 (9 rows): dup key 4 (x3); NaN/inf/NULL doubles
    rows = [
        (1, "alpha", 1.1), (2, "alpha", float("inf")), (3, "beta", float("nan")),
        (4, "gamma", None), (4, "delta", 4.4), (4, "epsilon", 7.000000000001),
        (7, "theta", 7.7), (8, "iota", 8.8), (9, "kappa", 9.9),
    ]
    return Frame(spark.createDataFrame(rows, "d int, e string, f double"))


class TestJoins:
    def test_inner_join_null_keys_excluded(self, j1, j2):
        # NULL keys must not match (reference functions/join.rs:64-68)
        out = j1.join(j2, JoinCriteria("inner", [("a", "d")]))
        rows = out.collect()
        assert all(r["a"] is not None for r in rows)

    def test_left_join_preserves_unmatched(self, j1, j2):
        out = j1.join(j2, JoinCriteria("left", [("a", "d")]))
        assert out.num_rows() >= j1.num_rows()
        nulls = [r for r in out.collect() if r["d"] is None]
        assert len(nulls) >= 3  # the 3 null-keyed rows at minimum

    def test_dup_keys_fan_out(self, j1, j2):
        # key 4 appears 3x in j2; a row in j1 with a=4 would multiply.
        # j1 has no a=4, but join on b=d: b=4 matches d=4 three times.
        out = j1.join(j2, JoinCriteria("inner", [("b", "d")]))
        match4 = [r for r in out.collect() if r["b"] == 4]
        assert len(match4) == 3

    def test_full_join_both_null_sides(self, j1, j2):
        out = j1.join(j2, JoinCriteria("full", [("a", "d")]))
        rows = out.collect()
        assert any(r["d"] is None for r in rows)  # unmatched left
        assert any(r["a"] is None and r["d"] is not None for r in rows)  # unmatched right

    def test_collision_prefixing(self, spark):
        # duplicate output names get a./b. prefixes (reference expression.rs:266-279)
        f1 = Frame(spark.createDataFrame([(1, "x")], "k int, v string"))
        f2 = Frame(spark.createDataFrame([(1, "y")], "k int, v string"))
        out = f1.join(f2, JoinCriteria("inner", [("k", "k")]))
        assert set(out.columns) == {"a.k", "a.v", "b.k", "b.v"}

    def test_semi_anti(self, j1, j2):
        semi = j1.join(j2, JoinCriteria("semi", [("a", "d")]))
        anti = j1.join(j2, JoinCriteria("anti", [("a", "d")]))
        assert semi.num_rows() + anti.num_rows() == j1.num_rows()


class TestSort:
    def test_sort_fixture(self, spark):
        # reference dataframe.rs:962-1003: a desc, b asc -> nulls last
        rows = [(1, 9), (1, 5), (None, 6), (3, 7), (3, 4), (4, 8)]
        f = Frame(spark.createDataFrame(rows, "a int, b int"))
        out = f.sort(
            [SortCriteria("a", descending=True, nulls_first=False), SortCriteria("b")]
        ).collect()
        assert [r["a"] for r in out] == [4, 3, 3, 1, 1, None]
        assert [r["b"] for r in out] == [8, 4, 7, 5, 9, 6]

    def test_nulls_first(self, spark):
        rows = [(1,), (None,), (3,)]
        f = Frame(spark.createDataFrame(rows, "a int"))
        out = f.sort([SortCriteria("a", nulls_first=True)]).collect()
        assert out[0]["a"] is None


class TestAggregate:
    def test_avg_ignores_nulls(self, spark):
        # reference functions/aggregate.rs:122-146: avg over 0..9 with nulls = 4.5
        vals = [(float(i),) for i in range(10)] + [(None,), (None,)]
        f = Frame(spark.createDataFrame(vals, "x double"))
        out = f.aggregate([], [("avg", "x", "avg_x"), ("count", "x", "cnt")]).collect()[0]
        assert out["avg_x"] == 4.5
        assert out["cnt"] == 10  # count counts non-null only

    def test_min_is_min(self, spark):
        # the reference's min kernel was a copy-paste of max (aggregate.rs:22-31)
        f = Frame(spark.createDataFrame([(5,), (1,), (9,)], "x int"))
        out = f.aggregate([], [("min", "x", "mn"), ("max", "x", "mx")]).collect()[0]
        assert out["mn"] == 1 and out["mx"] == 9

    def test_grouped_reference_naming(self, spark):
        f = Frame(spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)], "k string, v int"))
        out = f.aggregate(["k"], {"sum": ["v"], "count": ["v"]})
        assert set(out.columns) == {"k", "sum(v)", "count(v)"}


class TestFrameVerbs:
    def test_select_star_and_drop(self, spark):
        f = Frame(spark.createDataFrame([(1, 2, 3)], "a int, b int, c int"))
        assert f.select(["*"]).columns == ["a", "b", "c"]
        assert f.drop(["b", "nonexistent"]).columns == ["a", "c"]

    def test_with_column_replaces_in_place(self, spark):
        f = Frame(spark.createDataFrame([(1, 2)], "a int, b int"))
        out = f.with_column("b", F.col("a") + 10)
        assert out.columns == ["a", "b"]
        assert out.collect()[0]["b"] == 11

    def test_with_id_unique(self, spark):
        f = Frame(spark.createDataFrame([(i,) for i in range(100)], "x int"))
        ids = [r["id"] for r in f.with_id().collect()]
        assert len(set(ids)) == 100

    def test_limit_and_filter(self, spark):
        f = Frame(spark.createDataFrame([(i,) for i in range(50)], "x int"))
        assert f.filter(F.col("x") >= 40).num_rows() == 10
        assert f.limit(7).num_rows() == 7

    def test_intersect_union_except(self, spark):
        f1 = Frame(spark.createDataFrame([(1,), (2,), (3,)], "x int"))
        f2 = Frame(spark.createDataFrame([(2,), (3,), (4,)], "x int"))
        assert sorted(r["x"] for r in f1.intersect(f2).collect()) == [2, 3]
        assert sorted(r["x"] for r in f1.union(f2).distinct().collect()) == [1, 2, 3, 4]
        assert sorted(r["x"] for r in f1.except_all(f2).collect()) == [1]

    def test_hist(self, spark):
        f = Frame(spark.createDataFrame([(float(i),) for i in range(100)], "x double"))
        out = f.hist("x", nbins=4).collect()
        assert [r["count"] for r in out] == [25, 25, 25, 25]

    def test_uniques(self, spark):
        f = Frame(spark.createDataFrame([("a",), ("b",), ("a",)], "x string"))
        assert f.uniques("x").num_rows() == 2

    def test_topk(self, spark):
        f = Frame(spark.createDataFrame([(i,) for i in range(100)], "x int"))
        out = f.top_k([SortCriteria("x", descending=True)], 3).collect()
        assert [r["x"] for r in out] == [99, 98, 97]


def test_bench_headline_names_resolve():
    """Every bench.py HEADLINE name must exist in the catalog — a renamed
    or dropped query must fail HERE, not in the driver's bench run (the
    round-2 bench died on exactly this class of drift)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    from rust_dataframe_spark import catalog

    missing = [n for n in bench.HEADLINE if n not in catalog.QUERIES]
    assert missing == []


def test_every_query_has_oracle():
    """The driver records a weaker rows-only check for oracle-less queries;
    this repo's contract is 100% oracle coverage — enforce it."""
    from rust_dataframe_spark import catalog

    assert set(catalog.QUERIES) == set(catalog.ORACLE)
