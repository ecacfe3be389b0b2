"""Function-catalog tests: every reference name resolves; spot-check values
(incl. the functions DuckDB lacks, which the oracle queries can't cover:
sha1, crc32, soundex, initcap, format_number, conv, months_between...)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from rust_dataframe_spark.functions import aggregate as agg_cat
from rust_dataframe_spark.functions import array as arr_cat
from rust_dataframe_spark.functions import scalar as sc_cat
from rust_dataframe_spark.functions import window as win_cat

# Names the reference declares (SURVEY §2.8-2.10) — the parity contract.
REFERENCE_SCALARS = [
    "add", "subtract", "multiply", "divide", "abs", "acos", "asin", "atan",
    "atan2", "cbrt", "ceil", "cos", "cosh", "degrees", "exp", "expm1", "floor",
    "hypot", "log", "log10", "log2", "radians", "round", "sin", "sinh", "sqrt",
    "tan", "tanh", "lower", "upper", "ltrim", "rtrim", "trim", "substring",
    "hour", "add_months", "asc", "base64", "bitwise_not", "coalesce", "concat",
    "concat_ws", "conv", "corr", "crc32", "current_date", "current_timestamp",
    "date_add", "date_format", "date_sub", "date_trunc", "date_diff",
    "day_of_month", "day_of_week", "day_of_year", "desc", "explode",
    "factorial", "format_number", "format_string", "from_json",
    "from_unix_time", "from_utc_timestamp", "greatest", "hash", "hex",
    "initcap", "last_day", "least", "length", "levenshtein", "lit", "locate",
    "lpad", "md5", "minute", "monotonically_increasing_id", "month",
    "months_between", "nanvl", "next_day", "ntile", "pow", "quarter", "rand",
    "randn", "regexp_extract", "regexp_replace", "repeat", "reverse", "rint",
    "rpad", "second", "sequence", "sha1", "sha2", "shift_left", "shift_right",
    "shift_right_unsigned", "shuffle", "signum", "size", "slice", "sort_array",
    "soundex", "split", "struct", "substring_index", "to_date", "to_json",
    "to_timestamp", "to_utc_timestamp", "translate", "trunc", "unbase64",
    "unhex", "unix_timestamp", "week_of_year", "when", "window", "year",
]

REFERENCE_AGGREGATES = [
    "sum", "max", "min", "avg", "count", "count_distinct", "first", "last",
    "kurtosis", "skewness", "stddev", "sum_distinct", "variance",
    "collect_list", "collect_set",
]

REFERENCE_ARRAYS = [
    "array_contains", "array_distinct", "array_except", "array_intersect",
    "array_max", "array_min", "array_position", "array_remove", "array_repeat",
    "array_sort", "array_union", "array_join", "arrays_overlap", "arrays_zip",
    "collect_list", "collect_set", "map_concat", "map_from_arrays",
    "map_from_entries", "map_keys", "map_values",
]

REFERENCE_WINDOWS = [
    "cume_dist", "dense_rank", "lag", "lead", "percent_rank", "rank",
    "row_number", "ntile",
]


class TestSurfaceComplete:
    def test_all_scalar_names_present(self):
        missing = [n for n in REFERENCE_SCALARS if n not in sc_cat.SCALAR_FUNCTIONS]
        assert not missing, f"missing scalar fns: {missing}"

    def test_all_aggregate_names_present(self):
        missing = [n for n in REFERENCE_AGGREGATES if n not in agg_cat.AGGREGATE_FUNCTIONS]
        assert not missing

    def test_all_array_names_present(self):
        missing = [n for n in REFERENCE_ARRAYS if n not in arr_cat.ARRAY_FUNCTIONS]
        assert not missing

    def test_all_window_names_present(self):
        missing = [n for n in REFERENCE_WINDOWS if n not in win_cat.WINDOW_FUNCTIONS]
        assert not missing


class TestOracleGapFunctions:
    """Functions DuckDB can't oracle — exact expected values asserted here."""

    def test_sha1_crc32_soundex_initcap(self, spark):
        df = spark.createDataFrame([Row(s="Robert")])
        r = df.select(
            F.sha1("s").alias("sha1"),
            F.crc32("s").alias("crc"),
            F.soundex("s").alias("sdx"),
            F.initcap(F.lit("hello world")).alias("ic"),
            F.format_number(F.lit(1234567.891), 2).alias("fmt"),
            F.conv(F.lit("ff"), 16, 10).alias("conv"),
            F.hash("s").alias("h"),
            F.xxhash64("s").alias("xx"),
        ).first()
        import hashlib
        import zlib

        assert r["sha1"] == hashlib.sha1(b"Robert").hexdigest()
        assert r["crc"] == zlib.crc32(b"Robert")
        assert r["sdx"] == "R163"
        assert r["ic"] == "Hello World"
        assert r["fmt"] == "1,234,567.89"
        assert r["conv"] == "255"
        assert isinstance(r["h"], int) and isinstance(r["xx"], int)

    def test_months_between_next_day(self, spark):
        df = spark.createDataFrame([Row(d="2020-01-31")])
        r = df.select(
            F.months_between(F.lit("2020-03-31").cast("date"), F.col("d").cast("date")).alias("mb"),
            F.next_day(F.col("d").cast("date"), "Mon").alias("nd"),
            F.trunc(F.col("d").cast("date"), "month").alias("tr"),
        ).first()
        assert r["mb"] == 2.0
        assert str(r["nd"]) == "2020-02-03"
        assert str(r["tr"]) == "2020-01-01"

    def test_rand_randn_seeded(self, spark):
        df = spark.range(5)
        a = [r[0] for r in df.select(F.rand(42)).collect()]
        b = [r[0] for r in df.select(F.rand(42)).collect()]
        assert a == b  # seeded determinism
        assert all(0.0 <= x < 1.0 for x in a)

    def test_substring_zero_based_adapter(self, spark):
        df = spark.createDataFrame([Row(s="abcdef")])
        r = df.select(sc_cat.substring_zero_based(F.col("s"), 0, 3).alias("z")).first()
        assert r["z"] == "abc"  # reference 0-based == Spark substring(s,1,3)

    def test_repeat_list_adapter(self, spark):
        df = spark.createDataFrame([Row(xs=[1, 2])])
        r = df.select(arr_cat.repeat_list(F.col("xs"), 2).alias("r")).first()
        assert r["r"] == [1, 2, 1, 2]  # reference repeats the list, not elements

    def test_nanvl_nan_handling(self, spark):
        df = spark.createDataFrame([(float("nan"), 1.0)], "a double, b double")
        assert df.select(F.nanvl("a", "b")).first()[0] == 1.0


class TestWindowSpecBuilder:
    def test_rows_between(self, spark):
        from pyspark.sql import Window

        df = spark.createDataFrame([(1, i) for i in range(5)], "k int, v int")
        w = win_cat.window_spec(
            partition_by=["k"], order_by=["v"],
            rows_between=(Window.unboundedPreceding, Window.currentRow),
        )
        out = [r["s"] for r in df.select(F.sum("v").over(w).alias("s")).collect()]
        assert out == [0, 1, 3, 6, 10]

    def test_rejects_both_frames(self):
        with pytest.raises(ValueError):
            win_cat.window_spec(order_by=["x"], rows_between=(0, 0), range_between=(0, 0))


class TestApproxAggregates:
    """Scale substitutes for exact count_distinct/percentile: error-bounded,
    fixed-memory, mergeable (SCALE.md aggregation section)."""

    def test_approx_count_distinct_within_rsd(self, spark):
        from pyspark.sql import functions as F

        df = spark.range(10000).select((F.col("id") % 1234).alias("k"))
        approx = df.agg(F.approx_count_distinct("k", rsd=0.05).alias("a")).first()["a"]
        assert abs(approx - 1234) / 1234 < 0.15  # 3x rsd slack

    def test_percentile_approx_brackets_exact(self, spark):
        from pyspark.sql import functions as F

        df = spark.range(10001).select(F.col("id").cast("double").alias("v"))
        got = df.agg(F.percentile_approx("v", 0.5, 10000).alias("p")).first()["p"]
        assert abs(got - 5000.0) <= 10


class TestUDAF:
    def test_geometric_mean_grouped_agg(self, spark):
        import math

        from pyspark.sql import functions as F
        from rust_dataframe_spark.functions.aggregate import geometric_mean_udaf

        df = spark.createDataFrame(
            [("a", 2.0), ("a", 8.0), ("b", 3.0), ("b", 27.0)], "k string, v double"
        )
        gm = geometric_mean_udaf()
        out = {r["k"]: r["gm"] for r in df.groupBy("k").agg(gm("v").alias("gm")).collect()}
        assert abs(out["a"] - 4.0) < 1e-9          # sqrt(2*8)
        assert abs(out["b"] - 9.0) < 1e-9          # sqrt(3*27)
        # equals the partial-aggregating built-in composition
        built = {r["k"]: r["gm"] for r in df.groupBy("k")
                 .agg(F.exp(F.avg(F.ln("v"))).alias("gm")).collect()}
        assert all(abs(out[k] - built[k]) < 1e-9 for k in out)


class TestHllSketches:
    """Spark 4 datasketches HLL: mergeable distinct-count state — the 100 TB
    pattern is to pre-aggregate a sketch per partition/day and roll up later
    without rescanning (sketches union losslessly; plain count_distinct
    cannot merge)."""

    def test_sketch_estimate_error_bound(self, spark):
        n = 20_000
        df = spark.range(n).select((F.col("id") % 5000).alias("k"))
        est = df.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("k")).alias("e")
        ).collect()[0]["e"]
        assert abs(est - 5000) / 5000 < 0.05

    def test_sketch_rollup_equals_single_shot(self, spark):
        df = spark.range(30_000).select(
            (F.col("id") % 3).alias("g"), (F.col("id") % 7000).alias("k")
        )
        single = df.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("k")).alias("e")
        ).collect()[0]["e"]
        rolled = (
            df.groupBy("g").agg(F.hll_sketch_agg("k").alias("sk"))
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        ).collect()[0]["e"]
        # pre-aggregated per-group sketches union to the same estimate
        assert rolled == single


class TestThetaSketches:
    """Theta sketches (Spark 4 datasketches): mergeable distinct-set algebra —
    unlike HLL, theta supports intersection and difference, so pre-aggregated
    per-shard sketches answer "users in A and B" without rescanning.  Below
    the sketch's nominal entries (4096) estimates are exact."""

    def test_union_and_intersection_estimates(self, spark):
        a = spark.range(0, 1500).select(F.col("id").alias("k"))
        b = spark.range(1000, 2500).select(F.col("id").alias("k"))
        ska = a.agg(F.theta_sketch_agg("k").alias("sk"))
        skb = b.agg(F.theta_sketch_agg("k").alias("sk"))
        both = ska.crossJoin(skb.withColumnRenamed("sk", "sk2"))
        row = both.select(
            F.theta_sketch_estimate(F.theta_union("sk", "sk2")).alias("u"),
            F.theta_sketch_estimate(F.theta_intersection("sk", "sk2")).alias("i"),
            F.theta_sketch_estimate(F.theta_difference("sk", "sk2")).alias("d"),
        ).collect()[0]
        assert row["u"] == 2500   # |A ∪ B| (< 4096 nominal entries => exact)
        assert row["i"] == 500    # |A ∩ B| = [1000, 1500)
        assert row["d"] == 1000   # |A \ B| = [0, 1000)


class TestUDTF:
    def test_ngrams_udtf_matches_shingle(self, spark):
        """UDTF output == the codegen'd shingle path on the same text."""
        from pyspark.sql import functions as F

        from rust_dataframe_spark.functions.table import register_udtfs
        from rust_dataframe_spark.operators import dedup as dd

        register_udtfs(spark)
        df = spark.createDataFrame(
            [(1, "a b c d e"), (2, "x y"), (3, None)], "id int, text string"
        )
        df.createOrReplaceTempView("__t_udtf")
        got = spark.sql(
            "SELECT id, pos, ngram FROM __t_udtf, LATERAL ngrams(text, 3) ORDER BY id, pos"
        ).collect()
        assert [(r["id"], r["pos"], r["ngram"]) for r in got] == [
            (1, 0, "a b c"), (1, 1, "b c d"), (1, 2, "c d e")]
        # doc 2 shorter than n -> no rows; null text -> no rows (no crash)
        builtin = (
            df.filter("id = 1")
            .select(F.posexplode(dd.shingle(F.col("text"), 3)).alias("pos", "ngram"))
            .collect()
        )
        assert [(r["pos"], r["ngram"]) for r in builtin] == [(p, g) for _, p, g in [
            (1, 0, "a b c"), (1, 1, "b c d"), (1, 2, "c d e")]]


class TestCountminInnerProduct:
    def test_upper_bounds_true_join_size(self, spark):
        from pyspark.sql import functions as F

        from rust_dataframe_spark.operators.sketches import (
            countmin_build,
            countmin_inner_product,
        )

        a = spark.range(300).select((F.col("id") % 40).cast("string").alias("k"))
        b = spark.range(500).select((F.col("id") % 25).cast("string").alias("k"))
        sa = countmin_build(a, "k", depth=4, width=128, salt="t")
        sb = countmin_build(b, "k", depth=4, width=128, salt="t")
        est = countmin_inner_product(sa, sb, depth=4).collect()[0]["est"]
        true = a.join(b, "k").count()
        assert true <= est <= true + 2.0 / 128 * 300 * 500

    def test_disjoint_keys_estimate_can_reach_zero(self, spark):
        """If any sketch row has no colliding buckets the estimate is 0 —
        the sparse-row rule (absent row != 'ignore row')."""
        from pyspark.sql import functions as F

        from rust_dataframe_spark.operators.sketches import (
            countmin_build,
            countmin_inner_product,
        )

        a = spark.createDataFrame([("ka",)], "k string")
        b = spark.createDataFrame([("kb",)], "k string")
        sa = countmin_build(a, "k", depth=4, width=4096, salt="t2")
        sb = countmin_build(b, "k", depth=4, width=4096, salt="t2")
        est = countmin_inner_product(sa, sb, depth=4).collect()[0]["est"]
        assert est == 0  # single keys, wide table: some row must miss


class TestMisraGries:
    """Mergeable heavy-hitters summary (operators/sketches.misra_gries,
    q340): the two-sided guarantee true - N/(k+1) <= est <= true must hold
    for every token under ANY partition layout."""

    @staticmethod
    def _stream():
        # Zipf-ish: token i appears 2^(9-i) times, i=0..9  (N=1023)
        toks = []
        for i in range(10):
            toks.extend([f"t{i}"] * (1 << (9 - i)))
        return toks

    def _check_guarantee(self, spark, k, nparts):
        from rust_dataframe_spark.operators.sketches import misra_gries

        toks = self._stream()
        n = len(toks)
        df = spark.createDataFrame(
            [(t,) for t in toks], "token string"
        ).repartition(nparts)
        est = {
            r["token"]: r["est"] for r in misra_gries(df, "token", k).collect()
        }
        assert len(est) <= k
        true = {t: toks.count(t) for t in set(toks)}
        for t, c in true.items():
            e = est.get(t, 0)
            assert e <= c, (t, e, c)
            assert (c - e) * (k + 1) <= n, (t, e, c)
            if c * (k + 1) > n:
                assert t in est, f"heavy hitter {t} missing at k={k}"

    def test_guarantee_small_k_multi_partition(self, spark):
        self._check_guarantee(spark, k=3, nparts=7)

    def test_guarantee_k5_single_partition(self, spark):
        self._check_guarantee(spark, k=5, nparts=1)

    def test_exact_when_distinct_fits(self, spark):
        from rust_dataframe_spark.operators.sketches import misra_gries

        df = spark.createDataFrame(
            [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2, "token string"
        ).repartition(4)
        est = {r["token"]: r["est"] for r in misra_gries(df, "token", 10).collect()}
        assert est == {"a": 5, "b": 3, "c": 2}

    def test_rejects_bad_k(self, spark):
        import pytest

        from rust_dataframe_spark.operators.sketches import misra_gries

        df = spark.createDataFrame([("a",)], "token string")
        with pytest.raises(ValueError, match="k must be"):
            misra_gries(df, "token", 0)
