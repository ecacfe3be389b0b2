

class TestObservability:
    def test_with_metrics_single_pass(self, spark):
        from pyspark.sql import functions as F

        from rust_dataframe_spark.operators.observability import with_metrics

        df = spark.range(1000).withColumn(
            "v", F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id"))
        )
        out, obs = with_metrics(
            df,
            n_rows=F.count(F.lit(1)),
            n_null_v=F.count_if(F.col("v").isNull()),
            sum_id=F.sum("id"),
        )
        out.write.format("noop").mode("overwrite").save()
        got = obs.get
        assert got["n_rows"] == 1000
        assert got["n_null_v"] == 100
        assert got["sum_id"] == 1000 * 999 // 2


class TestMergeUpsert:
    def test_row_level_replace_including_nulls(self, spark):
        from pyspark.sql import functions as F

        from rust_dataframe_spark.operators.merge import merge_upsert

        tgt = spark.createDataFrame([(1, "a", 10), (2, "b", 20)], "k int, v string, n int")
        src = spark.createDataFrame([(2, None, 99), (3, "c", 30)], "k int, v string, n int")
        out = {r["k"]: (r["v"], r["n"]) for r in merge_upsert(tgt, src, ["k"]).collect()}
        assert out[1] == ("a", 10)      # untouched target row carries over
        assert out[2] == (None, 99)     # matched row replaced wholesale, nulls included
        assert out[3] == ("c", 30)      # unmatched source row inserted

    def test_schema_mismatch_raises(self, spark):
        import pytest as _pytest

        from rust_dataframe_spark.operators.merge import merge_upsert

        a = spark.createDataFrame([(1,)], "k int")
        b = spark.createDataFrame([(1, 2)], "k int, x int")
        with _pytest.raises(ValueError):
            merge_upsert(a, b, ["k"])


class TestEventAnalytics:
    def test_funnel_requires_strict_order(self, spark):
        from pyspark.sql import functions as F

        from rust_dataframe_spark.operators.events import funnel

        rows = [
            # user 1: view -> click -> purchase, fully ordered
            (1, "view", "2024-01-01 00:00:00"),
            (1, "click", "2024-01-01 01:00:00"),
            (1, "purchase", "2024-01-01 02:00:00"),
            # user 2: clicked BEFORE viewing -> counts for view only
            (2, "click", "2024-01-02 00:00:00"),
            (2, "view", "2024-01-02 01:00:00"),
            # user 3: view then click, no purchase
            (3, "view", "2024-01-03 00:00:00"),
            (3, "click", "2024-01-03 00:30:00"),
        ]
        e = spark.createDataFrame(rows, "user_id int, event_type string, ts_s string").select(
            "user_id", "event_type", F.col("ts_s").cast("timestamp").alias("ts")
        )
        out = {r["stage"]: r["n_users"] for r in funnel(e, ["view", "click", "purchase"]).collect()}
        assert out == {"view": 3, "click": 2, "purchase": 1}


class TestInterpolateLinear:
    def test_midpoint_and_edges(self, spark):
        from pyspark.sql import functions as F

        from rust_dataframe_spark.operators import temporal as tp

        rows = [
            (1, 0, None),   # leading gap -> backward-fill = 10
            (1, 10, 10.0),
            (1, 15, None),  # midpoint of 10..20 -> 15
            (1, 20, 20.0),
            (1, 30, None),  # trailing gap -> forward-fill = 20
        ]
        df = spark.createDataFrame(rows, "uid bigint, t bigint, v double")
        out = tp.interpolate_linear(
            df, "v", "t", partition_cols=["uid"], out_col="vi"
        )
        got = {r["t"]: r["vi"] for r in out.collect()}
        assert got == {0: 10.0, 10: 10.0, 15: 15.0, 20: 20.0, 30: 20.0}

    def test_time_weighting_not_midpoint(self, spark):
        from rust_dataframe_spark.operators import temporal as tp

        df = spark.createDataFrame(
            [(1, 0, 0.0), (1, 9, None), (1, 10, 100.0)], "uid bigint, t bigint, v double"
        )
        out = tp.interpolate_linear(df, "v", "t", partition_cols=["uid"], out_col="vi")
        got = {r["t"]: r["vi"] for r in out.collect()}
        assert abs(got[9] - 90.0) < 1e-9  # 9/10 of the way, not 50


class TestTukeyOutliers:
    def test_fences_and_flags(self, spark):
        from rust_dataframe_spark.operators import observability as ob

        vals = [float(x) for x in range(1, 12)] + [1000.0]  # 1..11 + one spike
        df = spark.createDataFrame(
            [("g", v) for v in vals], "g string, value double"
        )
        out = ob.tukey_outliers(df, "value", group_cols=["g"])
        flagged = [r["value"] for r in out.filter("is_outlier").collect()]
        assert flagged == [1000.0]
        kept = out.filter("NOT is_outlier").count()
        assert kept == 11


class TestCogroupAttribution:
    def test_shared_lineage_inputs(self, spark):
        """Both inputs filtered from the SAME frame — the case where
        Catalyst's pruning drops the shared-expr-id ts column from one
        cogroup side unless the operator re-aliases per side."""
        from pyspark.sql import functions as F

        from rust_dataframe_spark.operators import events as ev

        e = spark.createDataFrame(
            [
                (1, "view", 100), (1, "purchase", 150), (1, "purchase", 90),
                (2, "view", 200),            # views only
                (3, "purchase", 300),        # purchases only
            ],
            "user_id bigint, event_type string, t bigint",
        ).select("user_id", "event_type", F.timestamp_micros(F.col("t") * 1000000).alias("ts"))
        views = e.filter(F.col("event_type") == "view").select("user_id", "ts")
        buys = e.filter(F.col("event_type") == "purchase").select("user_id", "ts")
        out = ev.cogroup_view_purchase(views, buys, "user_id")
        rows = {r["user_id"]: r for r in
                out.select("user_id", "n_views", "n_purchases", "lag_us").orderBy("user_id").collect()}
        assert rows[1]["lag_us"] == 50 * 1000000  # purchase at 90 is BEFORE the view
        assert rows[2]["n_purchases"] == 0 and rows[2]["lag_us"] is None
        assert rows[3]["n_views"] == 0 and rows[3]["lag_us"] is None


class TestFilteredAnn:
    """Round 6: metadata-filtered IVF (pre-filter semantics + auto_widen)."""

    def _fixture(self, spark):
        import random

        rng = random.Random(11)
        rows = []
        for i in range(120):
            vec = [rng.uniform(-1, 1) for _ in range(8)]
            rows.append((i, vec, i % 3))
        return spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>, label int"
        )

    def test_prefilter_neighbors_all_satisfy_predicate(self, spark):
        from pyspark.sql import functions as F

        from rust_dataframe_spark.operators import similarity as sim

        e = self._fixture(spark)
        cent = [
            (int(r["vec_id"]), list(r["embedding"]))
            for r in e.filter("vec_id < 4").collect()
        ]
        queries = e.filter("vec_id >= 110")
        out = sim.ivf_filtered_batch_topk(
            queries, e, "vec_id", "embedding", cent,
            predicate=F.col("label") == 1, nprobe=2, k=5,
        )
        labels = {
            r["label"]
            for r in out.join(
                e.select(F.col("vec_id").alias("neighbor_id"), "label"),
                "neighbor_id",
            ).collect()
        }
        assert labels == {1}

    def test_auto_widen_scales_probe_width_and_recall(self, spark):
        """With a 1/3-selective filter, auto_widen triples the probe width;
        recall vs the exact filtered kNN must not DECREASE, and with the
        widened probe covering all 4 cells it is exactly 1.0."""
        from pyspark.sql import functions as F

        from rust_dataframe_spark.operators import similarity as sim

        e = self._fixture(spark)
        cent = [
            (int(r["vec_id"]), list(r["embedding"]))
            for r in e.filter("vec_id < 4").collect()
        ]
        queries = e.filter("vec_id >= 115")
        pred = F.col("label") == 1
        exact = sim.knn_join(queries, e.filter(pred), "vec_id", "embedding", 5)
        wide = sim.ivf_filtered_batch_topk(
            queries, e, "vec_id", "embedding", cent,
            predicate=pred, nprobe=2, k=5, auto_widen=True,
        )
        # selectivity ~1/3 -> ceil(2 * 3) = 6, capped at the 4 cells: probes
        # everything, so the approx equals the exact filtered kNN
        rec = sim.ann_recall(wide, exact, 5).collect()
        assert all(r["recall_at_k"] == 1.0 for r in rec)

    def test_empty_filter_raises(self, spark):
        from pyspark.sql import functions as F

        from rust_dataframe_spark.operators import similarity as sim

        e = self._fixture(spark)
        cent = [(0, [1.0] * 8)]
        import pytest as _pytest

        with _pytest.raises(ValueError, match="whole corpus"):
            sim.ivf_filtered_batch_topk(
                e.limit(2), e, "vec_id", "embedding", cent,
                predicate=F.col("label") == 99, auto_widen=True,
            )


class TestSchemaEvolution:
    """Round 6: audited migration across drifted parquet vintages."""

    def test_migrate_rename_widen_backfill_drop(self, spark):
        from rust_dataframe_spark.operators.evolution import migrate_schema

        old = spark.createDataFrame(
            [(1, 10, 1.5, "junk")],
            "k int, ck bigint, v float, legacy string",
        )
        target = {"k": "bigint", "o_ck": "bigint", "v": "double", "p": "string"}
        m, a = migrate_schema(
            old, target, renames={"ck": "o_ck"}, backfills={"p": "X"},
            vintage="v1",
        )
        assert dict(m.dtypes) == target
        row = m.collect()[0]
        assert (row["k"], row["o_ck"], row["p"]) == (1, 10, "X")
        acts = {(r["column"], r["action"]) for r in a.collect()}
        assert acts == {
            ("ck", "rename"), ("k", "widen"), ("v", "widen"),
            ("p", "backfill"), ("legacy", "drop"),
        }
        assert all(r["n_affected"] == 1 for r in a.collect())

    def test_missing_column_without_backfill_refuses(self, spark):
        import pytest as _pytest

        from rust_dataframe_spark.operators.evolution import migrate_schema

        old = spark.createDataFrame([(1,)], "k int")
        with _pytest.raises(ValueError, match="refusing to invent nulls"):
            migrate_schema(old, {"k": "int", "absent": "string"})

    def test_rename_onto_existing_column_refuses(self, spark):
        """Round-6 ADVICE regression: a rename colliding with an existing
        column must raise a clear migration error up front, not surface
        later as an ambiguous-reference AnalysisException."""
        import pytest as _pytest

        from rust_dataframe_spark.operators.evolution import migrate_schema

        old = spark.createDataFrame([(1, 2)], "a int, b int")
        with _pytest.raises(ValueError, match="collides with an existing column"):
            migrate_schema(old, {"b": "int"}, renames={"a": "b"}, vintage="v1")

    def test_read_evolved_unions_real_parquet_vintages(self, spark, tmp_path):
        from rust_dataframe_spark.operators.evolution import read_evolved

        v1 = spark.createDataFrame([(1, "a")], "k int, name string")
        v2 = spark.createDataFrame([(2, "b", 9.0)], "k bigint, name string, score double")
        v1.write.parquet(str(tmp_path / "v1"))
        v2.write.parquet(str(tmp_path / "v2"))
        target = {"k": "bigint", "name": "string", "score": "double"}
        uni, audit = read_evolved(
            spark,
            {"v1": str(tmp_path / "v1"), "v2": str(tmp_path / "v2")},
            target,
            backfills={"score": -1.0},
        )
        rows = {r["k"]: r for r in uni.collect()}
        assert rows[1]["score"] == -1.0 and rows[2]["score"] == 9.0
        assert dict(uni.dtypes) == target
        vs = {r["vintage"] for r in audit.collect()}
        assert vs == {"v1", "v2"}
