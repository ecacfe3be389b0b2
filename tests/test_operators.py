

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
