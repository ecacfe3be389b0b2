

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
