"""Phase-level timing of the q477 Delta-CDF streaming query at sf0.1
(measurement tool only — guide §1).  Splits fixture build, stream run 1,
incremental commits, stream run 2, and the final census."""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rust_dataframe_spark.context import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("profile-stream")
    spark.sparkContext.setLogLevel("ERROR")

    from rust_dataframe_spark.catalog_sources import _scratch
    from rust_dataframe_spark.sources.delta import (
        compact_delta_files,
        delete_delta_rows_cdf,
        update_delta_rows_cdf,
        write_delta_commit,
    )
    from rust_dataframe_spark.streaming.lakehouse import (
        register_lakehouse_streams,
    )

    register_lakehouse_streams(spark)
    root = _scratch("delta_cdf_stream_prof", SF)
    shutil.rmtree(root, ignore_errors=True)
    path = f"{root}/tbl"
    sink = f"{root}/sink"
    ckpt = f"{root}/ckpt"

    marks = [("start", time.time())]

    def mark(label):
        marks.append((label, time.time()))

    def run():
        q = (
            spark.readStream.format("delta_cdf_stream")
            .option("path", path).load()
            .writeStream.format("parquet").option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(300)
        return spark.read.parquet(sink)

    write_delta_commit(
        spark, path,
        spark.range(12).select(
            F.col("id").cast("int").alias("id"),
            (F.col("id") * 10).cast("long").alias("v"),
        ),
        enable_cdf=True,
    )
    write_delta_commit(
        spark, path,
        spark.range(3).select(
            (F.col("id") + 100).cast("int").alias("id"),
            (F.col("id") * 10).cast("long").alias("v"),
        ),
    )
    update_delta_rows_cdf(spark, path, "id = 5", {"v": "v + 1"})
    delete_delta_rows_cdf(spark, path, "id = 7")
    mark("fixture commits")
    load = (
        spark.readStream.format("delta_cdf_stream")
        .option("path", path).load()
    )
    mark("readStream.load (schema probe)")
    q = (
        load.writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    mark("start()")
    q.awaitTermination(300)
    mark("awaitTermination run1")
    run1_rows = spark.read.parquet(sink).count()
    mark("read sink + count")

    write_delta_commit(
        spark, path,
        spark.range(2).select(
            (F.col("id") + 200).cast("int").alias("id"),
            F.lit(0).cast("long").alias("v"),
        ),
    )
    v_compact = compact_delta_files(spark, path)
    mark("incr commits + compact")
    final = run()
    mark("run2")
    final.count()
    final.where(F.col("_commit_version") == v_compact).count()
    mark("counts")

    prev = marks[0][1]
    for label, t in marks[1:]:
        print(f"{label:36s} {t - prev:7.3f}s")
        prev = t
    print(f"{'TOTAL':36s} {marks[-1][1] - marks[0][1]:7.3f}s")
    print("run1_rows", run1_rows)


if __name__ == "__main__":
    main()
