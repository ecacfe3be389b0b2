"""Phase-level timing of the q374 dbscan pipeline at sf0.1 (measurement
tool only — guide §1): coords collapse, density guard, grid pairs,
degrees/roles, CC rounds, label expansion."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rust_dataframe_spark.context import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("profile-dbscan")
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
    )
    e.count()
    t0 = time.time()

    from rust_dataframe_spark.operators.spatial import (
        dbscan,
        grid_neighbor_pairs,
    )

    coords = e.groupBy(F.col("x").alias("__x"), F.col("y").alias("__y")).agg(
        F.min("vec_id").alias("rep"),
        F.count(F.lit(1)).cast("bigint").alias("w"),
    )
    print("n coords", coords.count(), f"{time.time()-t0:.2f}s")
    t = time.time()
    pairs = grid_neighbor_pairs(
        coords.select("rep", F.col("__x").alias("x"), F.col("__y").alias("y")),
        "rep", "x", "y", radius=0.02,
    )
    print("n pairs", pairs.count(), f"{time.time()-t:.2f}s")
    t = time.time()
    out = dbscan(e, "vec_id", "x", "y", eps=0.02, min_pts=5)
    noop(out.orderBy("id"))
    print("full dbscan", f"{time.time()-t:.2f}s")
    from rust_dataframe_spark.operators.cache import release
    release()
    t = time.time()
    noop(dbscan(e, "vec_id", "x", "y", eps=0.02, min_pts=5).orderBy("id"))
    print("full dbscan again", f"{time.time()-t:.2f}s")


if __name__ == "__main__":
    main()
