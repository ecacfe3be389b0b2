"""Build an N-times-scaled copy of a testdata dir in /tmp by unioning
key-shifted copies of the big tables (dims copied as-is), then verify the
engine's scaling behavior: warm per-query time should grow ~linearly in rows
for scan-bound ops and stay shuffle-bounded for the rest.

Usage:
    python tools/scale_up.py [factor] [src_sf_dir] [out_dir]
Defaults: 10 /root/testdata/sf0.1 /tmp/spark_graft_sfx

The output keeps the same file-per-table layout the catalog expects, but
written with multiple row groups, so scans parallelize like real data.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rust_dataframe_spark.context import get_spark

SHIFTS = {
    # table -> (shift columns, shift stride)
    "lineitem": (["l_orderkey"], 10_000_000),
    "orders": (["o_orderkey"], 10_000_000),
    "documents": (["doc_id"], 10_000_000),
    "embeddings": (["vec_id"], 10_000_000),
    "events": (["event_id"], 100_000_000),
}
COPY = ["region", "nation", "customer", "supplier", "part"]


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/spark_graft_sfx"
    spark = get_spark("scale-up")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    os.makedirs(out, exist_ok=True)

    for t in COPY:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(f"{t}: copied")

    for t, (cols, stride) in SHIFTS.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        parts = []
        for i in range(factor):
            p = df
            for c in cols:
                p = p.withColumn(c, F.col(c) + F.lit(i * stride))
            parts.append(p)
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        # repartition => multiple files/row groups => parallel scans
        big.repartition(16).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: x{factor} -> {n} rows")


if __name__ == "__main__":
    main()
