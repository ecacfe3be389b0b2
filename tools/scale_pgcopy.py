"""COPY BINARY payload-growth measurement (VERDICT r8 #7).

q408's catalog fixture bounds the payload at 2000 orders rows, so the
generic fresh-entropy program never exercises the codec's real growth
axis: bytes encoded+decoded per partition.  This harness scales the row
bound x1 / x10 / x75 (sf0.1's orders table tops out at ~150k rows) and
measures warm noop-sink wall for the full encode -> decode round trip,
plus the rows/sec rate — the number that matters when a 1000-executor
bulk load streams COPY payloads at a Postgres-family warehouse.

Methodology mirrors bench.py: pass 1 warms JIT/codegen (untimed),
pass 2 reported.  Usage: python tools/scale_pgcopy.py [--sf DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rust_dataframe_spark.context import get_spark


def roundtrip_df(spark, sf_dir: str, limit: int):
    from rust_dataframe_spark.catalog_round8 import q408_pgcopy_roundtrip

    # q408 uses o_orderkey < 2000; rebuild its frame with a custom bound
    o = (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .filter(F.col("o_orderkey") < limit)
        .select(
            "o_orderkey",
            "o_custkey",
            F.when(F.col("o_orderkey") % 7 == 0, None)
            .otherwise(F.col("o_orderstatus"))
            .alias("status"),
            F.col("o_orderdate").cast("date").alias("odate"),
            F.round(F.col("o_totalprice") * 100)
            .cast("decimal(18,0)")
            .alias("__amt"),
        )
    )

    def roundtrip(batches):
        import pandas as pd

        from rust_dataframe_spark.sources.pgcopy import (
            decode_copy_binary,
            encode_copy_binary,
        )

        schema = [
            ("o_orderkey", "int8"),
            ("o_custkey", "int8"),
            ("status", "text"),
            ("odate", "date"),
            ("__amt", "numeric"),
        ]
        for pdf in batches:
            rows = [
                tuple(None if pd.isna(v) else v for v in r)
                for r in pdf.itertuples(index=False)
            ]
            blob = encode_copy_binary(schema, rows)
            out = decode_copy_binary(blob, schema)
            yield pd.DataFrame({
                "n": [len(out)],
                "bytes": [len(blob)],
            })

    return o.mapInPandas(roundtrip, "n bigint, bytes bigint").agg(
        F.sum("n").alias("rows"), F.sum("bytes").alias("payload_bytes")
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    spark = get_spark("scale-pgcopy")
    spark.sparkContext.setLogLevel("ERROR")
    for limit in (2000, 20000, 150000):
        df = roundtrip_df(spark, sf_dir, limit)
        df.write.format("noop").mode("overwrite").save()  # warm
        t0 = time.time()
        row = df.collect()[0]
        wall = time.time() - t0
        print(
            f"limit={limit}: rows={row['rows']} "
            f"bytes={row['payload_bytes']} wall={wall:.2f}s "
            f"rate={row['rows'] / wall:.0f} rows/s"
        )


if __name__ == "__main__":
    main()
