"""Lakehouse metadata-replay growth measurement (the 100x discipline
for sources/delta.py's snapshot resolution).

At 100 TB a Delta table holds 10^5-10^7 add-actions, so snapshot
resolution is file-axis work.  Round 10 distributed the checkpoint
replay (adds reconciled against remove tombstones as a DataFrame
anti-join; only the final live-file (path, partitionValues, size)
list is collected, under the loud ``max_live_files`` budget).  This
harness pins that posture with numbers: it fabricates checkpoints of
10^2 / 10^3 / 10^4 / 10^5 synthetic add-actions (plus 10%% remove
tombstones), measures snapshot-resolution wall, and samples driver
RSS before/after — wall should grow ~linearly in the file axis and
driver RSS by only the final collected list (~200 B/entry), never by
the raw checkpoint row count, and the budget must raise loudly when
set below the live count.

Usage: python tools/scale_lakehouse.py
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_dataframe_spark.context import get_spark


def _fabricate(spark, path: str, n_files: int) -> None:
    """A protocol-shaped table whose checkpoint declares n_files adds
    + n_files//10 removes, without writing n_files real parquets (the
    metadata axis is what's under test)."""
    from pyspark.sql import functions as F

    log = os.path.join(path, "_delta_log")
    os.makedirs(log, exist_ok=True)
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "integer", "nullable": True,
             "metadata": {}},
            {"name": "p", "type": "integer", "nullable": True,
             "metadata": {}},
        ],
    }
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 2}}) + "\n")
        fh.write(json.dumps({"metaData": {
            "id": str(uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": ["p"],
            "configuration": {}, "createdTime": 0}}) + "\n")
    # checkpoint parquet built DISTRIBUTED (one job), not via a
    # driver-side python list of n_files dicts
    n_rm = n_files // 10
    meta_id = n_files + n_rm          # one metaData row
    proto_id = n_files + n_rm + 1     # one protocol row
    rows = spark.range(n_files + n_rm + 2).select(
        F.when(
            F.col("id") < n_files,
            F.struct(
                F.concat(
                    F.lit("p="), (F.col("id") % 32).cast("string"),
                    F.lit("/part-"), F.col("id").cast("string"),
                    F.lit("-"), F.lit(uuid.uuid4().hex[:8]),
                    F.lit(".parquet"),
                ).alias("path"),
                F.create_map(
                    F.lit("p"), (F.col("id") % 32).cast("string")
                ).alias("partitionValues"),
                (F.col("id") + 1024).alias("size"),
            ),
        ).alias("add"),
        F.when(
            (F.col("id") >= n_files) & (F.col("id") < meta_id),
            F.struct(
                F.concat(
                    F.lit("p="), (F.col("id") % 32).cast("string"),
                    F.lit("/dead-"), F.col("id").cast("string"),
                    F.lit(".parquet"),
                ).alias("path"),
                F.lit(1).cast("bigint").alias("deletionTimestamp"),
                F.lit(True).alias("dataChange"),
            ),
        ).alias("remove"),
        F.when(
            F.col("id") == meta_id,
            F.struct(
                F.lit("scale-fixture").alias("id"),
                F.lit(json.dumps(schema)).alias("schemaString"),
                F.lit(json.dumps(["p"])).alias("partitionColumns"),
                F.lit("{}").alias("configuration"),
                F.lit(0).cast("bigint").alias("createdTime"),
            ),
        ).alias("metaData"),
        F.when(
            F.col("id") == proto_id,
            F.struct(
                F.lit(1).alias("minReaderVersion"),
                F.lit(2).alias("minWriterVersion"),
            ),
        ).alias("protocol"),
    )
    tmp = os.path.join(log, "_cp_tmp")
    rows.coalesce(4).write.mode("overwrite").parquet(tmp)
    # merge into the single checkpoint file name the reader expects
    import pyarrow.parquet as pq
    import pyarrow as pa

    tables = [
        pq.read_table(os.path.join(tmp, n))
        for n in sorted(os.listdir(tmp)) if n.endswith(".parquet")
    ]
    pq.write_table(
        pa.concat_tables(tables),
        os.path.join(log, f"{0:020d}.checkpoint.parquet"),
    )
    shutil.rmtree(tmp)


def main() -> None:
    from rust_dataframe_spark.sources.delta import (
        DeltaError, delta_snapshot_files,
    )

    spark = get_spark("scale-lakehouse")
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    for n in (100, 1_000, 10_000, 100_000):
        path = tempfile.mkdtemp(prefix=f"dlt{n}_")
        try:
            _fabricate(spark, path, n)
            rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
            t0 = time.time()
            _meta, adds = delta_snapshot_files(spark, path)
            wall = time.time() - t0
            rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
            assert len(adds) == n, (len(adds), n)
            # budget guard must raise loudly below the live count
            try:
                delta_snapshot_files(spark, path, max_live_files=n - 1)
                raise AssertionError("budget guard did not raise")
            except DeltaError:
                pass
            out.append({
                "files": n, "wall_s": round(wall, 3),
                "driver_rss_delta_kb": rss1 - rss0,
            })
            print(json.dumps(out[-1]))
        finally:
            shutil.rmtree(path, ignore_errors=True)
    print(json.dumps({"metric": "delta_metadata_replay", "rows": out}))


if __name__ == "__main__":
    main()
