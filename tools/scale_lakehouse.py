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


def _fabricate_iceberg(path: str, n_files: int, n_manifests: int) -> None:
    """Spec-shaped metadata with n_files entries spread over
    n_manifests manifest Avro files (no real parquet — metadata axis)."""
    from rust_dataframe_spark.sources.avro import encode_records
    from rust_dataframe_spark.sources.iceberg import (
        _MANIFEST_LIST_SCHEMA, _manifest_schema,
    )

    mdir = os.path.join(path, "metadata")
    os.makedirs(mdir, exist_ok=True)
    man_schema = _manifest_schema([("p", "int")])
    ml_entries = []
    per = (n_files + n_manifests - 1) // n_manifests
    k = 0
    for mi in range(n_manifests):
        entries = []
        for _ in range(min(per, n_files - k)):
            entries.append({
                "status": 1, "snapshot_id": 1,
                "data_file": {
                    "content": 0,
                    "file_path": os.path.join(
                        path, "data", f"p={k % 32}",
                        f"f{k:07d}.parquet",
                    ),
                    "file_format": "PARQUET",
                    "partition": {"p": k % 32},
                    "record_count": 10,
                    "file_size_in_bytes": 1024,
                },
            })
            k += 1
        man_path = os.path.join(mdir, f"m{mi:05d}.avro")
        with open(man_path, "wb") as fh:
            fh.write(encode_records(man_schema, entries,
                                    codec="deflate"))
        ml_entries.append({
            "manifest_path": man_path,
            "manifest_length": os.path.getsize(man_path),
            "partition_spec_id": 0, "content": 0,
            "added_snapshot_id": 1,
        })
    ml_path = os.path.join(mdir, "snap-1.avro")
    with open(ml_path, "wb") as fh:
        fh.write(encode_records(_MANIFEST_LIST_SCHEMA, ml_entries,
                                codec="deflate"))
    meta = {
        "format-version": 2, "table-uuid": "scale", "location": path,
        "last-updated-ms": 0, "last-column-id": 2,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": [
            {"id": 1, "name": "id", "required": False, "type": "int"},
            {"id": 2, "name": "p", "required": False, "type": "int"},
        ]}],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": [
            {"name": "p", "transform": "identity", "source-id": 2,
             "field-id": 1000},
        ]}],
        "default-spec-id": 0,
        "snapshots": [{"snapshot-id": 1, "timestamp-ms": 0,
                       "manifest-list": ml_path, "summary": {}}],
        "current-snapshot-id": 1,
    }
    with open(os.path.join(mdir, "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(mdir, "version-hint.text"), "w") as fh:
        fh.write("1")


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

    from rust_dataframe_spark.sources.iceberg import (
        IcebergError, iceberg_snapshot_files,
    )

    out2 = []
    for n in (100, 1_000, 10_000, 100_000):
        path = tempfile.mkdtemp(prefix=f"ice{n}_")
        try:
            # >=128 manifests for the big sizes so the distributed
            # walk path (mapInPandas decode) is what gets measured
            n_man = 1 if n <= 1_000 else 128
            _fabricate_iceberg(path, n, n_man)
            rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
            t0 = time.time()
            _meta, files = iceberg_snapshot_files(path, spark=spark)
            wall = time.time() - t0
            rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
            assert len(files) == n, (len(files), n)
            try:
                iceberg_snapshot_files(
                    path, spark=spark, max_live_files=n - 1
                )
                raise AssertionError("budget guard did not raise")
            except IcebergError:
                pass
            out2.append({
                "files": n, "manifests": n_man,
                "wall_s": round(wall, 3),
                "driver_rss_delta_kb": rss1 - rss0,
            })
            print(json.dumps(out2[-1]))
        finally:
            shutil.rmtree(path, ignore_errors=True)
    print(json.dumps({"metric": "iceberg_manifest_walk", "rows": out2}))

    # equality-delete application: broadcast anti-join vs the
    # shuffled sort-merge fallback above _EQ_DELETE_BROADCAST_ROWS —
    # same answers, bounded memory at 10^5-10^6 delete rows
    import rust_dataframe_spark.sources.iceberg as ice_mod
    from pyspark.sql import functions as F
    from rust_dataframe_spark.sources.iceberg import (
        read_iceberg,
        write_iceberg_commit,
        write_iceberg_equality_deletes,
    )

    out3 = []
    saved = ice_mod._EQ_DELETE_BROADCAST_ROWS
    for n_del in (100_000, 1_000_000):
        path = tempfile.mkdtemp(prefix=f"eqdel{n_del}_")
        try:
            n_rows = 2 * n_del
            write_iceberg_commit(
                spark, path,
                spark.range(n_rows).select(
                    F.col("id").alias("id"),
                    (F.col("id") * 2).alias("val"),
                ),
            )
            write_iceberg_equality_deletes(
                spark, path,
                spark.range(n_del).select(
                    (F.col("id") * 2).alias("id")
                ),
                ["id"],
            )
            expected = n_rows - n_del
            for mode, budget in (
                ("broadcast", 10 ** 12), ("shuffled", 0)
            ):
                ice_mod._EQ_DELETE_BROADCAST_ROWS = budget
                rss0 = resource.getrusage(
                    resource.RUSAGE_SELF
                ).ru_maxrss
                t0 = time.time()
                cnt = read_iceberg(spark, path).count()
                wall = time.time() - t0
                rss1 = resource.getrusage(
                    resource.RUSAGE_SELF
                ).ru_maxrss
                assert cnt == expected, (cnt, expected)
                out3.append({
                    "delete_rows": n_del, "mode": mode,
                    "wall_s": round(wall, 3),
                    "driver_rss_delta_kb": rss1 - rss0,
                })
                print(json.dumps(out3[-1]))
        finally:
            ice_mod._EQ_DELETE_BROADCAST_ROWS = saved
            shutil.rmtree(path, ignore_errors=True)
    print(json.dumps({"metric": "iceberg_eq_delete_apply",
                      "rows": out3}))


if __name__ == "__main__":
    main()
