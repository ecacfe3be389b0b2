"""Iceberg table reader/writer tests (sources/iceberg.py) behind q452:
metadata resolution, manifest-list/manifest walk through the nested
Avro codec, snapshot time travel, dynamic-partition overwrite,
partition re-injection, the row-level-delete and transform gates."""

import json
import os

import pytest

from rust_dataframe_spark.sources.iceberg import (
    IcebergError,
    iceberg_snapshot_files,
    read_iceberg,
    write_iceberg_commit,
)


@pytest.fixture()
def table_path(tmp_path):
    return str(tmp_path / "ice")


def _seed(spark, path):
    from pyspark.sql import functions as F

    s0 = write_iceberg_commit(
        spark, path,
        spark.range(30).select(
            F.col("id").cast("int").alias("id"),
            (F.col("id") % 3).cast("int").alias("p"),
        ),
        partition_by=["p"],
    )
    s1 = write_iceberg_commit(
        spark, path,
        spark.range(100, 109).select(
            F.col("id").cast("int").alias("id"),
            (F.col("id") % 3).cast("int").alias("p"),
        ),
        partition_by=["p"],
    )
    s2 = write_iceberg_commit(
        spark, path,
        spark.range(900, 904).select(
            F.col("id").cast("int").alias("id"),
            F.lit(1).cast("int").alias("p"),
        ),
        partition_by=["p"], replace_partitions=True,
    )
    return s0, s1, s2


class TestIceberg:
    def test_snapshot_partition_reinjection(self, spark, table_path):
        from pyspark.sql import functions as F

        _seed(spark, table_path)
        snap = read_iceberg(spark, table_path)
        agg = {
            r["p"]: (r["n"], r["s"])
            for r in snap.groupBy("p").agg(
                F.count("*").alias("n"), F.sum("id").alias("s")
            ).collect()
        }
        assert agg == {0: (13, 450), 1: (4, 3606), 2: (13, 467)}

    def test_time_travel_by_snapshot_id(self, spark, table_path):
        _s0, s1, _s2 = _seed(spark, table_path)
        old = read_iceberg(spark, table_path, snapshot_id=s1)
        assert old.count() == 39
        assert old.filter("p = 1").count() == 13

    def test_unknown_snapshot_loud(self, spark, table_path):
        _seed(spark, table_path)
        with pytest.raises(IcebergError, match="not in metadata"):
            read_iceberg(spark, table_path, snapshot_id=42)

    def test_unpartitioned(self, spark, table_path):
        df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
        write_iceberg_commit(spark, table_path, df)
        got = read_iceberg(spark, table_path).orderBy("id").collect()
        assert [(r["id"], r["s"]) for r in got] == [(1, "a"), (2, "b")]

    def test_delete_manifest_gate(self, spark, table_path):
        _seed(spark, table_path)
        # patch the manifest list: flip content to 1 (delete manifest)
        from rust_dataframe_spark.sources.avro import (
            decode_records,
            encode_records,
        )

        meta, version = None, None
        mdir = os.path.join(table_path, "metadata")
        with open(os.path.join(mdir, "version-hint.text")) as fh:
            version = int(fh.read())
        with open(os.path.join(mdir, f"v{version}.metadata.json")) as fh:
            meta = json.load(fh)
        ml = next(
            s["manifest-list"] for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        with open(ml, "rb") as fh:
            schema, rows = decode_records(fh.read())
        for r in rows:
            r["content"] = 1
        with open(ml, "wb") as fh:
            fh.write(encode_records(schema, rows))
        # round 10: delete manifests now WALK; a data entry inside one
        # is malformed and stays loud
        with pytest.raises(IcebergError, match="delete manifest"):
            read_iceberg(spark, table_path)

    def test_transform_gate(self, spark, table_path):
        _seed(spark, table_path)
        mdir = os.path.join(table_path, "metadata")
        with open(os.path.join(mdir, "version-hint.text")) as fh:
            version = int(fh.read())
        mp = os.path.join(mdir, f"v{version}.metadata.json")
        with open(mp) as fh:
            meta = json.load(fh)
        meta["partition-specs"][0]["fields"][0]["transform"] = "bucket[4]"
        with open(mp, "w") as fh:
            json.dump(meta, fh)
        with pytest.raises(IcebergError, match="transform"):
            read_iceberg(spark, table_path)

    def test_format_version_gate(self, spark, table_path):
        _seed(spark, table_path)
        mdir = os.path.join(table_path, "metadata")
        with open(os.path.join(mdir, "version-hint.text")) as fh:
            version = int(fh.read())
        mp = os.path.join(mdir, f"v{version}.metadata.json")
        with open(mp) as fh:
            meta = json.load(fh)
        meta["format-version"] = 3
        with open(mp, "w") as fh:
            json.dump(meta, fh)
        with pytest.raises(IcebergError, match="format-version"):
            read_iceberg(spark, table_path)

    def test_not_a_table(self, spark, tmp_path):
        with pytest.raises(IcebergError, match="metadata"):
            read_iceberg(spark, str(tmp_path))

    def test_live_census_has_counts(self, spark, table_path):
        _seed(spark, table_path)
        _meta, files = iceberg_snapshot_files(table_path)
        assert files and all(
            f["file_format"] == "PARQUET" and f["file_size_in_bytes"] > 0
            for f in files
        )

    # ---- round-10: format-v2 position deletes --------------------

    def _seed_with_deletes(self, spark, path):
        from pyspark.sql import functions as F

        from rust_dataframe_spark.sources.iceberg import (
            iceberg_snapshot_files,
            write_iceberg_commit,
            write_iceberg_position_deletes,
        )

        write_iceberg_commit(
            spark, path,
            spark.range(30).select(
                F.col("id").cast("int").alias("id"),
                (F.col("id") % 3).cast("int").alias("p"),
            ),
            partition_by=["p"],
        )
        _m, files = iceberg_snapshot_files(path)
        doomed = [
            (r["f"], r["pos"])
            for r in spark.read.parquet(
                *[f["file_path"] for f in files]
            ).select(
                "id",
                F.regexp_replace(
                    F.input_file_name(), "^file:/+", "/"
                ).alias("f"),
                F.col("_metadata.row_index").alias("pos"),
            ).where(F.col("id") % 7 == 3).collect()
        ]
        return write_iceberg_position_deletes(spark, path, doomed)

    def test_position_deletes_applied(self, spark, table_path):
        self._seed_with_deletes(spark, table_path)
        got = sorted(
            r["id"] for r in read_iceberg(spark, table_path).collect()
        )
        assert got == [i for i in range(30) if i % 7 != 3]

    def test_position_delete_time_travel(self, spark, table_path):
        from rust_dataframe_spark.sources.iceberg import (
            iceberg_snapshot_files,
        )

        self._seed_with_deletes(spark, table_path)
        meta, _f, _d = iceberg_snapshot_files(
            table_path, with_deletes=True
        )
        first = meta["snapshots"][0]["snapshot-id"]
        pre = sorted(
            r["id"] for r in
            read_iceberg(spark, table_path, snapshot_id=first).collect()
        )
        assert pre == list(range(30))

    def test_snapshot_files_without_flag_gates(self, spark, table_path):
        from rust_dataframe_spark.sources.iceberg import (
            iceberg_snapshot_files,
        )

        self._seed_with_deletes(spark, table_path)
        with pytest.raises(IcebergError, match="row-level delete"):
            iceberg_snapshot_files(table_path)

    def test_append_after_delete_carries_tombstones(
        self, spark, table_path
    ):
        from rust_dataframe_spark.sources.iceberg import (
            write_iceberg_commit,
        )

        self._seed_with_deletes(spark, table_path)
        write_iceberg_commit(
            spark, table_path,
            spark.createDataFrame([(500, 2)], "id int, p int"),
            partition_by=["p"],
        )
        got = sorted(
            r["id"] for r in read_iceberg(spark, table_path).collect()
        )
        assert got == [i for i in range(30) if i % 7 != 3] + [500]
        # partition re-injection survives the anti-join
        pv = {
            r["p"]: r["count"]
            for r in read_iceberg(spark, table_path)
            .groupBy("p").count().collect()
        }
        assert sum(pv.values()) == 27 and set(pv) == {0, 1, 2}

    def test_equality_deletes_gate(self, spark, table_path):
        import json as _json
        import os as _os

        from rust_dataframe_spark.sources.iceberg import (
            iceberg_snapshot_files,
        )

        self._seed_with_deletes(spark, table_path)
        # flip the delete file's content to 2: an equality delete
        # WITHOUT equality_ids is malformed and must stay loud (real
        # equality deletes are covered by the round-10b block below)
        mdir = _os.path.join(table_path, "metadata")
        from rust_dataframe_spark.sources.avro import (
            decode_records, encode_records,
        )
        for name in _os.listdir(mdir):
            if name.endswith("-d0.avro"):
                with open(_os.path.join(mdir, name), "rb") as fh:
                    schema, recs = decode_records(fh.read())
                recs[0]["data_file"]["content"] = 2
                with open(_os.path.join(mdir, name), "wb") as fh:
                    fh.write(encode_records(schema, recs,
                                            codec="deflate"))
        with pytest.raises(IcebergError, match="equality_ids"):
            iceberg_snapshot_files(table_path, with_deletes=True)
        del _json

    def test_max_live_files_budget(self, spark, table_path):
        from rust_dataframe_spark.sources.iceberg import (
            iceberg_snapshot_files,
        )

        _seed(spark, table_path)
        with pytest.raises(IcebergError, match="max_live_files"):
            iceberg_snapshot_files(table_path, max_live_files=1)

    def test_distributed_manifest_walk_matches_driver_walk(
        self, spark, tmp_path
    ):
        # force the mapInPandas path by dropping the threshold; the
        # decoded entry set must be identical to the driver-side walk
        from rust_dataframe_spark.sources import iceberg as I

        path = str(tmp_path / "ice_dist")
        _seed(spark, path)
        _m, a = I.iceberg_snapshot_files(path)
        old = I._DISTRIBUTE_MANIFESTS_FROM
        I._DISTRIBUTE_MANIFESTS_FROM = 0
        try:
            _m2, b = I.iceberg_snapshot_files(path, spark=spark)
        finally:
            I._DISTRIBUTE_MANIFESTS_FROM = old
        key = lambda d: d["file_path"]  # noqa: E731
        assert sorted(a, key=key) == sorted(b, key=key)

    # ---- round-10b: equality deletes -----------------------------

    def _seed_eq(self, spark, path):
        from pyspark.sql import functions as F

        from rust_dataframe_spark.sources.iceberg import (
            write_iceberg_commit,
            write_iceberg_equality_deletes,
        )

        s0 = write_iceberg_commit(
            spark, path,
            spark.range(30).select(
                F.col("id").cast("int").alias("id"),
                (F.col("id") % 3).cast("int").alias("p"),
            ),
            partition_by=["p"],
        )
        write_iceberg_equality_deletes(
            spark, path,
            spark.createDataFrame([(3,), (10,), (17,)], "id int"),
            ["id"],
        )
        return s0

    def test_equality_deletes_applied(self, spark, table_path):
        self._seed_eq(spark, table_path)
        got = sorted(
            r["id"] for r in read_iceberg(spark, table_path).collect()
        )
        assert got == [i for i in range(30) if i not in (3, 10, 17)]

    def test_equality_delete_temporal_scoping(self, spark, table_path):
        from rust_dataframe_spark.sources.iceberg import (
            write_iceberg_commit,
        )

        self._seed_eq(spark, table_path)
        # re-append key 3 AFTER the delete: newer data seq -> survives
        write_iceberg_commit(
            spark, table_path,
            spark.createDataFrame([(3, 0)], "id int, p int"),
            partition_by=["p"],
        )
        got = sorted(
            r["id"] for r in read_iceberg(spark, table_path).collect()
        )
        assert got.count(3) == 1
        assert 10 not in got and 17 not in got

    def test_equality_delete_time_travel(self, spark, table_path):
        s0 = self._seed_eq(spark, table_path)
        pre = sorted(
            r["id"] for r in
            read_iceberg(spark, table_path, snapshot_id=s0).collect()
        )
        assert pre == list(range(30))

    def test_equality_unknown_column_loud(self, spark, table_path):
        from rust_dataframe_spark.sources.iceberg import (
            write_iceberg_equality_deletes,
        )

        _seed(spark, table_path)
        with pytest.raises(IcebergError, match="not in the table"):
            write_iceberg_equality_deletes(
                spark, table_path,
                spark.createDataFrame([(1,)], "nope int"), ["nope"],
            )

    # ---- round-10c: transformed partitions read when in-file -------

    def test_bucket_transform_reads_when_column_in_file(
        self, spark, tmp_path
    ):
        from pyspark.sql import functions as F

        path = str(tmp_path / "ice_bucket")
        # unpartitioned write: data files carry EVERY column
        write_iceberg_commit(
            spark, path,
            spark.range(20).select(
                F.col("id").cast("int").alias("id"),
                (F.col("id") % 5).cast("int").alias("p"),
            ),
        )
        # retrofit a bucket[4] partition spec over column p
        mdir = os.path.join(path, "metadata")
        with open(os.path.join(mdir, "version-hint.text")) as fh:
            v = int(fh.read())
        mp = os.path.join(mdir, f"v{v}.metadata.json")
        with open(mp) as fh:
            meta = json.load(fh)
        meta["partition-specs"][0]["fields"] = [{
            "name": "p_bucket", "transform": "bucket[4]",
            "source-id": 2, "field-id": 1000,
        }]
        with open(mp, "w") as fh:
            json.dump(meta, fh)
        got = read_iceberg(spark, path)
        assert got.count() == 20
        assert {r["p"] for r in got.select("p").distinct().collect()} \
            == {0, 1, 2, 3, 4}

    def test_transform_still_gates_when_column_absent(
        self, spark, table_path
    ):
        # our writer's hive layout DROPS partition columns from files,
        # so a transformed spec cannot be re-derived -> loud
        _seed(spark, table_path)
        mdir = os.path.join(table_path, "metadata")
        with open(os.path.join(mdir, "version-hint.text")) as fh:
            v = int(fh.read())
        mp = os.path.join(mdir, f"v{v}.metadata.json")
        with open(mp) as fh:
            meta = json.load(fh)
        meta["partition-specs"][0]["fields"][0]["transform"] = \
            "truncate[2]"
        with open(mp, "w") as fh:
            json.dump(meta, fh)
        with pytest.raises(IcebergError, match="unrecoverable"):
            read_iceberg(spark, table_path).collect()
