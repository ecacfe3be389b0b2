"""Round-11 lakehouse hardening tests (ADVICE round-10 findings):
duplicate-basename loudness on the row-level-delete join paths,
minReaderVersion > 3 gate, V2 checkpoints declaring the v2Checkpoint
table feature."""

import json
import os

import pytest

from rust_dataframe_spark.sources.delta import (
    DeltaError,
    read_delta,
    write_delta_commit,
    write_delta_checkpoint,
)
from rust_dataframe_spark.sources.iceberg import IcebergError, read_iceberg
from rust_dataframe_spark.sources.lakehouse_util import (
    assert_unique_basenames,
)


class TestUniqueBasenames:
    def test_helper_accepts_unique_and_repeated_same_path(self):
        assert_unique_basenames(
            ["/a/x.parquet", "/b/y.parquet", "/a/x.parquet"],
            err_cls=ValueError, tag="t",
        )

    def test_helper_rejects_duplicate(self):
        with pytest.raises(ValueError, match="duplicate data-file"):
            assert_unique_basenames(
                ["/a/x.parquet", "/b/x.parquet"],
                err_cls=ValueError, tag="t",
            )

    def test_delta_duplicate_basename_loud(self, spark, tmp_path):
        # hand-written log: two add actions whose RELATIVE paths share
        # a basename across partition dirs — the delete/partition join
        # keys on basename, so this must refuse before reading wrong
        path = str(tmp_path / "dup")
        os.makedirs(os.path.join(path, "_delta_log"))
        one = spark.createDataFrame([(1, "a")], "id int, p string")
        two = spark.createDataFrame([(2, "b")], "id int, p string")
        for sub, df in (("p=a", one), ("p=b", two)):
            tmp = os.path.join(path, "_t")
            df.drop("p").coalesce(1).write.mode("overwrite").parquet(tmp)
            part = next(
                n for n in os.listdir(tmp) if n.endswith(".parquet")
            )
            os.makedirs(os.path.join(path, sub), exist_ok=True)
            os.replace(
                os.path.join(tmp, part),
                os.path.join(path, sub, "part-0.parquet"),
            )
        schema = {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "integer", "nullable": True,
                 "metadata": {}},
                {"name": "p", "type": "string", "nullable": True,
                 "metadata": {}},
            ],
        }
        actions = [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": {
                "id": "t", "schemaString": json.dumps(schema),
                "partitionColumns": ["p"], "configuration": {},
                "format": {"provider": "parquet"},
            }},
            {"add": {"path": "p=a/part-0.parquet",
                     "partitionValues": {"p": "a"}, "size": 1,
                     "modificationTime": 0, "dataChange": True}},
            {"add": {"path": "p=b/part-0.parquet",
                     "partitionValues": {"p": "b"}, "size": 1,
                     "modificationTime": 0, "dataChange": True}},
        ]
        with open(os.path.join(path, "_delta_log",
                               f"{0:020d}.json"), "w") as fh:
            for a in actions:
                fh.write(json.dumps(a) + "\n")
        with pytest.raises(DeltaError, match="duplicate data-file"):
            read_delta(spark, path).collect()

    def test_iceberg_duplicate_basename_loud(
        self, spark, tmp_path, monkeypatch
    ):
        # pure pos-delete table (no partitions) — the path the ADVICE
        # finding named: attach_file_values is never reached, so the
        # new explicit check must fire
        import rust_dataframe_spark.sources.iceberg as ice

        d1 = str(tmp_path / "a")
        d2 = str(tmp_path / "b")
        for d, v in ((d1, 1), (d2, 2)):
            spark.createDataFrame(
                [(v,)], "id int"
            ).coalesce(1).write.parquet(d)
        p1 = os.path.join(
            d1, next(n for n in os.listdir(d1) if n.endswith(".parquet"))
        )
        base = os.path.basename(p1)
        p2 = os.path.join(d2, base)
        os.replace(
            os.path.join(
                d2, next(n for n in os.listdir(d2)
                         if n.endswith(".parquet"))
            ),
            p2,
        )
        dpath = str(tmp_path / "del")
        spark.createDataFrame(
            [(p1, 0)], "file_path string, pos bigint"
        ).coalesce(1).write.parquet(dpath)
        dfile = os.path.join(
            dpath,
            next(n for n in os.listdir(dpath) if n.endswith(".parquet")),
        )
        meta = {
            "format-version": 2,
            "schemas": [{"schema-id": 0, "fields": [
                {"id": 1, "name": "id", "type": "int"},
            ]}],
            "current-schema-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "default-spec-id": 0,
        }
        files = [
            {"file_path": p1, "partition": {}, "_data_seq": 1,
             "content": 0},
            {"file_path": p2, "partition": {}, "_data_seq": 1,
             "content": 0},
        ]
        deletes = [
            {"file_path": dfile, "content": 1, "_data_seq": 2},
        ]
        monkeypatch.setattr(
            ice, "iceberg_snapshot_files",
            lambda *a, **k: (meta, files, deletes),
        )
        with pytest.raises(IcebergError, match="duplicate data-file"):
            read_iceberg(spark, str(tmp_path)).collect()


class TestIcebergFieldIdResolution:
    def _seed_evolved(self, spark, path):
        from pyspark.sql import functions as F

        from rust_dataframe_spark.sources.iceberg import (
            evolve_iceberg_schema,
            write_iceberg_commit,
        )

        s1 = write_iceberg_commit(
            spark, path,
            spark.range(6).select(
                F.col("id").cast("int").alias("id"),
                (F.col("id") % 2).cast("int").alias("p"),
                (F.col("id") * 2).cast("int").alias("val"),
            ),
            partition_by=["p"],
        )
        evolve_iceberg_schema(
            path, renames={"val": "score"}, adds=[("bonus", "int")]
        )
        s2 = write_iceberg_commit(
            spark, path,
            spark.createDataFrame(
                [(100, 0, 300, 7)], "id int, p int, score int, bonus int"
            ),
            partition_by=["p"],
        )
        return s1, s2

    def test_rename_resolves_by_id(self, spark, tmp_path):
        from rust_dataframe_spark.sources.iceberg import read_iceberg

        path = str(tmp_path / "t")
        self._seed_evolved(spark, path)
        cur = read_iceberg(spark, path)
        assert cur.columns == ["id", "p", "score", "bonus"]
        got = {r["id"]: (r["score"], r["bonus"])
               for r in cur.collect()}
        # pre-rename files: physical name 'val' resolves to 'score'
        assert got[4] == (8, None)
        assert got[100] == (300, 7)

    def test_time_travel_uses_snapshot_schema(self, spark, tmp_path):
        from rust_dataframe_spark.sources.iceberg import read_iceberg

        path = str(tmp_path / "t")
        s1, _s2 = self._seed_evolved(spark, path)
        old = read_iceberg(spark, path, snapshot_id=s1)
        assert old.columns == ["id", "p", "val"]
        assert old.count() == 6

    def test_writer_rejects_unknown_column(self, spark, tmp_path):
        from rust_dataframe_spark.sources.iceberg import (
            IcebergError,
            write_iceberg_commit,
        )

        path = str(tmp_path / "t")
        self._seed_evolved(spark, path)
        with pytest.raises(IcebergError, match="not in the table schema"):
            write_iceberg_commit(
                spark, path,
                spark.createDataFrame(
                    [(1, 0, 1)], "id int, p int, val int"
                ),
                partition_by=["p"],
            )

    def test_evolve_validations(self, spark, tmp_path):
        from rust_dataframe_spark.sources.iceberg import (
            IcebergError,
            evolve_iceberg_schema,
            write_iceberg_commit,
        )

        path = str(tmp_path / "t")
        write_iceberg_commit(
            spark, path,
            spark.createDataFrame([(1, "a")], "id int, s string"),
        )
        with pytest.raises(IcebergError, match="not in schema"):
            evolve_iceberg_schema(path, renames={"nope": "x"})
        with pytest.raises(IcebergError, match="collides"):
            evolve_iceberg_schema(path, renames={"s": "id"})
        with pytest.raises(IcebergError, match="already exists"):
            evolve_iceberg_schema(path, adds=[("id", "int")])
        with pytest.raises(IcebergError, match="no changes"):
            evolve_iceberg_schema(path)

    def test_mixed_stamped_unstamped_loud(self, spark, tmp_path):
        import os as _os

        from rust_dataframe_spark.sources.iceberg import (
            IcebergError,
            iceberg_snapshot_files,
            read_iceberg,
            write_iceberg_commit,
        )

        path = str(tmp_path / "t")
        write_iceberg_commit(
            spark, path,
            spark.createDataFrame([(1,), (2,)], "id int"),
        )
        # overwrite one live data file with an UNSTAMPED twin
        _meta, files = iceberg_snapshot_files(path)
        victim = files[0]["file_path"]
        tmp = str(tmp_path / "plain")
        spark.createDataFrame([(9,)], "id int").coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        plain = next(
            _os.path.join(tmp, n) for n in _os.listdir(tmp)
            if n.endswith(".parquet")
        )
        # second commit so the table has BOTH stamped and unstamped
        write_iceberg_commit(
            spark, path, spark.createDataFrame([(3,)], "id int")
        )
        _os.replace(plain, victim)
        with pytest.raises(IcebergError, match="mix field-id"):
            read_iceberg(spark, path).collect()

    def test_unstamped_rename_guard_loud(self, spark, tmp_path):
        import os as _os

        from rust_dataframe_spark.sources.iceberg import (
            IcebergError,
            evolve_iceberg_schema,
            iceberg_snapshot_files,
            read_iceberg,
            write_iceberg_commit,
        )

        path = str(tmp_path / "t")
        write_iceberg_commit(
            spark, path,
            spark.createDataFrame(
                [(1, 10)], "id int, val int"
            ).coalesce(1),
        )
        # strip ids: replace the live file with an unstamped twin
        # (a plain re-write of the read preserves footer field ids,
        # so build the twin from fresh data instead)
        _meta, files = iceberg_snapshot_files(path)
        victim = files[0]["file_path"]
        tmp = str(tmp_path / "plain")
        spark.createDataFrame(
            [(1, 10)], "id int, val int"
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        plain = next(
            _os.path.join(tmp, n) for n in _os.listdir(tmp)
            if n.endswith(".parquet")
        )
        _os.replace(plain, victim)
        # sanity: unstamped but names match -> still reads by name
        assert read_iceberg(spark, path).count() == 1
        evolve_iceberg_schema(path, renames={"val": "score"})
        with pytest.raises(IcebergError, match="rename cannot be"):
            read_iceberg(spark, path).collect()

    def test_unstamped_add_evolution_reads_nulls(self, spark, tmp_path):
        import os as _os

        from rust_dataframe_spark.sources.iceberg import (
            evolve_iceberg_schema,
            iceberg_snapshot_files,
            read_iceberg,
            write_iceberg_commit,
        )

        path = str(tmp_path / "t")
        write_iceberg_commit(
            spark, path,
            spark.createDataFrame(
                [(1, 10)], "id int, val int"
            ).coalesce(1),
        )
        _meta, files = iceberg_snapshot_files(path)
        victim = files[0]["file_path"]
        tmp = str(tmp_path / "plain")
        spark.createDataFrame(
            [(1, 10)], "id int, val int"
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        plain = next(
            _os.path.join(tmp, n) for n in _os.listdir(tmp)
            if n.endswith(".parquet")
        )
        _os.replace(plain, victim)
        # pure ADD evolution is name-resolvable: no unknown physical
        # names, the new column is null everywhere
        evolve_iceberg_schema(path, adds=[("extra", "long")])
        row = read_iceberg(spark, path).first()
        assert (row["id"], row["val"], row["extra"]) == (1, 10, None)


class TestProtocolVersionGate:
    def test_minreader_4_gates_even_with_empty_features(
        self, spark, tmp_path
    ):
        path = str(tmp_path / "v4")
        df = spark.createDataFrame([(1,)], "id int")
        write_delta_commit(spark, path, df)
        log = os.path.join(path, "_delta_log")
        with open(os.path.join(log, f"{1:020d}.json"), "w") as fh:
            fh.write(json.dumps({"protocol": {
                "minReaderVersion": 4, "minWriterVersion": 7,
                "readerFeatures": [],
            }}) + "\n")
        with pytest.raises(DeltaError, match="minReaderVersion 4"):
            read_delta(spark, path)

    def test_minreader_3_supported_features_still_pass(
        self, spark, tmp_path
    ):
        path = str(tmp_path / "v3")
        df = spark.createDataFrame([(1,)], "id int")
        write_delta_commit(spark, path, df)
        log = os.path.join(path, "_delta_log")
        with open(os.path.join(log, f"{1:020d}.json"), "w") as fh:
            fh.write(json.dumps({"protocol": {
                "minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }}) + "\n")
        assert read_delta(spark, path).count() == 1


class TestV2CheckpointFeature:
    def test_v2_checkpoint_declares_feature(self, spark, tmp_path):
        path = str(tmp_path / "cp")
        df = spark.createDataFrame([(i,) for i in range(8)], "id int")
        write_delta_commit(spark, path, df)
        v = write_delta_checkpoint(spark, path, style="v2")
        log = os.path.join(path, "_delta_log")
        cp = next(
            n for n in os.listdir(log)
            if n.startswith(f"{v:020d}.checkpoint.")
            and n.endswith(".parquet")
        )
        rows = spark.read.parquet(os.path.join(log, cp)).collect()
        protos = [
            r["protocol"] for r in rows
            if r["protocol"] is not None
            and r["protocol"]["minReaderVersion"] is not None
        ]
        assert len(protos) == 1
        p = protos[0]
        assert p["minReaderVersion"] == 3
        assert p["minWriterVersion"] == 7
        assert "v2Checkpoint" in (p["readerFeatures"] or [])
        assert "v2Checkpoint" in (p["writerFeatures"] or [])
        # and it still bootstraps
        for n in os.listdir(log):
            if n.endswith(".json") and not n.startswith("_"):
                os.remove(os.path.join(log, n))
        assert read_delta(spark, path).count() == 8

    def test_classic_checkpoint_unchanged(self, spark, tmp_path):
        path = str(tmp_path / "cpc")
        df = spark.createDataFrame([(1,)], "id int")
        write_delta_commit(spark, path, df)
        v = write_delta_checkpoint(spark, path, style="classic")
        log = os.path.join(path, "_delta_log")
        rows = spark.read.parquet(
            os.path.join(log, f"{v:020d}.checkpoint.parquet")
        ).collect()
        protos = [
            r["protocol"] for r in rows if r["protocol"] is not None
            and r["protocol"]["minReaderVersion"] is not None
        ]
        assert protos[0]["minReaderVersion"] == 1


class TestDeltaIdMode:
    def _seed(self, spark, path):
        from pyspark.sql import functions as F

        write_delta_commit(
            spark, path,
            spark.range(12).select(
                F.col("id").cast("int").alias("id"),
                (F.col("id") % 2).cast("int").alias("p"),
                (F.col("id") * 10).cast("int").alias("val"),
            ),
            partition_by=["p"], column_mapping="id",
        )

    def test_id_mode_reads_logical_names(self, spark, tmp_path):
        path = str(tmp_path / "t")
        self._seed(spark, path)
        df = read_delta(spark, path)
        assert set(df.columns) == {"id", "p", "val"}
        row = df.filter("id = 7").first()
        assert (row["p"], row["val"]) == (1, 70)

    def test_rename_preserves_old_files(self, spark, tmp_path):
        from rust_dataframe_spark.sources.delta import (
            rename_delta_columns,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)
        rename_delta_columns(spark, path, {"val": "score"})
        write_delta_commit(
            spark, path,
            spark.createDataFrame(
                [(100, 0, 1000)], "id int, p int, score int"
            ),
            partition_by=["p"],
        )
        df = read_delta(spark, path)
        assert set(df.columns) == {"id", "p", "score"}
        got = {r["id"]: r["score"] for r in df.collect()}
        assert got[7] == 70  # written under physical 'val' id
        assert got[100] == 1000

    def test_rename_without_mapping_loud(self, spark, tmp_path):
        path = str(tmp_path / "t")
        write_delta_commit(
            spark, path, spark.createDataFrame([(1,)], "id int")
        )
        from rust_dataframe_spark.sources.delta import (
            rename_delta_columns,
        )

        with pytest.raises(DeltaError, match="requires column mapping"):
            rename_delta_columns(spark, path, {"id": "x"})

    def test_id_mode_with_deletion_vectors(self, spark, tmp_path):
        import os as _os

        from pyspark.sql import functions as F

        from rust_dataframe_spark.sources.delta import (
            delta_snapshot_files,
            write_delta_delete_rows,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)
        _m, adds = delta_snapshot_files(spark, path)
        by_base = {
            _os.path.basename(a["path"]): a["path"] for a in adds
        }
        doomed = {}
        for r in spark.read.parquet(
            *[_os.path.join(path, a["path"]) for a in adds]
        ).select(
            F.element_at(F.split(F.input_file_name(), "/"), -1)
            .alias("b"),
            F.col("_metadata.row_index").alias("pos"),
            F.col("*"),
        ).collect():
            # tombstone physical rows whose first int column % 5 == 3
            vals = [v for k, v in r.asDict().items()
                    if k not in ("b", "pos")]
            if int(vals[0]) % 5 == 3:
                doomed.setdefault(by_base[r["b"]], []).append(r["pos"])
        write_delta_delete_rows(spark, path, doomed)
        df = read_delta(spark, path)
        ids = sorted(r["id"] for r in df.collect())
        assert ids == [i for i in range(12) if i % 5 != 3]

    def test_id_mode_checkpoint_declares_feature(self, spark, tmp_path):
        path = str(tmp_path / "t")
        self._seed(spark, path)
        v = write_delta_checkpoint(spark, path)
        log = os.path.join(path, "_delta_log")
        rows = spark.read.parquet(
            os.path.join(log, f"{v:020d}.checkpoint.parquet")
        ).collect()
        protos = [
            r["protocol"] for r in rows if r["protocol"] is not None
            and r["protocol"]["minReaderVersion"] is not None
        ]
        assert protos[0]["minReaderVersion"] == 2
        # and bootstrap keeps id-mode resolution
        for n in os.listdir(log):
            if n.endswith(".json") and not n.startswith("_"):
                os.remove(os.path.join(log, n))
        assert read_delta(spark, path).count() == 12


class TestDeltaCDF:
    def _seed(self, spark, path):
        from pyspark.sql import functions as F

        write_delta_commit(
            spark, path,
            spark.range(8).select(
                F.col("id").cast("int").alias("id"),
                (F.col("id") * 2).cast("int").alias("val"),
            ).coalesce(1),
            enable_cdf=True,
        )

    def test_requires_cdf_flag(self, spark, tmp_path):
        from rust_dataframe_spark.sources.delta import (
            read_delta_changes,
        )

        path = str(tmp_path / "t")
        write_delta_commit(
            spark, path, spark.createDataFrame([(1,)], "id int")
        )
        with pytest.raises(DeltaError, match="enableChangeDataFeed"):
            read_delta_changes(spark, path, starting_version=0)

    def test_synthesized_inserts_and_deletes(self, spark, tmp_path):
        from rust_dataframe_spark.sources.delta import (
            delta_snapshot_files,
            drop_delta_files,
            read_delta_changes,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)
        _m, adds = delta_snapshot_files(spark, path)
        drop_delta_files(spark, path, [adds[0]["path"]])
        ch = read_delta_changes(spark, path, starting_version=0)
        got = {
            (r["_commit_version"], r["_change_type"])
            for r in ch.collect()
        }
        assert (0, "insert") in got and (1, "delete") in got
        assert ch.filter("_change_type = 'insert'").count() == 8
        assert ch.filter("_change_type = 'delete'").count() == 8

    def test_update_cdc_pre_post(self, spark, tmp_path):
        from rust_dataframe_spark.sources.delta import (
            read_delta,
            read_delta_changes,
            update_delta_rows_cdf,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)
        update_delta_rows_cdf(
            spark, path, "id >= 6", {"val": "val * 10"}
        )
        ch = read_delta_changes(
            spark, path, starting_version=1
        ).collect()
        pre = sorted(
            r["val"] for r in ch
            if r["_change_type"] == "update_preimage"
        )
        post = sorted(
            r["val"] for r in ch
            if r["_change_type"] == "update_postimage"
        )
        assert pre == [12, 14] and post == [120, 140]
        snap = {r["id"]: r["val"]
                for r in read_delta(spark, path).collect()}
        assert snap[7] == 140 and snap[2] == 4

    def test_mixed_rewrite_without_cdc_loud(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from rust_dataframe_spark.sources.delta import (
            read_delta_changes,
        )

        path = str(tmp_path / "t")
        df = spark.range(6).select(
            F.col("id").cast("int").alias("id"),
            (F.col("id") % 2).cast("int").alias("p"),
        )
        write_delta_commit(
            spark, path, df, partition_by=["p"], enable_cdf=True
        )
        # replace_partitions = adds AND removes with dataChange, no cdc
        write_delta_commit(
            spark, path,
            spark.createDataFrame([(99, 0)], "id int, p int"),
            partition_by=["p"], replace_partitions=True,
        )
        with pytest.raises(DeltaError, match="not inferable"):
            read_delta_changes(spark, path, starting_version=0)

    def test_partitioned_synthesis_reinjects(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from rust_dataframe_spark.sources.delta import (
            read_delta_changes,
        )

        path = str(tmp_path / "t")
        df = spark.range(6).select(
            F.col("id").cast("int").alias("id"),
            (F.col("id") % 2).cast("int").alias("p"),
        )
        write_delta_commit(
            spark, path, df, partition_by=["p"], enable_cdf=True
        )
        ch = read_delta_changes(spark, path, starting_version=0)
        got = {(r["id"], r["p"]) for r in ch.collect()}
        assert got == {(i, i % 2) for i in range(6)}


class TestIcebergIncremental:
    def test_non_append_in_range_refuses(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from rust_dataframe_spark.sources.iceberg import (
            IcebergError,
            iceberg_snapshot_files,
            read_iceberg_changes,
            write_iceberg_commit,
            write_iceberg_position_deletes,
        )

        path = str(tmp_path / "t")
        s0 = write_iceberg_commit(
            spark, path,
            spark.range(4).select(F.col("id").cast("int").alias("id")),
        )
        _m, files = iceberg_snapshot_files(path)
        write_iceberg_position_deletes(
            spark, path, [(files[0]["file_path"], 0)]
        )
        write_iceberg_commit(
            spark, path,
            spark.createDataFrame([(50,)], "id int"),
        )
        with pytest.raises(IcebergError, match="append-only"):
            read_iceberg_changes(spark, path, from_snapshot_id=s0)

    def test_unknown_snapshot_loud(self, spark, tmp_path):
        from rust_dataframe_spark.sources.iceberg import (
            IcebergError,
            read_iceberg_changes,
            write_iceberg_commit,
        )

        path = str(tmp_path / "t")
        write_iceberg_commit(
            spark, path, spark.createDataFrame([(1,)], "id int")
        )
        with pytest.raises(IcebergError, match="not in metadata"):
            read_iceberg_changes(spark, path, from_snapshot_id=123)

    def test_empty_range(self, spark, tmp_path):
        from rust_dataframe_spark.sources.iceberg import (
            read_iceberg_changes,
            write_iceberg_commit,
        )

        path = str(tmp_path / "t")
        s0 = write_iceberg_commit(
            spark, path, spark.createDataFrame([(1,)], "id int")
        )
        ch = read_iceberg_changes(spark, path, from_snapshot_id=s0)
        assert ch.count() == 0
        assert "_snapshot_id" in ch.columns


class TestHudiIncremental:
    def test_requires_meta_fields(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from rust_dataframe_spark.sources.hudi import (
            HudiError,
            read_hudi_incremental,
            write_hudi_commit,
        )

        path = str(tmp_path / "t")
        t0 = write_hudi_commit(
            spark, path,
            spark.range(4).select(F.col("id").cast("int").alias("id")),
        )
        with pytest.raises(HudiError, match="_hoodie_commit_time"):
            read_hudi_incremental(
                spark, path, begin_ts=t0 - 1
            ).collect()

    def test_mor_serves_since_round12(self, spark, tmp_path):
        # round 11 pinned a loud MOR refusal here; round 12 implemented
        # MOR incremental reads (q473, tests/test_r12_lakehouse.py
        # TestHudiMorIncremental), so this now pins the POSITIVE path:
        # a meta-fielded MOR table's base commit serves incrementally.
        from pyspark.sql import functions as F

        from rust_dataframe_spark.sources.hudi import (
            HudiError,
            read_hudi_incremental,
            write_hudi_commit,
        )

        path = str(tmp_path / "t")
        write_hudi_commit(
            spark, path,
            spark.range(4).select(
                F.col("id").cast("int").alias("id")
            ).coalesce(1),
            table_type="MERGE_ON_READ", record_key="id",
            meta_fields=True,
        )
        got = read_hudi_incremental(spark, path, begin_ts=0)
        assert sorted(r.id for r in got.collect()) == [0, 1, 2, 3]

        # the meta-field-less MOR shape still refuses loudly
        plain = str(tmp_path / "plain")
        write_hudi_commit(
            spark, plain,
            spark.range(4).select(
                F.col("id").cast("int").alias("id")
            ).coalesce(1),
            table_type="MERGE_ON_READ", record_key="id",
        )
        with pytest.raises(HudiError, match="meta"):
            read_hudi_incremental(spark, plain, begin_ts=0)


class TestEqDeleteShuffledFallback:
    def _seed(self, spark, path):
        from pyspark.sql import functions as F

        from rust_dataframe_spark.sources.iceberg import (
            write_iceberg_commit,
            write_iceberg_equality_deletes,
        )

        write_iceberg_commit(
            spark, path,
            spark.range(20).select(
                F.col("id").cast("int").alias("id"),
                (F.col("id") * 2).cast("int").alias("val"),
            ),
        )
        write_iceberg_equality_deletes(
            spark, path,
            spark.createDataFrame([(3,), (7,)], "id int"), ["id"],
        )
        write_iceberg_commit(
            spark, path,
            spark.createDataFrame([(3, 999)], "id int, val int"),
        )

    def test_both_paths_same_answers(self, spark, tmp_path, monkeypatch):
        import rust_dataframe_spark.sources.iceberg as ice

        path = str(tmp_path / "t")
        self._seed(spark, path)
        bc = sorted(
            (r["id"], r["val"])
            for r in ice.read_iceberg(spark, path).collect()
        )
        monkeypatch.setattr(ice, "_EQ_DELETE_BROADCAST_ROWS", 0)
        df = ice.read_iceberg(spark, path)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the fallback must hash-partition on the equality keys — a
        # sort-merge anti-join, never a broadcast nested loop
        assert "SortMergeJoin" in plan and "LeftAnti" in plan
        assert "BroadcastNestedLoop" not in plan
        sh = sorted((r["id"], r["val"]) for r in df.collect())
        assert sh == bc
        assert (3, 999) in sh and (7, 14) not in sh


class TestDeltaMaintenance:
    def _seed(self, spark, path, cdf=False):
        from pyspark.sql import functions as F

        for k in range(3):
            write_delta_commit(
                spark, path,
                spark.range(k * 10, k * 10 + 10).select(
                    F.col("id").cast("int").alias("id"),
                    (F.col("id") % 2).cast("int").alias("p"),
                ).coalesce(1),
                partition_by=["p"], enable_cdf=cdf,
            )

    def test_compact_preserves_data_and_cdf_silence(
        self, spark, tmp_path
    ):
        from pyspark.sql import functions as F

        from rust_dataframe_spark.sources.delta import (
            compact_delta_files,
            delta_snapshot_files,
            read_delta_changes,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path, cdf=True)
        _m, before = delta_snapshot_files(spark, path)
        v = compact_delta_files(spark, path)
        _m, after = delta_snapshot_files(spark, path)
        assert len(after) < len(before)
        df = read_delta(spark, path)
        assert df.count() == 30
        assert df.agg(F.sum("id")).first()[0] == 435
        vers = {
            r["_commit_version"]
            for r in read_delta_changes(
                spark, path, starting_version=0
            ).select("_commit_version").distinct().collect()
        }
        assert v not in vers  # dataChange=false: invisible to CDF

    def test_compact_materializes_dvs_since_round12(self, spark, tmp_path):
        import os as _os

        from rust_dataframe_spark.sources.delta import (
            compact_delta_files,
            delta_snapshot_files,
            write_delta_delete_rows,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)
        _m, adds = delta_snapshot_files(spark, path)
        target = adds[0]["path"]
        write_delta_delete_rows(spark, path, {target: [0]})
        # round 11 pinned a loud DV refusal here; round 12 implemented
        # DV-materializing OPTIMIZE (q474, tests/test_r12_lakehouse.py
        # TestDeltaOptimizeDV), so this now pins the POSITIVE path:
        # compaction succeeds, the census is preserved, and the
        # compacted table carries no deletion vectors.
        from rust_dataframe_spark.sources.delta import read_delta

        before = read_delta(spark, path).count()
        compact_delta_files(spark, path)
        assert read_delta(spark, path).count() == before
        _m2, adds2 = delta_snapshot_files(spark, path)
        assert not any(
            (a.get("deletionVector") or {}).get("storageType")
            for a in adds2
        )

    def test_vacuum_deletes_unreferenced_only(self, spark, tmp_path):
        import glob as _glob

        from rust_dataframe_spark.sources.delta import (
            compact_delta_files,
            vacuum_delta,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)
        compact_delta_files(spark, path)
        removed = vacuum_delta(spark, path, retain_versions=1)
        assert removed == 6  # the six pre-compaction small files
        assert read_delta(spark, path).count() == 30
        # keeping 4 versions retains everything
        assert vacuum_delta(spark, path, retain_versions=10) == 0

    def test_vacuum_breaks_pre_horizon_time_travel(
        self, spark, tmp_path
    ):
        from rust_dataframe_spark.sources.delta import (
            compact_delta_files,
            vacuum_delta,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)
        compact_delta_files(spark, path)
        vacuum_delta(spark, path, retain_versions=1)
        with pytest.raises(Exception):
            read_delta(spark, path, version=0).collect()


class TestIcebergExpiry:
    def test_expiry_census_and_loudness(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from rust_dataframe_spark.sources.iceberg import (
            IcebergError,
            expire_iceberg_snapshots,
            read_iceberg,
            read_iceberg_changes,
            write_iceberg_commit,
        )

        path = str(tmp_path / "t")
        s0 = write_iceberg_commit(
            spark, path,
            spark.range(6).select(
                F.col("id").cast("int").alias("id"),
                (F.col("id") % 2).cast("int").alias("p"),
            ),
            partition_by=["p"],
        )
        s1 = write_iceberg_commit(
            spark, path,
            spark.createDataFrame([(50, 0)], "id int, p int"),
            partition_by=["p"],
        )
        s2 = write_iceberg_commit(
            spark, path,
            spark.createDataFrame([(60, 1)], "id int, p int"),
            partition_by=["p"],
        )
        removed = expire_iceberg_snapshots(path, keep_last=2)
        assert removed >= 2  # s0's manifest list + manifest at least
        assert read_iceberg(spark, path).count() == 8
        assert read_iceberg(spark, path, snapshot_id=s1).count() == 7
        with pytest.raises(IcebergError, match="not in metadata"):
            read_iceberg(spark, path, snapshot_id=s0)
        with pytest.raises(IcebergError, match="not in metadata"):
            read_iceberg_changes(spark, path, from_snapshot_id=s0)
        # incremental inside the retained window still works
        got = read_iceberg_changes(
            spark, path, from_snapshot_id=s1, to_snapshot_id=s2
        )
        assert [r["id"] for r in got.collect()] == [60]

    def test_expiry_keeps_current(self, spark, tmp_path):
        from rust_dataframe_spark.sources.iceberg import (
            expire_iceberg_snapshots,
            write_iceberg_commit,
        )

        path = str(tmp_path / "t")
        write_iceberg_commit(
            spark, path, spark.createDataFrame([(1,)], "id int")
        )
        assert expire_iceberg_snapshots(path, keep_last=5) == 0
        assert read_iceberg(spark, path).count() == 1


class TestIcebergStatsPruning:
    def _seed(self, spark, path):
        from pyspark.sql import functions as F

        from rust_dataframe_spark.sources.iceberg import (
            write_iceberg_commit,
        )

        for k in range(4):
            write_iceberg_commit(
                spark, path,
                spark.range(k * 100, k * 100 + 100).select(
                    F.col("id").cast("long").alias("id"),
                    F.concat(F.lit("n"), F.col("id")).alias("name"),
                ).coalesce(1),
            )

    def test_plan_counts_and_scan_shrinks(self, spark, tmp_path):
        from rust_dataframe_spark.sources.iceberg import (
            iceberg_plan_files,
            read_iceberg,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)
        assert iceberg_plan_files(path, where="id >= 250") == (2, 4)
        assert iceberg_plan_files(path, where="id < 100") == (1, 4)
        assert iceberg_plan_files(path, where="id = 150") == (1, 4)
        assert iceberg_plan_files(path) == (4, 4)
        df = read_iceberg(spark, path, where="id >= 250")
        assert len(df.inputFiles()) == 2
        assert df.count() == 150

    def test_unrecognized_conjunct_never_prunes(self, spark, tmp_path):
        from rust_dataframe_spark.sources.iceberg import (
            iceberg_plan_files,
            read_iceberg,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)
        # modulo isn't in the simple grammar: no pruning, but the
        # residual filter still gives the right answer
        kept, total = iceberg_plan_files(path, where="id % 2 = 0")
        assert (kept, total) == (4, 4)
        assert read_iceberg(
            spark, path, where="id % 2 = 0"
        ).count() == 200

    def test_mixed_recognized_unrecognized(self, spark, tmp_path):
        from rust_dataframe_spark.sources.iceberg import (
            read_iceberg,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)
        df = read_iceberg(
            spark, path, where="id >= 250 AND id % 2 = 0"
        )
        assert len(df.inputFiles()) == 2  # the >= conjunct pruned
        assert df.count() == 75

    def test_type_mismatch_conjunct_safe(self, spark, tmp_path):
        from rust_dataframe_spark.sources.iceberg import (
            iceberg_plan_files,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)
        # string literal against a long column: no pruning, no crash
        assert iceberg_plan_files(
            path, where="id = 'abc'"
        ) == (4, 4)

    def test_pruning_composes_with_deletes(self, spark, tmp_path):
        from rust_dataframe_spark.sources.iceberg import (
            iceberg_snapshot_files,
            read_iceberg,
            write_iceberg_position_deletes,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)
        _m, files = iceberg_snapshot_files(path)
        # tombstone position 0 of the LAST file (ids 300..399)
        target = sorted(files, key=lambda f: f["file_path"])[-1]
        # find which file holds id 300 by bounds
        for f in files:
            lo = {d["key"]: d["value"]
                  for d in (f.get("lower_bounds") or [])}
            if lo and int.from_bytes(
                lo[1][:8], "little", signed=True
            ) == 300:
                target = f
                break
        write_iceberg_position_deletes(
            spark, path, [(target["file_path"], 0)]
        )
        df = read_iceberg(spark, path, where="id >= 250")
        assert df.count() == 149  # id 300 tombstoned
        assert df.filter("id = 300").count() == 0


class TestIcebergDropColumn:
    def test_drop_readd_no_resurrection(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from rust_dataframe_spark.sources.iceberg import (
            IcebergError,
            evolve_iceberg_schema,
            read_iceberg,
            write_iceberg_commit,
        )

        path = str(tmp_path / "t")
        write_iceberg_commit(
            spark, path,
            spark.range(5).select(
                F.col("id").cast("int").alias("id"),
                (F.col("id") % 2).cast("int").alias("p"),
                (F.col("id") * 7).cast("int").alias("secret"),
            ),
            partition_by=["p"],
        )
        evolve_iceberg_schema(path, drops=["secret"])
        df = read_iceberg(spark, path)
        assert df.columns == ["id", "p"]
        # re-adding the NAME mints a fresh field id: the spec's
        # guarantee that dropped data can never resurrect
        evolve_iceberg_schema(path, adds=[("secret", "int")])
        vals = [
            r["secret"] for r in read_iceberg(spark, path).collect()
        ]
        assert vals == [None] * 5
        with pytest.raises(IcebergError, match="partition spec"):
            evolve_iceberg_schema(path, drops=["p"])
        with pytest.raises(IcebergError, match="not in schema"):
            evolve_iceberg_schema(path, drops=["ghost"])


class TestDeltaDataSkipping:
    def _seed(self, spark, path):
        from pyspark.sql import functions as F

        for k in range(4):
            write_delta_commit(
                spark, path,
                spark.range(k * 100, k * 100 + 100).select(
                    F.col("id").cast("long").alias("id"),
                    F.lit(k).cast("int").alias("p"),
                ).coalesce(1),
                partition_by=["p"],
            )

    def test_stats_and_partition_pruning(self, spark, tmp_path):
        from rust_dataframe_spark.sources.delta import (
            delta_plan_files,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)
        assert delta_plan_files(spark, path, where="id >= 250") == (2, 4)
        assert delta_plan_files(spark, path, where="p = 2") == (1, 4)
        assert delta_plan_files(
            spark, path, where="p >= 1 AND id < 150"
        ) == (1, 4)
        assert delta_plan_files(spark, path) == (4, 4)
        df = read_delta(spark, path, where="id >= 250")
        assert len(df.inputFiles()) == 2
        assert df.count() == 150

    def test_unrecognized_conjunct_safe(self, spark, tmp_path):
        path = str(tmp_path / "t")
        self._seed(spark, path)
        df = read_delta(spark, path, where="id % 2 = 0")
        assert len(df.inputFiles()) == 4
        assert df.count() == 200

    def test_skipping_with_column_mapping(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from rust_dataframe_spark.sources.delta import (
            delta_plan_files,
        )

        path = str(tmp_path / "t")
        for k in range(3):
            write_delta_commit(
                spark, path,
                spark.range(k * 10, k * 10 + 10).select(
                    F.col("id").cast("long").alias("id")
                ).coalesce(1),
                column_mapping="name" if k == 0 else False,
            )
        # stats keys are PHYSICAL names; the logical conjunct still
        # prunes through the mapping
        assert delta_plan_files(spark, path, where="id >= 20") == (1, 3)
        assert read_delta(spark, path, where="id >= 20").count() == 10

    def test_skipping_composes_with_dvs(self, spark, tmp_path):
        import os as _os

        from pyspark.sql import functions as F

        from rust_dataframe_spark.sources.delta import (
            delta_snapshot_files,
            write_delta_delete_rows,
        )

        path = str(tmp_path / "t")
        self._seed(spark, path)
        _m, adds = delta_snapshot_files(spark, path)
        # tombstone position 0 of the file holding ids 300..399
        by_range = {}
        for a in adds:
            import json as _json

            st = _json.loads(a["stats"])
            by_range[st["minValues"]["id"]] = a["path"]
        write_delta_delete_rows(spark, path, {by_range[300]: [0]})
        df = read_delta(spark, path, where="id >= 250")
        assert df.count() == 149
        assert df.filter("id = 300").count() == 0
