"""Round-12 lakehouse tests: Iceberg name mapping (spec Column
Projection rule 2) plus the round-12 writer/maintenance extensions.

Fixture discipline matches tests/test_r11_lakehouse.py: every table is
built by the repo's own writer half and read through the real reader
path; refusals are pinned by message substring.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from rust_dataframe_spark.sources.iceberg import (
    IcebergError,
    evolve_iceberg_schema,
    parse_name_mapping,
    read_iceberg,
    set_iceberg_name_mapping,
    write_iceberg_commit,
    write_iceberg_position_deletes,
)


@pytest.fixture()
def tpath(tmp_path):
    p = str(tmp_path / "tbl")
    shutil.rmtree(p, ignore_errors=True)
    return p


def _commit_a(spark, tpath, *, stamped: bool):
    return write_iceberg_commit(
        spark, tpath,
        spark.range(12).select(
            F.col("id").cast("int").alias("id"),
            (F.col("id") % 3).cast("int").alias("p"),
            (F.col("id") * 2).cast("int").alias("val"),
        ),
        partition_by=["p"], stamp_field_ids=stamped,
    )


class TestParseNameMapping:
    def test_absent_property_is_none(self):
        assert parse_name_mapping({"properties": {}}) is None
        assert parse_name_mapping({}) is None

    def test_basic_mapping(self):
        meta = {"properties": {"schema.name-mapping.default":
                '[{"field-id": 1, "names": ["id", "record_id"]},'
                ' {"field-id": 2, "names": ["p"]}]'}}
        assert parse_name_mapping(meta) == {
            "id": 1, "record_id": 1, "p": 2
        }

    def test_entry_without_field_id_skipped(self):
        meta = {"properties": {"schema.name-mapping.default":
                '[{"names": ["ghost"]}, {"field-id": 3, "names": ["x"]}]'}}
        assert parse_name_mapping(meta) == {"x": 3}

    def test_invalid_json_loud(self):
        meta = {"properties": {"schema.name-mapping.default": "{nope"}}
        with pytest.raises(IcebergError, match="not valid JSON"):
            parse_name_mapping(meta)

    def test_non_list_loud(self):
        meta = {"properties": {"schema.name-mapping.default": "{}"}}
        with pytest.raises(IcebergError, match="JSON list"):
            parse_name_mapping(meta)

    def test_nested_entry_loud(self):
        meta = {"properties": {"schema.name-mapping.default":
                '[{"field-id": 1, "names": ["s"],'
                ' "fields": [{"field-id": 2, "names": ["inner"]}]}]'}}
        with pytest.raises(IcebergError, match="nested"):
            parse_name_mapping(meta)

    def test_name_mapped_to_two_ids_loud(self):
        meta = {"properties": {"schema.name-mapping.default":
                '[{"field-id": 1, "names": ["x"]},'
                ' {"field-id": 2, "names": ["x"]}]'}}
        with pytest.raises(IcebergError, match="two field ids"):
            parse_name_mapping(meta)


class TestNameMappingReads:
    def test_rename_resolves_through_mapping(self, spark, tpath):
        _commit_a(spark, tpath, stamped=False)
        set_iceberg_name_mapping(tpath)
        evolve_iceberg_schema(tpath, renames={"val": "score"})
        got = {
            r.id: r.score
            for r in read_iceberg(spark, tpath).collect()
        }
        assert got == {i: i * 2 for i in range(12)}

    def test_missing_mapping_keeps_loud_refusal(self, spark, tpath):
        _commit_a(spark, tpath, stamped=False)
        evolve_iceberg_schema(tpath, renames={"val": "score"})
        with pytest.raises(IcebergError, match="rename cannot be resolved"):
            read_iceberg(spark, tpath).collect()

    def test_ids_win_over_mapping(self, spark, tpath):
        # a STAMPED table with a (stale, wrong) mapping that would
        # swap id<->val: ids must take precedence (spec rule 1)
        _commit_a(spark, tpath, stamped=True)
        set_iceberg_name_mapping(
            tpath, {1: ["val"], 2: ["p"], 3: ["id"]}  # deliberately swapped
        )
        got = {
            r.id: r.val for r in read_iceberg(spark, tpath).collect()
        }
        assert got == {i: i * 2 for i in range(12)}

    def test_mixed_stamped_unstamped_with_mapping(self, spark, tpath):
        _commit_a(spark, tpath, stamped=False)
        set_iceberg_name_mapping(tpath)
        evolve_iceberg_schema(tpath, renames={"val": "score"})
        write_iceberg_commit(
            spark, tpath,
            spark.createDataFrame(
                [(100, 1, 777)], "id int, p int, score int"
            ),
            partition_by=["p"],
        )
        rows = {r.id: r.score for r in read_iceberg(spark, tpath).collect()}
        assert rows[100] == 777 and rows[5] == 10 and len(rows) == 13

    def test_mixed_without_mapping_still_refuses(self, spark, tpath):
        _commit_a(spark, tpath, stamped=False)
        write_iceberg_commit(
            spark, tpath,
            spark.createDataFrame(
                [(100, 1, 777)], "id int, p int, val int"
            ),
            partition_by=["p"],
        )
        with pytest.raises(IcebergError, match="mix"):
            read_iceberg(spark, tpath).collect()

    def test_added_column_null_in_unmapped_files(self, spark, tpath):
        _commit_a(spark, tpath, stamped=False)
        set_iceberg_name_mapping(tpath)
        evolve_iceberg_schema(tpath, adds=[("bonus", "int")])
        rows = read_iceberg(spark, tpath).collect()
        assert len(rows) == 12
        assert all(r.bonus is None for r in rows)

    def test_unknown_physical_names_ignored_under_mapping(
        self, spark, tpath
    ):
        # mapping is the resolution authority: a physical column the
        # mapping doesn't know is simply not projected
        _commit_a(spark, tpath, stamped=False)
        set_iceberg_name_mapping(
            tpath, {1: ["id"], 2: ["p"]}  # no entry for 'val'
        )
        rows = read_iceberg(spark, tpath).collect()
        assert len(rows) == 12
        assert all(r.val is None for r in rows)
        assert {r.id for r in rows} == set(range(12))

    def test_time_travel_pre_rename_under_mapping(self, spark, tpath):
        s1 = _commit_a(spark, tpath, stamped=False)
        set_iceberg_name_mapping(tpath)
        evolve_iceberg_schema(tpath, renames={"val": "score"})
        old = read_iceberg(spark, tpath, snapshot_id=s1)
        assert "val" in old.columns
        got = {r.id: r.val for r in old.collect()}
        assert got == {i: i * 2 for i in range(12)}

    def test_position_deletes_through_union_scan(self, spark, tpath):
        # pos-deletes need _metadata.row_index captured ON each leaf
        # scan (after the name-mapping union it no longer resolves)
        from rust_dataframe_spark.sources.iceberg import (
            iceberg_snapshot_files,
        )

        _commit_a(spark, tpath, stamped=False)
        set_iceberg_name_mapping(tpath)
        evolve_iceberg_schema(tpath, renames={"val": "score"})
        _m, files = iceberg_snapshot_files(tpath)
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
            ).where(F.col("id").isin(3, 7)).collect()
        ]
        write_iceberg_position_deletes(spark, tpath, doomed)
        rows = {r.id for r in read_iceberg(spark, tpath).collect()}
        assert rows == set(range(12)) - {3, 7}

    def test_where_pruning_and_filter_on_mapped_table(self, spark, tpath):
        _commit_a(spark, tpath, stamped=False)
        set_iceberg_name_mapping(tpath)
        evolve_iceberg_schema(tpath, renames={"val": "score"})
        rows = read_iceberg(spark, tpath, where="id >= 10").collect()
        assert {r.id for r in rows} == {10, 11}


class TestDeltaDropColumn:
    @staticmethod
    def _seed(spark, path, mode):
        from rust_dataframe_spark.sources.delta import write_delta_commit

        write_delta_commit(
            spark, path,
            spark.range(10).select(
                F.col("id").cast("int").alias("id"),
                (F.col("id") % 2).cast("int").alias("p"),
                (F.col("id") * 2).cast("int").alias("secret"),
            ),
            partition_by=["p"], column_mapping=mode,
        )

    @pytest.mark.parametrize("mode", ["name", "id"])
    def test_drop_readd_no_resurrection(self, spark, tpath, mode):
        from rust_dataframe_spark.sources.delta import (
            add_delta_columns,
            drop_delta_columns,
            read_delta,
            write_delta_checkpoint,
            write_delta_commit,
        )

        self._seed(spark, tpath, mode)
        drop_delta_columns(spark, tpath, ["secret"])
        assert read_delta(spark, tpath).columns == ["id", "p"]
        write_delta_checkpoint(spark, tpath)
        add_delta_columns(spark, tpath, [("secret", "int")])
        rows = read_delta(spark, tpath).collect()
        assert len(rows) == 10 and all(r.secret is None for r in rows)
        write_delta_commit(
            spark, tpath,
            spark.createDataFrame(
                [(100, 0, 9)], "id int, p int, secret int"
            ),
            partition_by=["p"],
        )
        got = {r.id: r.secret for r in read_delta(spark, tpath).collect()}
        assert got[100] == 9 and got[3] is None
        # pre-drop time travel still reads the original values
        v0 = {r.id: r.secret
              for r in read_delta(spark, tpath, version=0).collect()}
        assert v0[3] == 6

    def test_fresh_physical_name_differs(self, spark, tpath):
        import json as _json
        import os as _os

        from rust_dataframe_spark.sources.delta import (
            add_delta_columns,
            drop_delta_columns,
        )

        self._seed(spark, tpath, "id")

        def phys(name):
            log = _os.path.join(tpath, "_delta_log")
            metas = []
            for f in sorted(_os.listdir(log)):
                if not f.endswith(".json"):
                    continue
                for line in open(_os.path.join(log, f)):
                    a = _json.loads(line)
                    if "metaData" in a:
                        metas.append(a["metaData"])
            fields = _json.loads(metas[-1]["schemaString"])["fields"]
            return {
                f["name"]: f["metadata"][
                    "delta.columnMapping.physicalName"
                ]
                for f in fields
            }

        before = phys("secret")["secret"]
        drop_delta_columns(spark, tpath, ["secret"])
        add_delta_columns(spark, tpath, [("secret", "int")])
        after = phys("secret")["secret"]
        assert before != after

    def test_refusals(self, spark, tpath):
        from rust_dataframe_spark.sources.delta import (
            DeltaError,
            add_delta_columns,
            drop_delta_columns,
            write_delta_commit,
        )

        self._seed(spark, tpath, "id")
        with pytest.raises(DeltaError, match="partitionColumns"):
            drop_delta_columns(spark, tpath, ["p"])
        with pytest.raises(DeltaError, match="not in schema"):
            drop_delta_columns(spark, tpath, ["ghost"])
        with pytest.raises(DeltaError, match="already exists"):
            add_delta_columns(spark, tpath, [("secret", "int")])
        with pytest.raises(DeltaError, match="unsupported"):
            add_delta_columns(spark, tpath, [("x", "decimal(9,2)")])
        # no-mapping table refuses both ways
        plain = tpath + "_plain"
        write_delta_commit(
            spark, plain,
            spark.createDataFrame([(1, 2)], "id int, v int"),
        )
        with pytest.raises(DeltaError, match="column mapping"):
            drop_delta_columns(spark, plain, ["v"])
        with pytest.raises(DeltaError, match="column mapping"):
            add_delta_columns(spark, plain, [("w", "int")])

    def test_drop_every_column_refuses(self, spark, tpath):
        from rust_dataframe_spark.sources.delta import (
            DeltaError,
            drop_delta_columns,
            write_delta_commit,
        )

        write_delta_commit(
            spark, tpath,
            spark.createDataFrame([(1, 2)], "id int, v int"),
            column_mapping="id",
        )
        with pytest.raises(DeltaError, match="every column"):
            drop_delta_columns(spark, tpath, ["id", "v"])


class TestHudiMorIncremental:
    @staticmethod
    def _seed(spark, path):
        from rust_dataframe_spark.sources.hudi import (
            write_hudi_commit,
            write_hudi_log_commit,
        )

        t0 = write_hudi_commit(
            spark, path,
            spark.range(10).select(
                F.col("id").cast("int").alias("id"),
                (F.col("id") % 2).cast("int").alias("p"),
                (F.col("id") * 10).cast("int").alias("v"),
            ).coalesce(1),
            partition_by=["p"], table_type="MERGE_ON_READ",
            record_key="id", meta_fields=True,
        )
        t1 = write_hudi_log_commit(
            spark, path,
            spark.createDataFrame(
                [(3, 1, 999), (100, 0, 5)], "id int, p int, v int"
            ),
        )
        t2 = write_hudi_log_commit(
            spark, path,
            spark.createDataFrame([(4, 0, 444)], "id int, p int, v int"),
            deletes=[("p=1", "5")],
        )
        return t0, t1, t2

    def test_range_semantics(self, spark, tpath):
        from rust_dataframe_spark.sources.hudi import (
            read_hudi_incremental,
        )

        t0, t1, t2 = self._seed(spark, tpath)
        got = sorted(
            (r.id, r.v)
            for r in read_hudi_incremental(
                spark, tpath, begin_ts=t0, end_ts=t1
            ).collect()
        )
        assert got == [(3, 999), (100, 5)]
        got = sorted(
            (r.id, r.v)
            for r in read_hudi_incremental(
                spark, tpath, begin_ts=t0
            ).collect()
        )
        # carried base rows excluded; deleted id 5 absent
        assert got == [(3, 999), (4, 444), (100, 5)]
        got = sorted(
            (r.id, r.v)
            for r in read_hudi_incremental(
                spark, tpath, begin_ts=t1, end_ts=t2
            ).collect()
        )
        assert got == [(4, 444)]

    def test_full_range_is_base_census(self, spark, tpath):
        from rust_dataframe_spark.sources.hudi import (
            read_hudi_incremental,
        )

        t0, _t1, _t2 = self._seed(spark, tpath)
        assert read_hudi_incremental(
            spark, tpath, begin_ts=0, end_ts=t0
        ).count() == 10

    def test_compaction_preserves_provenance(self, spark, tpath):
        from rust_dataframe_spark.sources.hudi import (
            compact_hudi,
            read_hudi_incremental,
            read_hudi_mor,
        )

        t0, t1, t2 = self._seed(spark, tpath)
        tc = compact_hudi(spark, tpath)
        # snapshot unchanged by compaction
        snap = {r.id: r.v for r in read_hudi_mor(spark, tpath).collect()}
        assert snap[3] == 999 and snap[4] == 444 and 5 not in snap
        # the compaction instant itself modifies nothing:
        # (t2, tc] is empty — carried rows keep their original times
        assert read_hudi_incremental(
            spark, tpath, begin_ts=t2, end_ts=tc
        ).count() == 0
        # log-upserted rows still report under their DELTA instants
        got = sorted(
            (r.id, r.v)
            for r in read_hudi_incremental(
                spark, tpath, begin_ts=t0
            ).collect()
        )
        assert got == [(3, 999), (4, 444), (100, 5)]

    def test_no_meta_fields_refuses(self, spark, tpath):
        from rust_dataframe_spark.sources.hudi import (
            HudiError,
            read_hudi_incremental,
            write_hudi_commit,
        )

        write_hudi_commit(
            spark, tpath,
            spark.createDataFrame([(1, 0, 2)], "id int, p int, v int"),
            partition_by=["p"], table_type="MERGE_ON_READ",
            record_key="id",
        )
        with pytest.raises(HudiError, match="_hoodie_commit_time"):
            read_hudi_incremental(spark, tpath, begin_ts=0).collect()


class TestDeltaOptimizeDV:
    @staticmethod
    def _seed(spark, path):
        import os as _os

        from rust_dataframe_spark.sources.delta import (
            delta_snapshot_files,
            write_delta_commit,
            write_delta_delete_rows,
        )

        write_delta_commit(
            spark, path,
            spark.range(20).select(
                F.col("id").cast("int").alias("id"),
                (F.col("id") % 2).cast("int").alias("p"),
                (F.col("id") * 3).cast("int").alias("v"),
            ).repartition(3),
            partition_by=["p"], enable_cdf=True,
        )
        _m, adds = delta_snapshot_files(spark, path)
        per_file = {}
        for a in adds:
            f = _os.path.join(path, a["path"])
            rows = spark.read.parquet(f).select(
                "id", F.col("_metadata.row_index").alias("pos")
            ).collect()
            doomed = [r.pos for r in rows if r.id in (4, 7)]
            if doomed:
                per_file[a["path"]] = doomed
        return write_delta_delete_rows(spark, path, per_file)

    def test_materializes_and_preserves_census(self, spark, tpath):
        from rust_dataframe_spark.sources.delta import (
            compact_delta_files,
            delta_snapshot_files,
            read_delta,
        )

        self._seed(spark, tpath)
        before = sorted(r.id for r in read_delta(spark, tpath).collect())
        assert 4 not in before and 7 not in before
        compact_delta_files(spark, tpath)
        after = sorted(r.id for r in read_delta(spark, tpath).collect())
        assert after == before
        _m, adds = delta_snapshot_files(spark, tpath)
        assert len(adds) == 2
        assert not any(
            a.get("deletionVector") and a["deletionVector"].get("storageType")
            for a in adds
        )

    def test_cdf_silence_at_compaction(self, spark, tpath):
        from rust_dataframe_spark.sources.delta import (
            compact_delta_files,
            read_delta_changes,
        )

        self._seed(spark, tpath)
        v = compact_delta_files(spark, tpath)
        assert read_delta_changes(
            spark, tpath, starting_version=v
        ).count() == 0

    def test_single_dv_file_is_compactable(self, spark, tpath):
        import os as _os

        from rust_dataframe_spark.sources.delta import (
            compact_delta_files,
            delta_snapshot_files,
            read_delta,
            write_delta_commit,
            write_delta_delete_rows,
        )

        write_delta_commit(
            spark, tpath,
            spark.range(8).select(
                F.col("id").cast("int").alias("id")
            ).coalesce(1),
        )
        _m, adds = delta_snapshot_files(spark, tpath)
        f = _os.path.join(tpath, adds[0]["path"])
        rows = spark.read.parquet(f).select(
            "id", F.col("_metadata.row_index").alias("pos")
        ).collect()
        write_delta_delete_rows(
            spark, tpath,
            {adds[0]["path"]: [r.pos for r in rows if r.id in (2, 5)]},
        )
        compact_delta_files(spark, tpath)
        _m, adds = delta_snapshot_files(spark, tpath)
        assert len(adds) == 1 and not adds[0].get("deletionVector")
        assert sorted(r.id for r in read_delta(spark, tpath).collect()) \
            == [0, 1, 3, 4, 6, 7]

    def test_dv_free_single_file_still_nothing_to_compact(
        self, spark, tpath
    ):
        from rust_dataframe_spark.sources.delta import (
            DeltaError,
            compact_delta_files,
            write_delta_commit,
        )

        write_delta_commit(
            spark, tpath,
            spark.range(4).select(
                F.col("id").cast("int").alias("id")
            ).coalesce(1),
        )
        with pytest.raises(DeltaError, match="nothing to compact"):
            compact_delta_files(spark, tpath)


class TestIcebergTransforms:
    def test_murmur3_spec_vectors(self):
        # Iceberg spec Appendix B published test vectors
        import struct

        from rust_dataframe_spark.sources.iceberg import _murmur3_32

        def signed(x):
            return x - (1 << 32) if x >= (1 << 31) else x

        assert signed(_murmur3_32(struct.pack("<q", 34))) == 2017239379
        assert signed(_murmur3_32(b"iceberg")) == 1210000089
        from datetime import date

        days = (date(2017, 11, 16) - date(1970, 1, 1)).days
        assert signed(_murmur3_32(struct.pack("<q", days))) == -653330422

    def test_bucket_and_truncate_helpers(self):
        from rust_dataframe_spark.sources.iceberg import (
            IcebergError,
            iceberg_bucket,
            iceberg_truncate,
        )

        assert iceberg_bucket(34, 16, "int") == 2017239379 % 16
        assert iceberg_bucket("iceberg", 16, "string") \
            == 1210000089 % 16
        assert iceberg_truncate(17, 5, "int") == 15
        assert iceberg_truncate(-1, 5, "int") == -5  # floor, not trunc
        assert iceberg_truncate("blueberry", 2, "string") == "bl"
        with pytest.raises(IcebergError, match="unsupported"):
            iceberg_bucket(1.5, 4, "double")

    def test_transform_survives_edges(self):
        from rust_dataframe_spark.sources.iceberg import (
            _transform_survives,
            iceberg_bucket,
        )

        b = iceberg_bucket(14, 4, "int")
        assert _transform_survives(b, "bucket[4]", "=", 14, "int")
        assert not _transform_survives(
            (b + 1) % 4, "bucket[4]", "=", 14, "int"
        )
        # bucket is order-destroying: range ops never prune
        assert _transform_survives(0, "bucket[4]", "<", 14, "int")
        # type mismatch never prunes
        assert _transform_survives(0, "bucket[4]", "=", "14", "int")
        # truncate string intervals
        assert _transform_survives("ba", "truncate[2]", "=", "banana",
                                   "string")
        assert not _transform_survives("bl", "truncate[2]", "=",
                                       "banana", "string")
        assert not _transform_survives("ap", "truncate[2]", ">=", "b",
                                       "string")
        assert _transform_survives("ap", "truncate[2]", ">=", "ap",
                                   "string")
        assert not _transform_survives("ch", "truncate[2]", "<", "ch",
                                       "string")
        # truncate int bins
        assert _transform_survives(15, "truncate[5]", "=", 17, "int")
        assert not _transform_survives(15, "truncate[5]", ">", 19,
                                       "int")
        # day bins
        assert _transform_survives(19784, "day", "=", "2024-03-02",
                                   "date")
        assert not _transform_survives(19784, "day", "=", "2024-03-03",
                                       "date")
        # identity point value
        assert not _transform_survives(2, "identity", "=", 3, "int")
        assert _transform_survives(3, "identity", "=", 3, "int")

    def test_writer_null_refusal_actually_raises(self, spark, tmp_path):
        p = str(tmp_path / "nulltbl")
        with pytest.raises(IcebergError, match="null partition"):
            write_iceberg_commit(
                spark, p,
                spark.createDataFrame(
                    [(1, "a"), (2, None)], "id int, name string"
                ).coalesce(1),
                partition_transforms=[
                    ("name_tr", "name", "truncate[1]")
                ],
            )

    def test_append_to_transform_table_and_prune(self, spark, tpath):
        from rust_dataframe_spark.sources.iceberg import (
            iceberg_plan_files,
        )

        write_iceberg_commit(
            spark, tpath,
            spark.range(10).select(
                F.col("id").cast("int").alias("id"),
                (F.col("id") % 4).cast("int").alias("k"),
            ).coalesce(1),
            partition_transforms=[("k_b", "k", "bucket[2]")],
        )
        write_iceberg_commit(
            spark, tpath,
            spark.range(100, 105).select(
                F.col("id").cast("int").alias("id"),
                (F.col("id") % 4).cast("int").alias("k"),
            ).coalesce(1),
        )
        df = read_iceberg(spark, tpath)
        assert df.count() == 15
        kept, total = iceberg_plan_files(tpath, where="k = 1",
                                         spark=spark)
        assert kept < total
        got = sorted(
            r.id for r in read_iceberg(
                spark, tpath, where="k = 1"
            ).collect()
        )
        assert got == [1, 5, 9, 101]

    def test_mutually_exclusive_with_partition_by(self, spark, tmp_path):
        p = str(tmp_path / "bad")
        with pytest.raises(IcebergError, match="mutually exclusive"):
            write_iceberg_commit(
                spark, p,
                spark.createDataFrame([(1, 2)], "id int, k int"),
                partition_by=["k"],
                partition_transforms=[("k_b", "k", "bucket[2]")],
            )


class TestIcebergAvroFiles:
    @staticmethod
    def _seed(spark, path):
        write_iceberg_commit(
            spark, path,
            spark.range(10).select(
                F.col("id").cast("int").alias("id"),
                (F.col("id") * 2).cast("int").alias("val"),
            ),
        )
        write_iceberg_commit(
            spark, path,
            spark.range(100, 106).select(
                F.col("id").cast("int").alias("id"),
                (F.col("id") * 3).cast("int").alias("val"),
            ).coalesce(2),
            file_format="avro",
        )

    def test_mixed_format_read(self, spark, tpath):
        self._seed(spark, tpath)
        got = {r.id: r.val for r in read_iceberg(spark, tpath).collect()}
        assert len(got) == 16 and got[4] == 8 and got[103] == 309

    def test_rename_resolves_across_formats(self, spark, tpath):
        self._seed(spark, tpath)
        evolve_iceberg_schema(
            tpath, renames={"val": "score"}, adds=[("bonus", "int")]
        )
        rows = read_iceberg(spark, tpath).collect()
        got = {r.id: (r.score, r.bonus) for r in rows}
        assert got[4] == (8, None) and got[103] == (309, None)

    def test_position_deletes_on_avro_leg(self, spark, tpath):
        from rust_dataframe_spark.sources.iceberg import (
            iceberg_snapshot_files,
            write_iceberg_position_deletes,
        )

        self._seed(spark, tpath)
        _m, files = iceberg_snapshot_files(tpath)
        av = [f for f in files
              if f.get("file_format", "").upper() == "AVRO"]
        # tombstone record ordinal 0 of each avro file
        write_iceberg_position_deletes(
            spark, tpath, [(f["file_path"], 0) for f in av]
        )
        got = {r.id for r in read_iceberg(spark, tpath).collect()}
        assert len(got) == 16 - len(av)
        assert set(range(10)) <= got  # parquet rows untouched

    def test_avro_without_field_ids_refuses(self, spark, tpath):
        import json as _json
        import os as _os

        from rust_dataframe_spark.sources.avro import (
            decode_records,
            encode_records,
        )
        from rust_dataframe_spark.sources.iceberg import (
            iceberg_snapshot_files,
        )

        self._seed(spark, tpath)
        _m, files = iceberg_snapshot_files(tpath)
        av = next(f for f in files
                  if f.get("file_format", "").upper() == "AVRO")
        sch, rows = decode_records(open(av["file_path"], "rb").read())
        for f in sch["fields"]:
            f.pop("field-id", None)
        with open(av["file_path"], "wb") as fh:
            fh.write(encode_records(sch, rows, codec="deflate"))
        with pytest.raises(IcebergError, match="field-id"):
            read_iceberg(spark, tpath).collect()

    def test_partitioned_avro_write_refuses(self, spark, tmp_path):
        p = str(tmp_path / "bad_avro")
        with pytest.raises(IcebergError, match="unpartitioned"):
            write_iceberg_commit(
                spark, p,
                spark.createDataFrame([(1, 2)], "id int, p int"),
                partition_by=["p"], file_format="avro",
            )

    def test_incremental_over_avro_refuses(self, spark, tpath):
        from rust_dataframe_spark.sources.iceberg import (
            read_iceberg_changes,
        )

        s1 = write_iceberg_commit(
            spark, tpath,
            spark.createDataFrame([(1, 2)], "id int, val int"),
        )
        write_iceberg_commit(
            spark, tpath,
            spark.createDataFrame([(3, 4)], "id int, val int"),
            file_format="avro",
        )
        with pytest.raises(IcebergError, match="AVRO"):
            read_iceberg_changes(spark, tpath, from_snapshot_id=s1)
