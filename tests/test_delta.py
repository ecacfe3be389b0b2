"""Delta Lake log reader/writer tests (sources/delta.py) behind q451:
commit replay, dynamic-partition overwrite, time travel, checkpoint
bootstrap, partition re-injection, protocol gates."""

import json
import os
import shutil

import pytest

from rust_dataframe_spark.sources.delta import (
    DeltaError,
    delta_snapshot_files,
    read_delta,
    write_delta_commit,
    write_delta_checkpoint,
)


@pytest.fixture()
def table_path(tmp_path):
    return str(tmp_path / "dt")


def _seed(spark, path):
    from pyspark.sql import functions as F  # noqa: F401

    df0 = spark.createDataFrame(
        [(i, f"n{i}", i % 3) for i in range(30)],
        "id int, name string, p int",
    )
    write_delta_commit(spark, path, df0, partition_by=["p"])
    df1 = spark.createDataFrame(
        [(100 + i, f"m{i}", i % 3) for i in range(9)],
        "id int, name string, p int",
    )
    write_delta_commit(spark, path, df1, partition_by=["p"])
    df2 = spark.createDataFrame(
        [(900 + i, f"z{i}", 1) for i in range(4)],
        "id int, name string, p int",
    )
    write_delta_commit(spark, path, df2, partition_by=["p"],
                       replace_partitions=True)


class TestDelta:
    def test_snapshot_partition_reinjection(self, spark, table_path):
        from pyspark.sql import functions as F

        _seed(spark, table_path)
        snap = read_delta(spark, table_path)
        agg = {
            r["p"]: (r["n"], r["s"])
            for r in snap.groupBy("p").agg(
                F.count("*").alias("n"), F.sum("id").alias("s")
            ).collect()
        }
        assert agg == {0: (13, 444), 1: (4, 3606), 2: (13, 470)}

    def test_time_travel(self, spark, table_path):
        _seed(spark, table_path)
        v1 = read_delta(spark, table_path, version=1)
        assert v1.count() == 39
        assert v1.filter("p = 1").count() == 13  # pre-overwrite

    def test_checkpoint_bootstrap(self, spark, table_path):
        _seed(spark, table_path)
        write_delta_checkpoint(spark, table_path)
        late = spark.createDataFrame(
            [(5000, "late", 2)], "id int, name string, p int"
        )
        write_delta_commit(spark, table_path, late, partition_by=["p"])
        snap = read_delta(spark, table_path)
        assert snap.count() == 31
        assert snap.filter("id = 5000").select("p").first()["p"] == 2
        # the checkpoint genuinely bootstraps: delete the pre-checkpoint
        # JSON commits and the snapshot must still resolve
        log = os.path.join(table_path, "_delta_log")
        for v in (0, 1):
            os.remove(os.path.join(log, f"{v:020d}.json"))
        snap2 = read_delta(spark, table_path)
        assert snap2.count() == 31

    def test_unpartitioned_table(self, spark, table_path):
        df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
        write_delta_commit(spark, table_path, df)
        got = read_delta(spark, table_path).orderBy("id").collect()
        assert [(r["id"], r["s"]) for r in got] == [(1, "a"), (2, "b")]

    def test_protocol_gate(self, spark, table_path):
        _seed(spark, table_path)
        log = os.path.join(table_path, "_delta_log")
        vers = sorted(
            int(n[:20]) for n in os.listdir(log) if n.endswith(".json")
        )
        with open(os.path.join(log, f"{vers[-1] + 1:020d}.json"),
                  "w") as fh:
            fh.write(json.dumps({"protocol": {
                "minReaderVersion": 3,
                "readerFeatures": ["deletionVectors"],
            }}) + "\n")
        with pytest.raises(DeltaError, match="deletionVectors"):
            read_delta(spark, table_path)

    def test_log_gap_loud(self, spark, table_path):
        _seed(spark, table_path)
        log = os.path.join(table_path, "_delta_log")
        os.remove(os.path.join(log, f"{1:020d}.json"))
        with pytest.raises(DeltaError, match="gap"):
            read_delta(spark, table_path)

    def test_not_a_delta_table(self, spark, tmp_path):
        with pytest.raises(DeltaError, match="_delta_log"):
            read_delta(spark, str(tmp_path))

    def test_missing_version_loud(self, spark, table_path):
        _seed(spark, table_path)
        with pytest.raises(DeltaError, match="not in the log"):
            read_delta(spark, table_path, version=99)

    def test_snapshot_file_actions_well_formed(self, spark, table_path):
        _seed(spark, table_path)
        _meta, adds = delta_snapshot_files(spark, table_path)
        for a in adds:
            assert a["size"] > 0
            assert set(a["partitionValues"]) == {"p"}
            if "stats" in a:  # exact only for one-file partitions
                assert json.loads(a["stats"])["numRecords"] >= 1
