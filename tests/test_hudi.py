"""Hudi COW reader/writer tests (sources/hudi.py) behind q453:
timeline scan, file-slice resolution, upsert-as-new-file-version,
instant time travel, replacecommit drops, MOR gates."""

import json
import os
import re

import pytest

from rust_dataframe_spark.sources.hudi import (
    HudiError,
    hudi_snapshot_files,
    read_hudi,
    write_hudi_commit,
)


@pytest.fixture()
def table_path(tmp_path):
    return str(tmp_path / "hudi")


def _one_file_df(spark, rows_sql):
    from pyspark.sql import functions as F

    return spark.sql(rows_sql).repartition(F.col("p"))


def _seed(spark, path):
    from pyspark.sql import functions as F

    df0 = spark.range(30).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") % 3).cast("int").alias("p"),
    ).repartition(F.col("p"))
    t0 = write_hudi_commit(spark, path, df0, partition_by=["p"])
    df1 = spark.range(100, 109).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") % 3).cast("int").alias("p"),
    ).repartition(F.col("p"))
    t1 = write_hudi_commit(spark, path, df1, partition_by=["p"])
    return t0, t1


def _fid_of(path, part, instant):
    for p, f in hudi_snapshot_files(path):
        name = os.path.basename(f)
        if p == part and name.endswith(f"_{instant}.parquet"):
            return re.match(r"^([0-9a-f-]+)_", name).group(1)
    raise AssertionError("file group not found")


class TestHudi:
    def test_upsert_rewrites_one_file_group(self, spark, table_path):
        from pyspark.sql import functions as F

        t0, _t1 = _seed(spark, table_path)
        fid = _fid_of(table_path, "p=1", t0)
        write_hudi_commit(
            spark, table_path,
            spark.createDataFrame([(900 + i, 1) for i in range(4)],
                                  "id int, p int"),
            partition_by=["p"], upsert_into={"p=1": fid},
        )
        snap = read_hudi(spark, table_path)
        agg = {
            r["p"]: (r["n"], r["s"])
            for r in snap.groupBy("p").agg(
                F.count("*").alias("n"), F.sum("id").alias("s")
            ).collect()
        }
        # p=1: commit-1 group (309/3) + upserted group (3606/4)
        assert agg == {"0": (13, 450), "1": (7, 3915), "2": (13, 467)}

    def test_time_travel_as_of(self, spark, table_path):
        t0, t1 = _seed(spark, table_path)
        fid = _fid_of(table_path, "p=1", t0)
        write_hudi_commit(
            spark, table_path,
            spark.createDataFrame([(900, 1)], "id int, p int"),
            partition_by=["p"], upsert_into={"p=1": fid},
        )
        old = read_hudi(spark, table_path, as_of=t1)
        assert old.count() == 39
        assert old.filter("p = 1").count() == 13
        older = read_hudi(spark, table_path, as_of=t0)
        assert older.count() == 30

    def test_replacecommit_drops_file_groups(self, spark, table_path):
        t0, t1 = _seed(spark, table_path)
        fid = _fid_of(table_path, "p=2", t0)
        with open(os.path.join(table_path, ".hoodie",
                               f"{t1 + 1}.replacecommit"), "w") as fh:
            json.dump({"partitionToReplaceFileIds": {"p=2": [fid]}}, fh)
        snap = read_hudi(spark, table_path)
        assert snap.filter("p = 2").count() == 3  # only the commit-1 group

    def test_inflight_ignored(self, spark, table_path):
        _t0, t1 = _seed(spark, table_path)
        open(os.path.join(table_path, ".hoodie",
                          f"{t1 + 5}.commit.inflight"), "w").close()
        assert read_hudi(spark, table_path).count() == 39

    def test_mor_gate(self, spark, table_path):
        _seed(spark, table_path)
        open(os.path.join(table_path, ".hoodie",
                          "123.deltacommit"), "w").close()
        with pytest.raises(HudiError, match="merge-on-read"):
            read_hudi(spark, table_path)

    def test_bad_filename_gate(self, spark, table_path):
        _seed(spark, table_path)
        open(os.path.join(table_path, "p=1", "stray.parquet"),
             "w").close()
        with pytest.raises(HudiError, match="naming scheme"):
            read_hudi(spark, table_path)

    def test_not_a_table(self, spark, tmp_path):
        with pytest.raises(HudiError, match="hoodie"):
            read_hudi(spark, str(tmp_path))

    def test_uncommitted_file_below_cutoff_ignored(
        self, spark, table_path
    ):
        # a data file written by a FAILED commit whose ts sits between
        # two completed instants is not live (timeline membership, not
        # just ts <= cutoff)
        import shutil
        import uuid

        t0, t1 = _seed(spark, table_path)
        assert t0 < t1 - 1
        part_dir = os.path.join(table_path, "p=1")
        donor = next(
            n for n in os.listdir(part_dir) if n.endswith(".parquet")
        )
        orphan_ts = t1 - 1  # below cutoff, NOT a completed instant
        orphan = f"{uuid.uuid4()}_0-9-0_{orphan_ts}.parquet"
        shutil.copy(os.path.join(part_dir, donor),
                    os.path.join(part_dir, orphan))
        assert read_hudi(spark, table_path).count() == 39
        live = {os.path.basename(f) for _p, f in
                hudi_snapshot_files(table_path)}
        assert orphan not in live
