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


class TestHudiMor:
    """Round-10 merge-on-read: HoodieLogFormat block codec + log
    replay (upsert / delete / rollback / as-of)."""

    def _seed_mor(self, spark, path):
        from pyspark.sql import functions as F

        from rust_dataframe_spark.sources.hudi import (
            write_hudi_commit,
            write_hudi_log_commit,
        )

        base = spark.range(30).select(
            F.col("id").cast("int").alias("id"),
            (F.col("id") * 10).cast("int").alias("v"),
            (F.col("id") % 3).cast("int").alias("p"),
        ).repartition(F.col("p"))
        t0 = write_hudi_commit(
            spark, path, base, partition_by=["p"],
            table_type="MERGE_ON_READ", record_key="id",
        )
        ups = spark.createDataFrame(
            [(3, 333, 0), (4, 444, 1)], "id int, v int, p int"
        )
        t1 = write_hudi_log_commit(
            spark, path, ups, deletes=[("p=2", "5")]
        )
        return t0, t1

    def test_upsert_delete_replay(self, spark, table_path):
        self._seed_mor(spark, table_path)
        got = {r["id"]: r["v"]
               for r in read_hudi(spark, table_path).collect()}
        assert len(got) == 29
        assert got[3] == 333 and got[4] == 444 and 5 not in got
        assert got[6] == 60  # untouched rows keep base values

    def test_as_of_before_logs(self, spark, table_path):
        t0, _t1 = self._seed_mor(spark, table_path)
        pre = {r["id"]: r["v"]
               for r in read_hudi(spark, table_path, as_of=t0).collect()}
        assert len(pre) == 30 and pre[3] == 30 and 5 in pre

    def test_newest_wins_and_rollback(self, spark, table_path):
        from rust_dataframe_spark.sources.hudi import (
            write_hudi_log_commit,
            write_hudi_rollback_block,
        )

        self._seed_mor(spark, table_path)
        t2 = write_hudi_log_commit(
            spark, table_path,
            spark.createDataFrame([(3, 999, 0)], "id int, v int, p int"),
        )
        got = {r["id"]: r["v"]
               for r in read_hudi(spark, table_path).collect()}
        assert got[3] == 999
        write_hudi_rollback_block(spark, table_path, t2)
        got2 = {r["id"]: r["v"]
                for r in read_hudi(spark, table_path).collect()}
        assert got2[3] == 333  # rolled back to the t1 upsert

    def test_uncommitted_log_instant_ignored(self, spark, table_path):
        import os as _os

        self._seed_mor(spark, table_path)
        # forge a log commit then delete its deltacommit: blocks with
        # that instant must not apply (completed-timeline admission)
        from rust_dataframe_spark.sources.hudi import (
            write_hudi_log_commit,
        )

        t2 = write_hudi_log_commit(
            spark, table_path,
            spark.createDataFrame([(6, 666, 0)], "id int, v int, p int"),
        )
        _os.remove(_os.path.join(table_path, ".hoodie",
                                 f"{t2}.deltacommit"))
        got = {r["id"]: r["v"]
               for r in read_hudi(spark, table_path).collect()}
        assert got[6] == 60

    def test_log_block_codec_round_trip(self):
        from rust_dataframe_spark.sources.hudi import (
            encode_log_block,
            iter_log_blocks,
        )

        blob = (
            encode_log_block(3, {0: "123", 2: "{}"}, b"payload")
            + encode_log_block(1, {0: "124"}, b"del")
        )
        blocks = list(iter_log_blocks(blob))
        assert [(t, h[0], c) for t, h, c in blocks] == [
            (3, "123", b"payload"), (1, "124", b"del"),
        ]

    def test_log_block_corruption_loud(self):
        from rust_dataframe_spark.sources.hudi import (
            encode_log_block,
            iter_log_blocks,
        )

        blob = bytearray(encode_log_block(3, {0: "1"}, b"x" * 40))
        blob[3] ^= 0xFF  # magic
        with pytest.raises(HudiError, match="magic"):
            list(iter_log_blocks(bytes(blob)))
        blob2 = bytearray(encode_log_block(3, {0: "1"}, b"x" * 40))
        blob2[-1] ^= 0x01  # trailing total-size
        with pytest.raises(HudiError, match="total-size"):
            list(iter_log_blocks(bytes(blob2)))
        with pytest.raises(HudiError):
            list(iter_log_blocks(
                encode_log_block(3, {0: "1"}, b"x" * 40)[:-20]
            ))

    def test_cow_table_rejects_log_commit(self, spark, table_path):
        from rust_dataframe_spark.sources.hudi import (
            write_hudi_log_commit,
        )

        _seed(spark, table_path)  # COW
        with pytest.raises(HudiError, match="MERGE_ON_READ"):
            write_hudi_log_commit(
                spark, table_path,
                spark.createDataFrame([(1, 1, 0)],
                                      "id int, v int, p int"),
            )

    def test_max_files_budget(self, spark, table_path):
        _seed(spark, table_path)
        with pytest.raises(HudiError, match="max_files"):
            hudi_snapshot_files(table_path, max_files=1)

    def test_compaction_orphans_logs_and_preserves_history(
        self, spark, table_path
    ):
        from rust_dataframe_spark.sources.hudi import compact_hudi

        _t0, t1 = self._seed_mor(spark, table_path)
        before = {r["id"]: r["v"]
                  for r in read_hudi(spark, table_path).collect()}
        tc = compact_hudi(spark, table_path)
        after = {r["id"]: r["v"]
                 for r in read_hudi(spark, table_path).collect()}
        assert after == before  # compaction is read-invisible
        # as-of BEFORE compaction still merges the (old) logs
        asof = {r["id"]: r["v"]
                for r in read_hudi(spark, table_path,
                                   as_of=t1).collect()}
        assert asof == before
        # new log commits attach to the NEW base slices
        from rust_dataframe_spark.sources.hudi import (
            write_hudi_log_commit,
        )

        write_hudi_log_commit(
            spark, table_path,
            spark.createDataFrame([(6, 606, 0)],
                                  "id int, v int, p int"),
        )
        final = {r["id"]: r["v"]
                 for r in read_hudi(spark, table_path).collect()}
        assert final[6] == 606
        assert final[3] == 333  # pre-compaction upsert still visible
        del tc
