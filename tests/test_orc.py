"""ORC source/sink (sources/orc.py) + Iceberg ORC data files.

The stdlib tail parser is validated EMPIRICALLY against pyarrow-written
files — every protobuf field number, the zigzag integer statistics, packed
subtypes and ORC-529 attribute pairs are checked against a writer this
repo does not control."""

from __future__ import annotations

import datetime
import glob
import io
import os
import random

import pyarrow as pa
import pytest
from pyarrow import orc as pa_orc
from pyspark.sql import functions as F

from rust_dataframe_spark.sources.orc import (
    OrcError,
    orc_column_stats,
    orc_field_ids,
    orc_tail,
    orc_tail_of_file,
    read_orc_dir,
    write_orc_dir,
)


def _sample_table() -> pa.Table:
    fields = [
        pa.field("a", pa.int64(), metadata={b"iceberg.id": b"1"}),
        pa.field("s", pa.string(), metadata={b"iceberg.id": b"2"}),
        pa.field("d", pa.float64(), metadata={b"iceberg.id": b"3"}),
        pa.field("b", pa.bool_(), metadata={b"iceberg.id": b"4"}),
        pa.field("dt", pa.date32(), metadata={b"iceberg.id": b"5"}),
    ]
    return pa.table({
        "a": pa.array([-5, 2, 30], pa.int64()),
        "s": pa.array(["apple", "mango", None]),
        "d": pa.array([1.25, -2.5, 9.75]),
        "b": pa.array([True, False, True]),
        "dt": pa.array([datetime.date(2024, 3, 1),
                        datetime.date(2024, 3, 5), None]),
    }, schema=pa.schema(fields))


class TestOrcTail:
    @pytest.mark.parametrize("comp,expect", [
        ("ZLIB", "zlib"), ("SNAPPY", "snappy"), ("UNCOMPRESSED", "none"),
    ])
    def test_tail_parses_pyarrow_files(self, tmp_path, comp, expect):
        p = str(tmp_path / "t.orc")
        pa_orc.write_table(_sample_table(), p, compression=comp)
        data = open(p, "rb").read()
        tail = orc_tail(data)
        assert tail["compression"] == expect
        assert tail["num_rows"] == 3
        assert [t["kind"] for t in tail["types"]] == [
            "struct", "long", "string", "double", "boolean", "date"
        ]
        assert tail["types"][0]["field_names"] == [
            "a", "s", "d", "b", "dt"
        ]
        assert sum(s["num_rows"] for s in tail["stripes"]) == 3

    def test_field_ids_and_stats(self, tmp_path):
        p = str(tmp_path / "t.orc")
        pa_orc.write_table(_sample_table(), p, compression="ZLIB")
        data = open(p, "rb").read()
        assert orc_field_ids(data) == {
            "a": 1, "s": 2, "d": 3, "b": 4, "dt": 5
        }
        st = orc_column_stats(data)
        # zigzag sint64 int stats
        assert (st["a"]["min"], st["a"]["max"], st["a"]["sum"]) == (
            -5, 30, 27
        )
        # string min/max, null column counted
        assert (st["s"]["min"], st["s"]["max"]) == ("apple", "mango")
        assert st["s"]["has_null"] is True
        # double stats (wire-1 fixed64)
        assert (st["d"]["min"], st["d"]["max"]) == (-2.5, 9.75)
        # date stats as epoch days
        assert st["dt"]["min_days"] == (
            datetime.date(2024, 3, 1) - datetime.date(1970, 1, 1)
        ).days

    def test_no_ids_returns_none_half_stamped_loud(self, tmp_path):
        plain = pa.table({"a": [1, 2], "b": ["x", "y"]})
        p = str(tmp_path / "p.orc")
        pa_orc.write_table(plain, p)
        assert orc_field_ids(open(p, "rb").read()) is None

        half = pa.table(
            {"a": pa.array([1, 2], pa.int64()), "b": pa.array(["x", "y"])},
            schema=pa.schema([
                pa.field("a", pa.int64(),
                         metadata={b"iceberg.id": b"1"}),
                pa.field("b", pa.string()),
            ]),
        )
        p2 = str(tmp_path / "h.orc")
        pa_orc.write_table(half, p2)
        with pytest.raises(OrcError, match="half-stamped"):
            orc_field_ids(open(p2, "rb").read())

    def test_refusals(self, tmp_path):
        with pytest.raises(OrcError, match="magic"):
            orc_tail(b"NOTORC" + b"\x00" * 40)
        p = str(tmp_path / "t.orc")
        pa_orc.write_table(_sample_table(), p, compression="LZ4")
        with pytest.raises(OrcError, match="lz4"):
            orc_tail(open(p, "rb").read())

    def test_tail_of_file_bounded_window(self, tmp_path):
        p = str(tmp_path / "big.orc")
        tbl = pa.table({"a": pa.array(range(50000), pa.int64())})
        pa_orc.write_table(tbl, p, compression="ZLIB")
        # tiny window forces the grow-and-retry path
        tail = orc_tail_of_file(p, window=64)
        assert tail["num_rows"] == 50000

    def test_tail_fuzz_parse_or_typed_error(self, tmp_path):
        p = str(tmp_path / "t.orc")
        pa_orc.write_table(_sample_table(), p, compression="ZLIB")
        import zlib as _zlib

        from rust_dataframe_spark.operators.snappy import SnappyError

        data = bytearray(open(p, "rb").read())
        rng = random.Random(1234)
        allowed = (OrcError, _zlib.error, UnicodeDecodeError, SnappyError)
        for _ in range(300):
            mut = bytearray(data)
            i = rng.randrange(max(0, len(mut) - 200), len(mut))
            mut[i] ^= 1 << rng.randrange(8)
            try:
                tail = orc_tail(bytes(mut))
                # parses fine (flip hit slack/ignored bytes): structural
                # invariants still hold
                assert isinstance(tail["num_rows"], int)
            except allowed:
                pass  # the documented typed failure surface


class TestOrcSparkRoundTrip:
    def test_round_trip_all_types(self, spark, tmp_path):
        df = spark.range(20).select(
            F.col("id").cast("long").alias("id"),
            F.concat(F.lit("doc-"), F.col("id")).alias("name"),
            (F.col("id") * 1.5).alias("score"),
            (F.col("id") % 2 == 0).alias("flag"),
            F.when(F.col("id") % 5 == 0, None)
            .otherwise(F.col("id") * 2).cast("long").alias("nullable"),
            F.date_add(
                F.lit("2024-01-01").cast("date"), F.col("id").cast("int")
            ).alias("d"),
        ).repartition(3)
        path = str(tmp_path / "orc")
        n = write_orc_dir(df, path, compression="zlib")
        assert n == 3
        back = read_orc_dir(spark, path)
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, df.collect())
        )

    def test_nan_null_distinct(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, float("nan")), (2, None), (3, 1.5)], "id int, x double"
        )
        path = str(tmp_path / "orc")
        write_orc_dir(df.coalesce(1), path)
        got = {r.id: r.x for r in read_orc_dir(spark, path).collect()}
        assert got[2] is None
        assert got[3] == 1.5
        assert got[1] != got[1]  # NaN stays NaN, not null

    def test_field_ids_stamped(self, spark, tmp_path):
        df = spark.range(5).select(
            F.col("id").cast("long").alias("id"),
            F.lit("x").alias("s"),
        )
        path = str(tmp_path / "orc")
        write_orc_dir(
            df.coalesce(1), path, field_ids={"id": 7, "s": 9}
        )
        f = sorted(glob.glob(path + "/*.orc"))[0]
        assert orc_field_ids(open(f, "rb").read()) == {"id": 7, "s": 9}

    def test_write_refusals(self, spark, tmp_path):
        df = spark.range(3).select(F.col("id").alias("id"))
        with pytest.raises(OrcError, match="compression"):
            write_orc_dir(df, str(tmp_path / "x"), compression="lzo")
        with pytest.raises(Exception, match="field id"):
            write_orc_dir(
                df, str(tmp_path / "y"), field_ids={"other": 1}
            )

    def test_read_refusals(self, spark, tmp_path):
        with pytest.raises(OrcError, match="no .orc files"):
            read_orc_dir(spark, str(tmp_path / "empty"))
        # schema drift across the directory fails loudly at read
        p = str(tmp_path / "drift")
        os.makedirs(p)
        pa_orc.write_table(
            pa.table({"a": pa.array([1], pa.int64())}),
            os.path.join(p, "part-00000.orc"),
        )
        pa_orc.write_table(
            pa.table({"zz": pa.array(["x"])}),
            os.path.join(p, "part-00001.orc"),
        )
        with pytest.raises(Exception, match="drift"):
            read_orc_dir(spark, p).collect()


class TestIcebergOrcFiles:
    def _mixed_table(self, spark, path):
        from rust_dataframe_spark.sources.iceberg import (
            evolve_iceberg_schema,
            write_iceberg_commit,
        )

        write_iceberg_commit(
            spark, path,
            spark.range(10).select(
                F.col("id").cast("int").alias("id"),
                (F.col("id") * 2).cast("int").alias("val"),
            ).coalesce(1),
        )
        evolve_iceberg_schema(
            path, renames={"val": "score"}, adds=[("bonus", "int")]
        )
        write_iceberg_commit(
            spark, path,
            spark.range(100, 106).select(
                F.col("id").cast("int").alias("id"),
                (F.col("id") * 3).cast("int").alias("score"),
                (F.col("id") % 5).cast("int").alias("bonus"),
            ).coalesce(2),
            file_format="orc",
        )

    def test_mixed_formats_resolve_by_id(self, spark, tmp_path):
        from rust_dataframe_spark.sources.iceberg import read_iceberg

        path = str(tmp_path / "ice")
        self._mixed_table(spark, path)
        rows = sorted(
            (r.id, r.score, r.bonus)
            for r in read_iceberg(spark, path).collect()
        )
        assert len(rows) == 16
        # parquet leg: renamed column resolves, added column null
        assert rows[0] == (0, 0, None)
        # orc leg: direct values
        assert rows[-1] == (105, 315, 0)

    def test_orc_bounds_prune_plan(self, spark, tmp_path):
        from rust_dataframe_spark.sources.iceberg import (
            iceberg_plan_files,
            read_iceberg,
        )

        path = str(tmp_path / "ice")
        self._mixed_table(spark, path)
        kept, total = iceberg_plan_files(path, where="id >= 103")
        assert (kept, total) == (1, 3)  # ORC footer stats prune too
        got = sorted(
            r.id for r in read_iceberg(
                spark, path, where="id >= 103"
            ).collect()
        )
        assert got == [103, 104, 105]

    def test_position_deletes_on_orc_leg(self, spark, tmp_path):
        from rust_dataframe_spark.sources.iceberg import (
            read_iceberg,
            write_iceberg_position_deletes,
        )

        path = str(tmp_path / "ice")
        self._mixed_table(spark, path)
        f0 = sorted(glob.glob(path + "/data/*.orc"))[0]
        doomed_id = pa_orc.ORCFile(f0).read().column("id")[0].as_py()
        write_iceberg_position_deletes(spark, path, [(f0, 0)])
        got = {r.id for r in read_iceberg(spark, path).collect()}
        assert doomed_id not in got
        assert len(got) == 15

    def test_partitioned_orc_write_refuses(self, spark, tmp_path):
        from rust_dataframe_spark.sources.iceberg import (
            IcebergError,
            write_iceberg_commit,
        )

        with pytest.raises(IcebergError, match="unpartitioned"):
            write_iceberg_commit(
                spark, str(tmp_path / "x"),
                spark.range(4).select(
                    F.col("id").cast("int").alias("id"),
                    (F.col("id") % 2).cast("int").alias("p"),
                ),
                partition_by=["p"], file_format="orc",
            )

    def test_unstamped_orc_write_refuses(self, spark, tmp_path):
        from rust_dataframe_spark.sources.iceberg import (
            IcebergError,
            write_iceberg_commit,
        )

        with pytest.raises(IcebergError):
            write_iceberg_commit(
                spark, str(tmp_path / "x"),
                spark.range(4).select(F.col("id").cast("int").alias("id")),
                file_format="orc", stamp_field_ids=False,
            )
