"""Streaming lakehouse sources (streaming/lakehouse.py) — the trio as true
Structured Streaming inputs via the Spark 4 Python DataSource stream API.

Pinned per source: availableNow parity with the batch counterpart, restart
from Spark's checkpoint delivering EXACTLY the versions that arrived in
between (no replay, no loss), and the loud refusals (schema change inside a
streamed range, non-append snapshots, MOR tables, missing CDF flag)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from rust_dataframe_spark.streaming.lakehouse import (
    LakehouseStreamError,
    _delta_cdf_tasks,
    register_lakehouse_streams,
)


def _run_available_now(spark, fmt, path, sink, ckpt):
    q = (
        spark.readStream.format(fmt).option("path", path).load()
        .writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    assert q.awaitTermination(300), "stream did not finish in 300s"
    return spark.read.parquet(sink)


def _rows(df, cols):
    return sorted(map(tuple, df.select(*cols).collect()))


@pytest.fixture(scope="module")
def streams(spark):
    register_lakehouse_streams(spark)
    return spark


# ---------------------------------------------------------------------------
# Delta CDF stream
# ---------------------------------------------------------------------------


def _delta_fixture(spark, path):
    from rust_dataframe_spark.sources.delta import (
        delete_delta_rows_cdf,
        update_delta_rows_cdf,
        write_delta_commit,
    )

    df0 = spark.range(12).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") * 10).cast("long").alias("v"),
    )
    write_delta_commit(spark, path, df0, enable_cdf=True)  # v0 inserts
    write_delta_commit(  # v1 inserts
        spark, path, df0.filter("id < 3").withColumn(
            "id", F.col("id") + 100
        )
    )
    update_delta_rows_cdf(spark, path, "id = 5", {"v": "v + 1"})  # v2 cdc
    delete_delta_rows_cdf(spark, path, "id = 7")  # v3 cdc


def test_delta_cdf_stream_parity_and_restart(streams, tmp_path):
    from rust_dataframe_spark.sources.delta import (
        compact_delta_files,
        read_delta_changes,
        write_delta_commit,
    )

    spark = streams
    path = str(tmp_path / "tbl")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    _delta_fixture(spark, path)

    got = _run_available_now(spark, "delta_cdf_stream", path, sink, ckpt)
    want = read_delta_changes(spark, path, starting_version=0)
    cols = want.columns
    assert set(cols) <= set(got.columns)
    r1 = _rows(got, cols)
    assert r1 == _rows(want, cols)
    assert len(r1) == 12 + 3 + 2 + 1  # inserts + pre/post images + delete

    # restart: a new insert commit and a dataChange=false OPTIMIZE — the
    # second run appends exactly the insert rows; the compaction is silent
    write_delta_commit(
        spark, path,
        spark.range(2).select(
            (F.col("id") + 200).cast("int").alias("id"),
            F.lit(0).cast("long").alias("v"),
        ),
    )
    v_compact = compact_delta_files(spark, path)
    got2 = _run_available_now(spark, "delta_cdf_stream", path, sink, ckpt)
    r2 = _rows(got2, cols)
    assert r2 == _rows(
        read_delta_changes(spark, path, starting_version=0), cols
    )
    assert len(r2) == len(r1) + 2
    vcol = cols.index("_commit_version")
    assert all(t[vcol] != v_compact for t in r2)


def test_delta_cdf_stream_partitioned_inserts(streams, tmp_path):
    from rust_dataframe_spark.sources.delta import (
        read_delta_changes,
        write_delta_commit,
    )

    spark = streams
    path = str(tmp_path / "ptbl")
    df0 = spark.range(9).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") % 3).cast("int").alias("p"),
    )
    write_delta_commit(
        spark, path, df0, partition_by=["p"], enable_cdf=True
    )
    got = _run_available_now(
        spark, "delta_cdf_stream", path,
        str(tmp_path / "psink"), str(tmp_path / "pckpt"),
    )
    want = read_delta_changes(spark, path, starting_version=0)
    assert _rows(got, want.columns) == _rows(want, want.columns)
    # the partition column really is injected, not null
    assert got.where(F.col("p").isNull()).count() == 0


def test_delta_cdf_stream_refusals(streams, tmp_path):
    from rust_dataframe_spark.sources.delta import write_delta_commit

    spark = streams
    plain = str(tmp_path / "plain")
    write_delta_commit(
        spark, plain,
        spark.range(3).select(F.col("id").cast("int").alias("id")),
    )
    with pytest.raises(Exception, match="enableChangeDataFeed"):
        spark.readStream.format("delta_cdf_stream").option(
            "path", plain
        ).load()

    mapped = str(tmp_path / "mapped")
    write_delta_commit(
        spark, mapped,
        spark.range(3).select(F.col("id").cast("int").alias("id")),
        column_mapping="name", enable_cdf=True,
    )
    with pytest.raises(Exception, match="column-mapped"):
        spark.readStream.format("delta_cdf_stream").option(
            "path", mapped
        ).load()


def test_delta_cdf_tasks_schema_change_mid_range(spark, tmp_path):
    import json as _json

    from rust_dataframe_spark.sources.delta import write_delta_commit

    path = str(tmp_path / "evolve")
    write_delta_commit(
        spark, path,
        spark.range(3).select(F.col("id").cast("int").alias("id")),
        enable_cdf=True,
    )
    # hand-write a metadata-only commit widening the schema at v1 (the
    # repo's writer fixes the schema at commit 0; evolution helpers are
    # mapping-only and CDF refuses mapped tables — but a foreign writer
    # can do this, so the guard must hold)
    with open(
        os.path.join(path, "_delta_log", "00000000000000000000.json"),
        encoding="utf-8",
    ) as fh:
        actions = [
            _json.loads(ln) for ln in fh if ln.strip()
        ]
    meta = next(a["metaData"] for a in actions if "metaData" in a)
    sch = _json.loads(meta["schemaString"])
    sch["fields"].append(
        {"name": "extra", "type": "integer", "nullable": True,
         "metadata": {}}
    )
    meta2 = dict(meta, schemaString=_json.dumps(sch))
    with open(
        os.path.join(path, "_delta_log", "00000000000000000001.json"),
        "w", encoding="utf-8",
    ) as fh:
        fh.write(_json.dumps({"metaData": meta2}) + "\n")
    write_delta_commit(  # v2: data under the widened schema
        spark, path,
        spark.range(2).select(
            (F.col("id") + 10).cast("int").alias("id"),
            F.lit(7).cast("int").alias("extra"),
        ),
    )
    # any range CONTAINING the change refuses (the declared schema was
    # fixed when the stream loaded; batches must not straddle it) ...
    with pytest.raises(LakehouseStreamError, match="schemaString changed"):
        _delta_cdf_tasks(path, -1, 2)
    with pytest.raises(LakehouseStreamError, match="schemaString changed"):
        _delta_cdf_tasks(path, 0, 2)
    # ... while a range starting at/after the change plans fine
    tasks = _delta_cdf_tasks(path, 1, 2)
    assert tasks and {t.version for t in tasks} == {2}


# ---------------------------------------------------------------------------
# Iceberg append stream
# ---------------------------------------------------------------------------


def test_iceberg_append_stream_parity_evolution_restart(streams, tmp_path):
    from rust_dataframe_spark.sources.iceberg import (
        evolve_iceberg_schema,
        read_iceberg,
        write_iceberg_commit,
    )

    spark = streams
    path = str(tmp_path / "ice")
    sink = str(tmp_path / "isink")
    ckpt = str(tmp_path / "ickpt")
    write_iceberg_commit(
        spark, path,
        spark.range(10).select(
            F.col("id").cast("long").alias("id"),
            (F.col("id") % 2).cast("int").alias("p"),
            (F.col("id") * 2).cast("long").alias("val"),
        ),
        partition_by=["p"],
    )
    evolve_iceberg_schema(path, renames={"val": "score"})
    write_iceberg_commit(
        spark, path,
        spark.range(5).select(
            (F.col("id") + 100).cast("long").alias("id"),
            (F.col("id") % 2).cast("int").alias("p"),
            (F.col("id") * 3).cast("long").alias("score"),
        ),
        partition_by=["p"],
    )
    got = _run_available_now(spark, "iceberg_append_stream", path, sink, ckpt)
    want = read_iceberg(spark, path)  # stream-from-origin == current table
    cols = want.columns
    assert _rows(got, cols) == _rows(want, cols)
    # identity partition column injected per file, never null
    assert got.where(F.col("p").isNull()).count() == 0
    # snapshot provenance: one id per commit
    assert got.select("_snapshot_id").distinct().count() == 2

    write_iceberg_commit(
        spark, path,
        spark.range(3).select(
            (F.col("id") + 500).cast("long").alias("id"),
            F.lit(0).cast("int").alias("p"),
            F.lit(7).cast("long").alias("score"),
        ),
        partition_by=["p"],
    )
    got2 = _run_available_now(
        spark, "iceberg_append_stream", path, sink, ckpt
    )
    assert _rows(got2, cols) == _rows(read_iceberg(spark, path), cols)
    assert got2.count() == got.count() + 3


def test_iceberg_append_stream_refuses_delete_snapshot(streams, tmp_path):
    from rust_dataframe_spark.sources.iceberg import (
        write_iceberg_commit,
        write_iceberg_position_deletes,
    )

    spark = streams
    path = str(tmp_path / "icedel")
    write_iceberg_commit(
        spark, path,
        spark.range(6).select(F.col("id").cast("long").alias("id")),
    )
    doomed = [
        (r.f, r.pos)
        for r in spark.read.parquet(f"{path}/data").select(
            F.regexp_replace(F.input_file_name(), "^file:/+", "/")
            .alias("f"),
            F.col("_metadata.row_index").alias("pos"),
        ).where(F.col("id") == 1).collect()
    ]
    write_iceberg_position_deletes(spark, path, doomed)
    q = (
        spark.readStream.format("iceberg_append_stream")
        .option("path", path).load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "s"))
        .option("checkpointLocation", str(tmp_path / "c"))
        .trigger(availableNow=True).start()
    )
    with pytest.raises(Exception, match="append|DELETE"):
        q.awaitTermination(300)
        if q.exception():
            raise q.exception()


# ---------------------------------------------------------------------------
# Hudi incremental stream
# ---------------------------------------------------------------------------


def test_hudi_incr_stream_parity_upsert_restart(streams, tmp_path):
    from rust_dataframe_spark.sources.hudi import (
        hudi_snapshot_files,
        read_hudi_incremental,
        write_hudi_commit,
    )

    spark = streams
    path = str(tmp_path / "hudi")
    sink = str(tmp_path / "hsink")
    ckpt = str(tmp_path / "hckpt")
    write_hudi_commit(
        spark, path,
        spark.range(8).select(
            F.col("id").cast("long").alias("id"),
            (F.col("id") % 2).cast("int").alias("p"),
            (F.col("id") * 10).cast("long").alias("v"),
        ).repartition(F.col("p")),
        partition_by=["p"], meta_fields=True,
    )
    fid = next(
        os.path.basename(f).split("_")[0]
        for part, f in hudi_snapshot_files(path) if part == "p=1"
    )
    write_hudi_commit(  # upsert REWRITES the p=1 file group
        spark, path,
        spark.range(3).select(
            (F.col("id") * 2 + 1).cast("long").alias("id"),
            F.lit(1).cast("int").alias("p"),
            (F.col("id") * 100).cast("long").alias("v"),
        ),
        partition_by=["p"], upsert_into={"p=1": fid}, meta_fields=True,
    )
    got = _run_available_now(spark, "hudi_incr_stream", path, sink, ckpt)
    want = read_hudi_incremental(spark, path, begin_ts=0)
    cols = want.columns
    assert "_hoodie_commit_time" in cols
    assert _rows(got, cols) == _rows(want, cols)

    write_hudi_commit(
        spark, path,
        spark.range(2).select(
            (F.col("id") + 50).cast("long").alias("id"),
            F.lit(0).cast("int").alias("p"),
            F.lit(5).cast("long").alias("v"),
        ),
        partition_by=["p"], meta_fields=True,
    )
    got2 = _run_available_now(spark, "hudi_incr_stream", path, sink, ckpt)
    assert _rows(got2, cols) == _rows(
        read_hudi_incremental(spark, path, begin_ts=0), cols
    )
    assert got2.count() == got.count() + 2


def test_hudi_incr_stream_refuses_mor_and_no_meta(streams, tmp_path):
    from rust_dataframe_spark.sources.hudi import write_hudi_commit

    spark = streams
    mor = str(tmp_path / "mor")
    write_hudi_commit(
        spark, mor,
        spark.range(3).select(F.col("id").cast("long").alias("id")),
        table_type="MERGE_ON_READ", record_key="id", meta_fields=True,
    )
    with pytest.raises(Exception, match="COPY_ON_WRITE"):
        spark.readStream.format("hudi_incr_stream").option(
            "path", mor
        ).load()

    plain = str(tmp_path / "plain")
    write_hudi_commit(
        spark, plain,
        spark.range(3).select(F.col("id").cast("long").alias("id")),
    )
    with pytest.raises(Exception, match="meta"):
        spark.readStream.format("hudi_incr_stream").option(
            "path", plain
        ).load()


# ---------------------------------------------------------------------------
# Delta exactly-once streaming sink (txn identifiers)
# ---------------------------------------------------------------------------


def test_delta_stream_sink_exactly_once(spark, tmp_path):
    from rust_dataframe_spark.sources.delta import (
        _commit_actions,
        _list_log,
        read_delta,
        write_delta_commit,
    )
    from rust_dataframe_spark.streaming.lakehouse import (
        delta_last_txn_version,
        delta_stream_sink,
    )

    src = str(tmp_path / "src")
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    spark.range(10).select(
        F.col("id").cast("long").alias("id"),
        (F.col("id") * 2).cast("long").alias("v"),
    ).write.parquet(src)

    stream = spark.readStream.schema("id bigint, v bigint").parquet(src)
    q = delta_stream_sink(stream, tbl, app_id="app1", checkpoint=ckpt)
    assert q.awaitTermination(300)
    assert read_delta(spark, tbl).count() == 10
    assert delta_last_txn_version(tbl, "app1") == 0
    assert delta_last_txn_version(tbl, "other") is None

    # new input file; restart from the same checkpoint appends exactly it
    spark.range(100, 103).select(
        F.col("id").cast("long").alias("id"),
        F.lit(9).cast("long").alias("v"),
    ).write.mode("append").parquet(src)
    stream = spark.readStream.schema("id bigint, v bigint").parquet(src)
    q = delta_stream_sink(stream, tbl, app_id="app1", checkpoint=ckpt)
    assert q.awaitTermination(300)
    assert read_delta(spark, tbl).count() == 13
    last = delta_last_txn_version(tbl, "app1")
    assert last == 1

    # simulated RETRY of the last batch (crash between sink commit and WAL
    # advance): same batch id re-commits -> skipped, census unchanged
    commits, _cp = _list_log(tbl)
    n_commits = len(commits)
    retry_df = spark.range(100, 103).select(
        F.col("id").cast("long").alias("id"),
        F.lit(9).cast("long").alias("v"),
    )

    def replay(batch_df, batch_id):
        lastv = delta_last_txn_version(tbl, "app1")
        if lastv is not None and batch_id <= lastv:
            return
        write_delta_commit(
            batch_df.sparkSession, tbl, batch_df,
            txn=("app1", batch_id),
        )

    replay(retry_df, last)  # the duplicate delivery
    assert read_delta(spark, tbl).count() == 13
    commits2, _cp = _list_log(tbl)
    assert len(commits2) == n_commits  # no new commit written
    replay(retry_df, last + 1)  # a genuinely new batch id commits
    assert read_delta(spark, tbl).count() == 16

    # txn actions are really in the log
    acts = [
        a["txn"] for v in commits2 for a in _commit_actions(tbl, v)
        if "txn" in a
    ]
    assert {(t["appId"], t["version"]) for t in acts} >= {
        ("app1", 0), ("app1", 1)
    }


# ---------------------------------------------------------------------------
# Hudi cleaner (maintenance triad's third leg)
# ---------------------------------------------------------------------------


def _hudi_three_versions(spark, path):
    """One file group (partition p=0), three base versions: v=10*id,
    then 100*id, then 1000*id (full-group rewrites via upsert_into)."""
    from rust_dataframe_spark.sources.hudi import (
        hudi_snapshot_files,
        write_hudi_commit,
    )

    def mk(mult):
        return spark.range(4).select(
            F.col("id").cast("long").alias("id"),
            F.lit(0).cast("int").alias("p"),
            (F.col("id") * mult).cast("long").alias("v"),
        ).coalesce(1)

    t1 = write_hudi_commit(
        spark, path, mk(10), partition_by=["p"], meta_fields=True
    )
    fid = next(
        os.path.basename(f).split("_")[0]
        for part, f in hudi_snapshot_files(path) if part == "p=0"
    )
    t2 = write_hudi_commit(
        spark, path, mk(100),
        partition_by=["p"], upsert_into={"p=0": fid}, meta_fields=True,
    )
    t3 = write_hudi_commit(
        spark, path, mk(1000),
        partition_by=["p"], upsert_into={"p=0": fid}, meta_fields=True,
    )
    return t1, t2, t3


def test_clean_hudi_deletes_below_horizon(spark, tmp_path):
    from rust_dataframe_spark.sources.hudi import (
        HudiError,
        clean_hudi,
        read_hudi,
    )

    path = str(tmp_path / "hudi")
    t1, t2, t3 = _hudi_three_versions(spark, path)

    n = clean_hudi(path, keep_last=2)  # horizon = t2
    assert n == 1  # only the t1 version dies
    # latest and horizon reads unchanged
    assert sorted(
        r.v for r in read_hudi(spark, path).collect()
    ) == [0, 1000, 2000, 3000]
    assert sorted(
        r.v for r in read_hudi(spark, path, as_of=t2).collect()
    ) == [0, 100, 200, 300]
    # below-horizon time travel refuses loudly
    with pytest.raises(HudiError, match="clean horizon"):
        read_hudi(spark, path, as_of=t1).collect()


def test_clean_hudi_untouched_group_survives(spark, tmp_path):
    from rust_dataframe_spark.sources.hudi import (
        clean_hudi,
        read_hudi,
        write_hudi_commit,
    )

    path = str(tmp_path / "hudi2")
    # group A written at t1 and never touched again; t2/t3 insert new
    # groups — cleaning keep_last=1 must KEEP A's only version (it IS
    # the state at the horizon)
    write_hudi_commit(
        spark, path,
        spark.range(3).select(
            F.col("id").cast("long").alias("id"),
            F.lit(1).cast("long").alias("v"),
        ).coalesce(1),
        meta_fields=True,
    )
    write_hudi_commit(
        spark, path,
        spark.range(10, 12).select(
            F.col("id").cast("long").alias("id"),
            F.lit(2).cast("long").alias("v"),
        ).coalesce(1),
        meta_fields=True,
    )
    n = clean_hudi(path, keep_last=1)
    assert n == 0
    assert read_hudi(spark, path).count() == 5


def test_clean_hudi_refusals(spark, tmp_path):
    from rust_dataframe_spark.sources.hudi import (
        HudiError,
        clean_hudi,
        write_hudi_commit,
    )

    path = str(tmp_path / "mor")
    write_hudi_commit(
        spark, path,
        spark.range(3).select(
            F.col("id").cast("long").alias("id")
        ).coalesce(1),
        table_type="MERGE_ON_READ", record_key="id", meta_fields=True,
    )
    from rust_dataframe_spark.sources.hudi import write_hudi_log_commit

    write_hudi_log_commit(
        spark, path,
        spark.createDataFrame([(99,)], "id bigint"),
    )
    with pytest.raises(HudiError, match="merge-on-read"):
        clean_hudi(path)
    with pytest.raises(HudiError, match="keep_last"):
        clean_hudi(str(tmp_path / "x"), keep_last=0)
