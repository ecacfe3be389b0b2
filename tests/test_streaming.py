"""Streaming tests: availableNow batch-parity — the streaming query over the
events files must equal the equivalent batch aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_dataframe_spark.streaming import ops as st


@pytest.fixture(scope="module")
def events(spark, tmp_path_factory):
    # write a small deterministic event set (timestamps in µs; the driver's
    # events.parquet is TIMESTAMP(NANOS) which streaming reads can't use)
    p = str(tmp_path_factory.mktemp("stream") / "events")
    rows = []
    for u in range(3):
        for i in range(20):
            rows.append((u, f"2024-01-01 {i // 4:02d}:{(i % 4) * 10:02d}:00", "click", float(i)))
    df = spark.createDataFrame(rows, "user_id int, ts_s string, event_type string, value double")
    df.select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value") \
        .write.mode("overwrite").parquet(p)
    return p


def test_tumbling_stream_equals_batch(spark, events):
    schema = spark.read.parquet(events).schema
    stream = st.read_stream_parquet(spark, events, schema)
    out = st.run_available_now(
        st.tumbling_counts(stream, window="1 hour", watermark="2 hours"), "t_tumble"
    )
    batch = (
        spark.read.parquet(events)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("value_sum"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n_events", "value_sum")
    )
    s = {(r["win_start"], r["event_type"]): (r["n_events"], r["value_sum"]) for r in out.collect()}
    b = {(r["win_start"], r["event_type"]): (r["n_events"], r["value_sum"]) for r in batch.collect()}
    assert s == b and len(s) == 5  # 20 events / 4-per-hour = 5 windows


def test_session_stream(spark, events):
    schema = spark.read.parquet(events).schema
    stream = st.read_stream_parquet(spark, events, schema)
    out = st.run_available_now(
        st.session_counts(stream, gap="15 minutes", watermark="2 hours"), "t_sess"
    )
    rows = out.collect()
    # 10-minute spacing < 15-minute gap except across the hour boundary
    # (30:00 -> next 00:00 = 30 min) -> 5 sessions per user
    per_user = {}
    for r in rows:
        per_user[r["user_id"]] = per_user.get(r["user_id"], 0) + 1
    assert per_user == {0: 5, 1: 5, 2: 5}
    assert all(r["n_events"] == 4 for r in rows)


def test_sliding_stream(spark, events):
    schema = spark.read.parquet(events).schema
    stream = st.read_stream_parquet(spark, events, schema)
    out = st.run_available_now(
        st.sliding_counts(stream, window="1 hour", slide="30 minutes", watermark="2 hours"),
        "t_slide",
    )
    batch = (
        spark.read.parquet(events)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n_events")
    )
    s = {(r["win_start"], r["event_type"]): r["n_events"] for r in out.collect()}
    b = {(r["win_start"], r["event_type"]): r["n_events"] for r in batch.collect()}
    # exact batch parity: same hopping-window semantics as q136
    assert s == b
    assert len(s) > 5  # overlapping windows > tumbling window count


def _protobuf_available() -> bool:
    from rust_dataframe_spark.vendor import ensure_protobuf

    return ensure_protobuf()


def test_tws_running_counts(spark, tmp_path_factory):
    """transformWithStateInPandas (Spark 4 stateful API) — same semantics as
    the applyInPandasWithState test below; requires protobuf + RocksDB."""
    if not _protobuf_available():
        pytest.skip("google.protobuf not installed — TWS Python runner needs it")
    p = str(tmp_path_factory.mktemp("tws") / "ev")
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:01:00"), (2, "2024-01-01 00:02:00")],
        "user_id int, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    df.coalesce(1).write.mode("overwrite").parquet(p)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        schema = spark.read.parquet(p).schema
        stream = spark.readStream.schema(schema).parquet(p)
        out = st.run_available_now(
            st.stateful_running_counts_tws(stream, key_col="user_id"), "t_tws",
            output_mode="update",
        )
        totals = {r["user_id"]: r["n_events"] for r in out.collect()}
        assert totals == {1: 2, 2: 1}
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_stateful_counts_accumulate_across_batches(spark, tmp_path_factory):
    # two separate files + maxFilesPerTrigger=1 => two micro-batches; the
    # per-user totals must carry state across the batch boundary
    p = str(tmp_path_factory.mktemp("stateful") / "ev")
    f1 = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:01:00"), (2, "2024-01-01 00:02:00")],
        "user_id int, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    f2 = spark.createDataFrame(
        [(1, "2024-01-01 01:00:00"), (3, "2024-01-01 01:01:00")],
        "user_id int, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    f1.coalesce(1).write.mode("overwrite").parquet(p)
    f2.coalesce(1).write.mode("append").parquet(p)

    schema = spark.read.parquet(p).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(p)
    )
    out = st.run_available_now(
        st.stateful_running_counts(stream, key_col="user_id"), "t_stateful",
        output_mode="update",
    )
    # memory sink in update mode appends one row per key per batch; the max
    # per key is the final cumulative state
    rows = out.groupBy("user_id").agg(F.max("n_events").alias("n")).collect()
    totals = {r["user_id"]: r["n"] for r in rows}
    assert totals[1] == 3  # accumulated across both micro-batches
    assert totals.get(2) == 1 and totals.get(3) == 1


def test_stream_dedup_across_batches(spark, tmp_path_factory):
    # the duplicate (user 1, 00:00) reappears in the second micro-batch within
    # the watermark horizon — dropDuplicatesWithinWatermark must drop it
    p = str(tmp_path_factory.mktemp("sdedup") / "ev")
    f1 = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 00:01:00")],
        "user_id int, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    f2 = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (3, "2024-01-01 00:05:00")],
        "user_id int, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    f1.coalesce(1).write.mode("overwrite").parquet(p)
    f2.coalesce(1).write.mode("append").parquet(p)

    schema = spark.read.parquet(p).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(p)
    out = st.run_available_now(
        st.stream_dedup(stream, id_cols=("user_id", "ts")), "t_sdedup",
        output_mode="append",
    )
    rows = out.collect()
    assert len(rows) == 3  # 4 input rows, 1 cross-batch duplicate dropped
    assert sorted(r["user_id"] for r in rows) == [1, 2, 3]


def test_foreach_batch_parquet_idempotent_partitions(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("fbsink")
    src, out, ckpt = str(base / "src"), str(base / "out"), str(base / "ckpt")
    f1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    f2 = spark.createDataFrame([(3, "c")], "k int, v string")
    f1.coalesce(1).write.mode("overwrite").parquet(src)
    f2.coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = st.foreach_batch_parquet(stream, out, checkpoint=ckpt)
    q.awaitTermination(120)

    back = spark.read.parquet(out)
    assert back.count() == 3
    # one partition per micro-batch; re-writing a batch id overwrites in place
    assert back.select("_batch_id").distinct().count() == 2


def test_stream_near_dup_across_batches(spark, tmp_path_factory):
    # doc 2 (batch 2) is an exact copy of doc 1 (batch 1): identical MinHash
    # signatures -> same bucket in every band -> the (1,2) candidate must be
    # found even though the docs arrived in different micro-batches; doc 3 is
    # unrelated and must pair with nobody
    p = str(tmp_path_factory.mktemp("sndup") / "docs")
    text = "the quick brown fox jumps over the lazy dog again and again"
    other = "completely different content about spark shuffles and parquet files"
    f1 = spark.createDataFrame([(1, text)], "doc_id int, text string")
    f2 = spark.createDataFrame([(2, text), (3, other)], "doc_id int, text string")
    f1.coalesce(1).write.mode("overwrite").parquet(p)
    f2.coalesce(1).write.mode("append").parquet(p)

    schema = spark.read.parquet(p).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(p)
    out = st.run_available_now(
        st.stream_near_dup_candidates(stream), "t_sndup", output_mode="append"
    )
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert pairs == {(1, 2)}


def _state_rows_per_batch(stream_df, name):
    """Run availableNow and return numRowsTotal of the (single) state
    operator for each micro-batch, in trigger order."""
    import json as _json

    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError(f"{name} did not finish in 120s")
    rows = []
    for p in q.recentProgress:
        d = p if isinstance(p, dict) else _json.loads(p.json)
        ops = d.get("stateOperators") or []
        if ops and d.get("numInputRows", 0) > 0:
            rows.append(int(ops[0]["numRowsTotal"]))
    return rows


@pytest.mark.parametrize(
    "provider",
    [
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    ],
    ids=["hdfs-backed", "rocksdb"],
)
def test_stream_near_dup_state_rows_bounded(spark, tmp_path_factory, provider):
    """VERDICT r4 #9 — stream_near_dup_candidates claims state bounded by
    the distinct CONTENT seen (one row per occupied LSH bucket), not by
    stream length: feed 4 micro-batches of the same 3 texts under fresh ids
    and assert the state store's numRowsTotal goes flat after batch 1
    (<= bands x distinct-texts) while candidate pairs keep accumulating.
    Runs under both state-store providers (RocksDB is the 100 TB path)."""
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "completely different content about spark shuffles and parquet files",
        "a third corpus document with its own unique shingle stream here",
    ]
    p = str(tmp_path_factory.mktemp(f"sndup_state_{provider[-20:]}") / "docs")
    for b in range(4):
        spark.createDataFrame(
            [(100 * b + i, t) for i, t in enumerate(texts)], "doc_id int, text string"
        ).coalesce(1).write.mode("overwrite" if b == 0 else "append").parquet(p)

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    )
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    try:
        schema = spark.read.parquet(p).schema
        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(p)
        name = f"t_sndup_state_{'rocks' if 'RocksDB' in provider else 'hdfs'}"
        per_batch = _state_rows_per_batch(st.stream_near_dup_candidates(stream), name)
    finally:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    assert len(per_batch) == 4
    # one state row per occupied bucket; identical content -> identical
    # buckets -> FLAT after the first batch, bounded by bands * n_texts
    assert per_batch[0] == per_batch[-1] <= 4 * len(texts)
    assert all(n == per_batch[0] for n in per_batch)
    # and the candidates really did accumulate across all batches: each text
    # pairs every new id with every id seen before (3 texts x (1+2+3) pairs)
    got = spark.table(name).select("id_a", "id_b").distinct().count()
    assert got == 3 * 6


def test_streaming_stratified_sample_equals_batch(spark, tmp_path_factory):
    """stratified_sample is a pure narrow filter, so the SAME operator runs
    unchanged on a stream, and streaming output == batch output on identical
    files (md5 draw is data-deterministic, not trigger-dependent)."""
    from rust_dataframe_spark.operators import training as tr

    p = str(tmp_path_factory.mktemp("sstrat") / "docs")
    df = spark.range(2000).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, "web").otherwise("books").alias("src"),
    )
    df.coalesce(2).write.mode("overwrite").parquet(p)

    mix = {"web": 0.25, "books": 1.0}
    batch = {r["id"] for r in
             tr.stratified_sample(spark.read.parquet(p), "id", "src", mix).collect()}
    schema = spark.read.parquet(p).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(p)
    out = st.run_available_now(
        tr.stratified_sample(stream, "id", "src", mix), "t_sstrat",
        output_mode="append",
    )
    streamed = {r["id"] for r in out.collect()}
    assert streamed == batch and len(batch) > 0


def test_enrich_stream_static_join(spark, events):
    schema = spark.read.parquet(events).schema
    stream = st.read_stream_parquet(spark, events, schema)
    dim = spark.createDataFrame(
        [(0, "free"), (1, "pro"), (2, "pro")], ["user_id", "segment"]
    )
    enriched = st.enrich_stream(stream, dim, "user_id").groupBy("segment").agg(
        F.count(F.lit(1)).alias("n")
    )
    out = {r["segment"]: r["n"] for r in st.run_available_now(enriched, "t_enrich").collect()}
    assert out == {"free": 20, "pro": 40}


def test_interval_join_stream_stream(spark, events):
    schema = spark.read.parquet(events).schema
    lstream = st.read_stream_parquet(spark, events, schema).filter(
        F.col("value") % 2 == 0
    ).select("user_id", "ts", "value")
    rstream = st.read_stream_parquet(spark, events, schema).filter(
        F.col("value") % 2 == 1
    ).select("user_id", "ts", "value")
    joined = st.interval_join(
        lstream, rstream, "user_id", watermark="4 hours", tolerance="10 minutes"
    )
    out = st.run_available_now(joined, "t_ivj", output_mode="append")
    lb = spark.read.parquet(events).filter(F.col("value") % 2 == 0).select("user_id", "ts", "value")
    rb = spark.read.parquet(events).filter(F.col("value") % 2 == 1).select("user_id", "ts", "value")
    batch = lb.alias("l").join(
        rb.alias("r"),
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r.ts") >= F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr("INTERVAL 10 minutes")),
    )
    s = sorted((r["user_id"], r["l_ts"], r["r_ts"]) for r in out.collect())
    b = sorted((r["user_id"], r["ts"], r[4]) for r in batch.collect())
    assert len(s) == len(b) > 0
    assert s == [(u, lt, rt) for (u, lt, rt) in b]


def test_stream_restart_resumes_from_checkpoint(spark, tmp_path_factory):
    """Stop-and-restart against the SAME checkpoint: the resumed query must
    process only files that arrived while it was down — no reprocessing of
    committed batches, no duplicate rows in the sink.  This is the
    exactly-once restart contract end-to-end (offset log + idempotent
    batch-id-partitioned sink), not just single-run idempotence."""
    base = tmp_path_factory.mktemp("restart")
    src, out, ckpt = str(base / "src"), str(base / "out"), str(base / "ckpt")
    spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string") \
        .coalesce(1).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    # run 1: drains the first file, commits, stops
    q1 = st.foreach_batch_parquet(
        spark.readStream.schema(schema).parquet(src), out, checkpoint=ckpt
    )
    assert q1.awaitTermination(120)
    first = spark.read.parquet(out)
    assert first.count() == 2
    batches_run1 = {r["_batch_id"] for r in first.select("_batch_id").distinct().collect()}

    # data arrives while the query is DOWN
    spark.createDataFrame([(3, "c"), (4, "d")], "k int, v string") \
        .coalesce(1).write.mode("append").parquet(src)

    # run 2: same checkpoint — resumes past the committed offset
    q2 = st.foreach_batch_parquet(
        spark.readStream.schema(schema).parquet(src), out, checkpoint=ckpt
    )
    assert q2.awaitTermination(120)
    back = spark.read.parquet(out)
    assert back.count() == 4  # no duplicates of run-1 rows
    assert sorted(r["k"] for r in back.collect()) == [1, 2, 3, 4]
    batches_all = {r["_batch_id"] for r in back.select("_batch_id").distinct().collect()}
    # run 2 wrote NEW batch ids; run-1 partitions were left untouched
    assert batches_run1 < batches_all


def test_stream_ewma_matches_batch_fold(spark, events):
    """One-pass stateful EWMA over the stream == the batch O(n^2) fold —
    state carries the recurrence across micro-batches."""
    from rust_dataframe_spark.operators.temporal import ewma as batch_ewma

    schema = spark.read.parquet(events).schema
    stream = st.read_stream_parquet(spark, events, schema)
    out = st.run_available_now(
        st.stream_ewma(stream, key_col="user_id", ts_col="ts", value_col="value"),
        "t_ewma",
        output_mode="update",
    )
    got = {
        (r["user_id"], r["ts"]): r["ewma"] for r in out.collect()
    }
    batch = batch_ewma(
        spark.read.parquet(events), "user_id", "ts", "value", alpha=0.25
    )
    want = {(r["user_id"], r["ts"]): r["ewma"] for r in batch.collect()}
    assert got == want and len(got) == 60


def test_stream_ewma_rocksdb_state_store(spark, events):
    """The 100 TB state path: the same stateful EWMA runs on the RocksDB
    state-store provider (state spills to local disk per partition instead
    of living on the executor heap) and produces identical results."""
    from rust_dataframe_spark.operators.temporal import ewma as batch_ewma

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        schema = spark.read.parquet(events).schema
        stream = st.read_stream_parquet(spark, events, schema)
        out = st.run_available_now(
            st.stream_ewma(stream, key_col="user_id", ts_col="ts", value_col="value"),
            "t_ewma_rocks",
            output_mode="update",
        )
        got = {(r["user_id"], r["ts"]): r["ewma"] for r in out.collect()}
    finally:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    batch = batch_ewma(
        spark.read.parquet(events), "user_id", "ts", "value", alpha=0.25
    )
    want = {(r["user_id"], r["ts"]): r["ewma"] for r in batch.collect()}
    assert got == want and len(got) == 60


def test_interval_join_left_outer_emits_unmatched(spark, tmp_path_factory):
    """Stream-stream LEFT OUTER interval join: an impression with no click in
    its tolerance window emits once with nulls — after the watermark passes
    its window (flushed here by a later batch, as in production)."""
    base = tmp_path_factory.mktemp("souter")
    lp, rp = str(base / "left"), str(base / "right")

    def _ev(rows):
        return spark.createDataFrame(rows, "user_id int, ts_s string, v string").select(
            "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "v"
        )

    # batch 1: imp A (user 1) gets a click; imp B (user 2) never does
    _ev([(1, "2024-01-01 00:00:00", "impA"), (2, "2024-01-01 00:01:00", "impB")]) \
        .coalesce(1).write.mode("overwrite").parquet(lp)
    _ev([(1, "2024-01-01 00:05:00", "clickA")]).coalesce(1).write.mode("overwrite").parquet(rp)
    # batch 2: far-future rows on BOTH sides advance both watermarks past
    # imp B's window so its no-match row can finalize
    _ev([(9, "2024-01-01 09:00:00", "impZ")]).coalesce(1).write.mode("append").parquet(lp)
    _ev([(9, "2024-01-01 09:00:01", "clickZ")]).coalesce(1).write.mode("append").parquet(rp)

    schema = spark.read.parquet(lp).schema
    ls = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(lp)
    rs = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(rp)
    out = st.run_available_now(
        st.interval_join(
            ls, rs, "user_id",
            watermark="1 minute", tolerance="10 minutes", how="left_outer",
        ),
        "t_souter",
        output_mode="append",
    )
    rows = {(r["user_id"], r["l_v"]): r["r_v"] for r in out.collect()}
    assert rows[(1, "impA")] == "clickA"      # matched pair
    assert (2, "impB") in rows and rows[(2, "impB")] is None  # unmatched emits nulls


def test_interval_join_rejects_unknown_type(spark):
    df = spark.createDataFrame([], "user_id int, ts timestamp, v string")
    with pytest.raises(ValueError):
        st.interval_join(df, df, "user_id", how="left_semi")


def test_stream_cusum_matches_batch_fold(spark, events):
    from rust_dataframe_spark.operators.temporal import cusum as batch_cusum

    schema = spark.read.parquet(events).schema
    stream = st.read_stream_parquet(spark, events, schema)
    out = st.run_available_now(
        st.stream_cusum(
            stream, key_col="user_id", ts_col="ts", value_col="value",
            target=8.0, slack=1.0, threshold=20.0,
        ),
        "t_cusum",
        output_mode="update",
    )
    got = {(r["user_id"], r["ts"]): (r["cusum"], r["alarm"]) for r in out.collect()}
    batch = batch_cusum(
        spark.read.parquet(events), "user_id", "ts", "value", target=8.0, slack=1.0
    )
    want = {
        (r["user_id"], r["ts"]): (r["cusum"], r["cusum"] > 20.0)
        for r in batch.collect()
    }
    assert got == want and len(got) == 60
    assert any(a for _, a in got.values())  # the ramp trips the alarm somewhere


def test_stream_holt_matches_batch_fold(spark, events):
    from rust_dataframe_spark.operators.temporal import holt_linear

    schema = spark.read.parquet(events).schema
    stream = st.read_stream_parquet(spark, events, schema)
    out = st.run_available_now(
        st.stream_holt(stream, key_col="user_id", ts_col="ts", value_col="value",
                       alpha=0.5, beta=0.25),
        "t_holt",
        output_mode="update",
    )
    got = {
        (r["user_id"], r["ts"]): (r["level"], r["trend"], r["forecast_1"])
        for r in out.collect()
    }
    batch = holt_linear(
        spark.read.parquet(events), "user_id", "ts", "value", alpha=0.5, beta=0.25
    )
    want = {
        (r["user_id"], r["ts"]): (r["level"], r["trend"], r["forecast_1"])
        for r in batch.collect()
    }
    assert got == want and len(got) == 60


def test_stream_binned_histogram_matches_batch(spark, events):
    """q269's streaming histogram: availableNow per-window bin counts ==
    the batch groupBy with the shared bin rule."""
    from rust_dataframe_spark.operators.stats import _binned

    schema = spark.read.parquet(events).schema
    stream = st.read_stream_parquet(spark, events, schema)
    out = st.run_available_now(
        st.stream_binned_histogram(
            stream, window="1 hour", watermark="2 hours", lo=0.0, hi=20.0, nbins=4
        ),
        "t_binned",
    )
    batch = (
        spark.read.parquet(events)
        .groupBy(
            F.window("ts", "1 hour").alias("w"),
            _binned(F.col("value"), 0.0, 20.0, 4).alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), "bin", "n")
    )
    s = {(r["win_start"], r["bin"]): r["n"] for r in out.collect()}
    b = {(r["win_start"], r["bin"]): r["n"] for r in batch.collect()}
    assert s == b and len(s) > 0


def test_streaming_countmin_incremental_merge(spark, events, tmp_path_factory):
    """Sketch maintenance as a stream: each micro-batch builds a partial
    count-min and foreachBatch-merges it into a persistent sketch table;
    the final merged sketch must equal the one-shot batch sketch (count-min
    cells are sums — associative, so incremental == batch)."""
    from rust_dataframe_spark.operators.sketches import countmin_build, countmin_merge

    out_dir = str(tmp_path_factory.mktemp("cms") / "sketch")
    schema = spark.read.parquet(events).schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(events)

    import os

    def merge_batch(df, batch_id):
        part = countmin_build(
            df.select(F.col("user_id").cast("string").alias("tok")), "tok",
            depth=2, width=64,
        )
        if os.path.exists(out_dir):
            prev = spark.read.parquet(out_dir)
            merged = countmin_merge(prev, part)
        else:
            merged = part
        merged.write.mode("overwrite").parquet(out_dir + "_tmp")
        spark.read.parquet(out_dir + "_tmp").write.mode("overwrite").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    final = {
        (r["row"], r["bucket"]): r["c"]
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = {
        (r["row"], r["bucket"]): r["c"]
        for r in countmin_build(
            spark.read.parquet(events).select(
                F.col("user_id").cast("string").alias("tok")
            ),
            "tok",
            depth=2,
            width=64,
        ).collect()
    }
    assert final == batch and len(final) > 0


def test_streaming_quality_classifier_batch_parity(spark, tmp_path_factory):
    """hashed_linear_score is stateless/narrow, so it must run UNCHANGED on a
    streaming DataFrame with exact batch parity — the screen-while-ingesting
    deployment of the quality classifier."""
    from rust_dataframe_spark.operators.text import hashed_linear_score

    p = str(tmp_path_factory.mktemp("clf") / "docs")
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon"), (3, "zeta")],
        "doc_id int, text string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(p)
    weights = [0.5, -0.25, 0.125, 1.0]
    batch = {
        r["doc_id"]: (r["margin"], r["prob"])
        for r in hashed_linear_score(
            spark.read.parquet(p), "doc_id", "text", weights=weights, bias=0.1
        ).collect()
    }
    schema = spark.read.parquet(p).schema
    stream = spark.readStream.schema(schema).parquet(p)
    out = st.run_available_now(
        hashed_linear_score(stream, "doc_id", "text", weights=weights, bias=0.1),
        "t_clf",
        output_mode="append",
    )
    got = {r["doc_id"]: (r["margin"], r["prob"]) for r in out.collect()}
    assert got == batch


def test_stream_heavy_hitters_guarantee_across_batches(spark, tmp_path_factory):
    """stream_heavy_hitters (q341): the per-shard MG guarantee
    true - N_shard/(k+1) <= est <= true must hold over the UNION of all
    micro-batches (state carries the summary across batch boundaries), and
    state stays <= k counters per shard regardless of stream length."""
    p = str(tmp_path_factory.mktemp("shh") / "toks")
    # 3 batches, skewed: token t0 dominates, t1..t5 tail
    batches = []
    for b in range(3):
        toks = ["t0"] * 40 + [f"t{1 + (b + i) % 5}" for i in range(25)]
        batches.append(toks)
    for b, toks in enumerate(batches):
        spark.createDataFrame([(t,) for t in toks], "token string").coalesce(
            1
        ).write.mode("overwrite" if b == 0 else "append").parquet(p)

    schema = spark.read.parquet(p).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(p)
    out = st.run_available_now(
        st.stream_heavy_hitters(stream, token_col="token", k=2, nshards=2),
        "t_shh",
        output_mode="update",
    )
    rows = out.collect()
    # at most k rows per (shard, ver) emission
    from collections import Counter

    per_emit = Counter((r["shard"], r["ver"]) for r in rows)
    assert all(c <= 2 for c in per_emit.values())
    # final summary per shard = max-ver emission
    import hashlib

    final = {}
    for r in rows:
        cur = final.get(r["shard"])
        if cur is None or r["ver"] > cur[0]:
            final[r["shard"]] = (r["ver"], {})
    for r in rows:
        ver, d = final[r["shard"]]
        if r["ver"] == ver:
            d[r["token"]] = r["est"]

    all_toks = [t for b in batches for t in b]
    true = {t: all_toks.count(t) for t in set(all_toks)}

    def shard_of(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 2

    ns = {s: sum(c for t, c in true.items() if shard_of(t) == s) for s in (0, 1)}
    k = 2
    for t, c in true.items():
        s = shard_of(t)
        est = final.get(s, (0, {}))[1].get(t, 0)
        assert est <= c, (t, est, c)
        assert (c - est) * (k + 1) <= ns[s], (t, est, c, ns[s])
        if c * (k + 1) > ns[s]:
            assert est > 0, f"heavy hitter {t} missing from shard {s}"
