"""Catalog extension: file-format round-trips (SURVEY §2.1).

Each query exercises a real write -> read cycle through one of the engine's
file sinks/sources (rust_dataframe_spark/sources/files.py), then aggregates
the read-back frame.  The DuckDB oracle aggregates the original parquet
directly, so a PASS proves the format round-trip is lossless for the columns
involved (types, quoting, null handling) — the same guarantee the reference
established with its CSV/Arrow/Parquet round-trip tests
(dataframe.rs:838-943).

Scratch output goes under /tmp (never the read-only testdata); paths embed
the scale-factor directory name so concurrent runs at different SFs don't
collide.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .catalog import query, table
from .sources import files as fs

_SCRATCH = "/tmp/spark_graft_io"


def _scratch(name: str, sf_dir: str) -> str:
    return os.path.join(_SCRATCH, f"{name}_{os.path.basename(sf_dir.rstrip('/'))}")


_RT_AGG = """
    SELECT count(*)                       AS n_rows,
           count(s_name)                  AS n_names,
           round(sum(s_acctbal), 2)       AS bal_sum,
           min(s_name)                    AS min_name,
           max(s_suppkey)                 AS max_key,
           sum(s_nationkey)               AS nk_sum
    FROM supplier
"""


@query("q90_csv_roundtrip", oracle=_RT_AGG)
def q90_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + source round-trip (reference from_csv dataframe.rs:349-389 /
    to_csv 527-543): write supplier to CSV, read it back with an explicit
    schema, aggregate.  The oracle aggregates the original parquet — equality
    proves header/quoting/type fidelity through the text format."""
    s = table(spark, sf_dir, "supplier")
    path = _scratch("csv_supplier", sf_dir)
    fs.write_csv(s, path)
    back = fs.read_csv(
        spark, path, schema="s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double"
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("s_name").alias("n_names"),
        F.round(F.sum("s_acctbal"), 2).alias("bal_sum"),
        F.min("s_name").alias("min_name"),
        F.max("s_suppkey").alias("max_key"),
        F.sum("s_nationkey").cast("bigint").alias("nk_sum"),
    )


@query(
    "q91_json_roundtrip",
    oracle="""
    SELECT count(*)                          AS n_rows,
           round(sum(o_totalprice), 2)       AS price_sum,
           min(o_orderpriority)              AS min_prio,
           CAST(max(o_orderdate) AS VARCHAR) AS max_date
    FROM orders WHERE o_orderkey < 2000
    """,
)
def q91_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-delimited JSON round-trip (reference from_json dataframe.rs:
    409-448; JSON write was a roadmap stub, README.md:66-68 — implemented
    here): timestamps survive via ISO serialization + schema-driven parse."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    path = _scratch("json_orders", sf_dir)
    fs.write_json(o, path)
    back = fs.read_json(
        spark,
        path,
        schema="o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("o_totalprice"), 2).alias("price_sum"),
        F.min("o_orderpriority").alias("min_prio"),
        F.max("o_orderdate").cast("string").alias("max_date"),
    )


@query(
    "q92_partitioned_parquet",
    oracle="""
    SELECT l_returnflag,
           count(*)                 AS n,
           round(sum(l_quantity), 2) AS qty
    FROM lineitem WHERE l_orderkey < 5000
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q92_partitioned_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned parquet write + partition-pruned read — the 100 TB
    layout lever (write once partitioned by the filter column; every later
    scan prunes directories instead of reading data).  Round-trips through
    sources/files.write_parquet(partition_by=['l_returnflag'])."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 5000)
    path = _scratch("pq_lineitem", sf_dir)
    fs.write_parquet(
        li.select("l_orderkey", "l_quantity", "l_returnflag"), path,
        partition_by=["l_returnflag"],
    )
    back = fs.read_parquet(spark, path)
    return (
        back.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .orderBy("l_returnflag")
    )


@query(
    "q105_python_datasource",
    oracle="""
    SELECT count(*)                     AS n,
           sum(id)                      AS sum_id,
           round(sum(sqrt(id)), 4)      AS sum_val
    FROM generate_series(0, 9999) t(id)
    """,
)
def q105_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource (Spark 4 `pyspark.sql.datasource`) — the
    reference's pluggable `DataSource` trait (io/datasource.rs:87-111,
    all-todo!) made real: schema + partition list + per-partition iterator,
    registered on the session (sources/python_source.py).  The oracle
    recomputes the same deterministic rows via DuckDB generate_series."""
    from .sources import python_source

    python_source.register(spark)
    df = spark.read.format("graft_range").option("n", 10000).option("parts", 8).load()
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("id").alias("sum_id"),
        F.round(F.sum("val"), 4).alias("sum_val"),
    )


@query("q122_arrow_ipc_dist", oracle=_RT_AGG)
def q122_arrow_ipc_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Arrow IPC round-trip (reference from_arrow/to_arrow,
    dataframe.rs:391-407/515-525 — executor-side here, unlike the
    driver-side bridge): partitions write part-*.arrow in parallel
    (sources/files.write_arrow_ipc_dir), the read is a binaryFile scan +
    mapInPandas pyarrow decode (read_arrow_ipc_dir), so neither direction
    routes data through the driver.  Oracle aggregates the source parquet —
    equality proves the IPC round-trip lossless."""
    s = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    path = _scratch("arrow_supplier", sf_dir)
    fs.write_arrow_ipc_dir(s.repartition(4), path)
    back = fs.read_arrow_ipc_dir(spark, path)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("s_name").alias("n_names"),
        F.round(F.sum("s_acctbal"), 2).alias("bal_sum"),
        F.min("s_name").alias("min_name"),
        F.max("s_suppkey").alias("max_key"),
        F.sum("s_nationkey").cast("bigint").alias("nk_sum"),
    )


@query("q331_avro_roundtrip", oracle=_RT_AGG)
def q331_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro container sink + source round-trip — NO spark-avro jar: the
    pure-stdlib codec in sources/avro.py (public container spec: zigzag
    varints, sync-delimited deflate blocks) behind the same executor-side
    write / binaryFile+mapInArrow read shape as the Arrow-IPC pair (q122).
    mapInArrow keeps float NULL and NaN distinct end-to-end (002.sql
    semantics, test_sources.TestAvro).  The oracle aggregates the source
    parquet — equality proves the round trip lossless."""
    from .sources import avro as av

    s = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    path = _scratch("avro_supplier", sf_dir)
    av.write_avro_dir(s.repartition(4), path)
    back = av.read_avro_dir(spark, path)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("s_name").alias("n_names"),
        F.round(F.sum("s_acctbal"), 2).alias("bal_sum"),
        F.min("s_name").alias("min_name"),
        F.max("s_suppkey").alias("max_key"),
        F.sum("s_nationkey").cast("bigint").alias("nk_sum"),
    )


@query("q142_orc_roundtrip", oracle=_RT_AGG)
def q142_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source round-trip (sources/files.write_orc/read_orc):
    the second columnar format next to parquet — same pushdown/pruning
    posture (plan-tested in test_sources), schema travels in the file.
    The avro format's external spark-avro jar is absent, so avro is
    covered by the stdlib container codec instead (q331, sources/avro.py)."""
    s = table(spark, sf_dir, "supplier")
    path = _scratch("orc_supplier", sf_dir)
    fs.write_orc(s, path)
    back = fs.read_orc(spark, path)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("s_name").alias("n_names"),
        F.round(F.sum("s_acctbal"), 2).alias("bal_sum"),
        F.min("s_name").alias("min_name"),
        F.max("s_suppkey").alias("max_key"),
        F.sum("s_nationkey").cast("bigint").alias("nk_sum"),
    )


@query(
    "q143_text_roundtrip",
    oracle="""
    SELECT count(*)            AS n_rows,
           sum(doc_id)         AS id_sum,
           sum(len(text))      AS chars,
           min(lang)           AS min_lang
    FROM documents
    """,
)
def q143_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw text-line sink + source (sources/files.write_text/read_text) —
    the crawl-ingestion shape: serialize documents as tab-separated lines,
    write .text, read back as one `value` column, re-parse with split.
    Equality against the parquet oracle proves the line format is lossless
    for tab-free text.  Scale: the text scan is splittable per line like
    any file source; parsing is codegen'd string ops."""
    d = table(spark, sf_dir, "documents")
    lines = d.select(
        F.concat_ws("\t", F.col("doc_id").cast("string"), F.col("lang"), F.col("text"))
        .alias("value")
    )
    path = _scratch("text_docs", sf_dir)
    fs.write_text(lines, path)
    back = fs.read_text(spark, path)
    parsed = back.select(
        F.split(F.col("value"), "\t", 3).alias("p")
    ).select(
        F.col("p")[0].cast("bigint").alias("doc_id"),
        F.col("p")[1].alias("lang"),
        F.col("p")[2].alias("text"),
    )
    return parsed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("doc_id").cast("bigint").alias("id_sum"),
        F.sum(F.length("text")).cast("bigint").alias("chars"),
        F.min("lang").alias("min_lang"),
    )


@query(
    "q144_schema_merge",
    oracle="""
    WITH u AS (
      SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
      FROM orders WHERE o_orderkey < 1000
      UNION ALL
      SELECT o_orderkey, NULL, o_orderpriority
      FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 2000
    )
    SELECT count(*)                     AS n_rows,
           count(o_totalprice)          AS n_price,
           count(o_orderpriority)       AS n_prio,
           round(sum(o_totalprice), 2)  AS price_sum
    FROM u
    """,
)
def q144_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet schema evolution (mergeSchema): two batches written with
    different column sets (an added column mid-stream — the normal life of
    a long-lived ingestion dir), read as one table with the union schema
    and NULLs where a batch lacks the column.  At scale mergeSchema=true
    costs a footer read per file — enable per-read like here, or keep
    schemas in a catalog; never on by default."""
    o = table(spark, sf_dir, "orders")
    path = _scratch("merge_orders", sf_dir)
    b1 = o.filter(F.col("o_orderkey") < 1000).select("o_orderkey", "o_totalprice")
    b2 = o.filter((F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") < 2000)).select(
        "o_orderkey", "o_orderpriority"
    )
    fs.write_parquet(b1, f"{path}/b1")
    fs.write_parquet(b2, f"{path}/b2")
    back = spark.read.option("mergeSchema", "true").option(
        "recursiveFileLookup", "true"
    ).parquet(path)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_totalprice").alias("n_price"),
        F.count("o_orderpriority").alias("n_prio"),
        F.round(F.sum("o_totalprice"), 2).alias("price_sum"),
    )


@query("q150_python_sink_roundtrip", oracle=_RT_AGG)
def q150_python_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom-connector WRITE path (Spark 4 DataSourceWriter,
    sources/python_source.GraftDirWriter): supplier streams through the
    Python sink — per-task uniquely-named part files + a driver-side
    manifest commit, so failed/speculative attempts are invisible to
    readers (the exactly-once file-commit protocol in miniature; completes
    the reference's DataSource trait with the half it never had).  Read
    back via the manifest, aggregate against the parquet oracle."""
    import shutil

    from .sources import python_source as ps

    ps.register(spark)
    s = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    path = _scratch("pysink_supplier", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    s.repartition(4).write.format("graft_range").option("path", path).mode(
        "append"
    ).save()
    back = ps.read_manifest_dir(
        spark, path, "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double"
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("s_name").alias("n_names"),
        F.round(F.sum("s_acctbal"), 2).alias("bal_sum"),
        F.min("s_name").alias("min_name"),
        F.max("s_suppkey").alias("max_key"),
        F.sum("s_nationkey").cast("bigint").alias("nk_sum"),
    )


@query("q179_compaction", oracle=_RT_AGG)
def q179_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction round-trip (sources/files.compact_parquet — the
    maintenance op that keeps 100 TB scans at maxPartitionBytes-sized splits
    instead of millions of footer-open costs): supplier is deliberately
    shattered into 16 tiny files, compacted back to size-derived file
    counts, and re-aggregated.  Equality with the original parquet's
    aggregate (the oracle) proves the rewrite is lossless; the compacted
    directory's file count collapsing to 1 is pinned in
    tests/test_sources.py."""
    import os

    s = table(spark, sf_dir, "supplier")
    shattered = _scratch("compact_src", sf_dir)
    compacted = _scratch("compact_dst", sf_dir)
    if not os.path.exists(os.path.join(shattered, "_SUCCESS")):
        s.repartition(16).write.mode("overwrite").parquet(shattered)
    fs.compact_parquet(spark, shattered, compacted)
    back = spark.read.parquet(compacted)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("s_name").alias("n_names"),
        F.round(F.sum("s_acctbal"), 2).alias("bal_sum"),
        F.min("s_name").alias("min_name"),
        F.max("s_suppkey").alias("max_key"),
        F.sum("s_nationkey").cast("bigint").alias("nk_sum"),
    )
