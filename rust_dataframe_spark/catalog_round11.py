"""Catalog round 11: lakehouse schema-evolution and incremental reads.

The round-10 verdict ranked Iceberg FIELD-ID column resolution (the
spec's core schema-evolution promise — a renamed column must read
under its new name, by id, not resurrect the old physical name) as
the likeliest wrong-read a switching user hits, followed by Delta
column-mapping 'id' mode on the same parquet-field-id machinery and
incremental/CDC reads across the lakehouse trio.  Each query follows
the q451-q461 discipline: a protocol-shaped fixture written by the
repo's own writer half, read back through the real reader path, with
a closed-form DuckDB oracle replaying the snapshot algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .catalog import query

__all__: list[str] = []


# ---------------------------------------------------------------------------
# q462: Iceberg schema evolution — rename + add, resolved by field id
# ---------------------------------------------------------------------------
#
# Fixture (closed-form): commit A writes ids 0..29 (p = id % 3,
# val = id * 2) with parquet field ids stamped; the schema then
# evolves (val RENAMED to score — same field id — and bonus int
# ADDED with a fresh id); commit B appends ids 100..108 with
# score = id * 3, bonus = id % 5.  The current-snapshot read must
# resolve commit-A files' physical column 'val' to logical 'score'
# BY ID (name resolution would silently null it), read bonus as null
# for commit-A files, and time travel to snapshot A must resolve
# through the snapshot's recorded schema-id (columns id/p/val).


@query(
    "q462_iceberg_schema_evolution",
    oracle="""
    WITH c0 AS (SELECT unnest(range(0, 30)) AS id),
    c1 AS (SELECT 100 + unnest(range(0, 9)) AS id),
    cur AS (SELECT id, id % 3 AS p, id * 2 AS score,
                   CAST(NULL AS BIGINT) AS bonus FROM c0
            UNION ALL
            SELECT id, id % 3, id * 3, id % 5 FROM c1),
    v1 AS (SELECT id, id % 3 AS p, id * 2 AS val FROM c0),
    snaps AS (SELECT 'current' AS snap, p, score, bonus FROM cur
              UNION ALL
              SELECT 'v1', p, val, CAST(NULL AS BIGINT) FROM v1)
    SELECT snap, CAST(p AS INT) AS p,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(score) AS BIGINT) AS score_sum,
           CAST(sum(bonus) AS BIGINT) AS bonus_sum
    FROM snaps GROUP BY snap, p ORDER BY snap, p
    """,
)
def q462_iceberg_schema_evolution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iceberg schema evolution read by parquet FIELD ID (round 11 —
    sources/iceberg.py + sources/fieldid.py, the spec's 'Column
    Projection' rule): data files carry field ids in their footers
    (every real Iceberg writer stamps them; this repo's writer does
    too), so a column renamed between commits reads under its NEW
    name from files written under the old one, a column added later
    reads as null in older files, and time travel resolves the
    snapshot's recorded schema-id (the pre-rename read still sees
    'val').  Resolution happens inside Spark's parquet reader (one
    distributed scan, `spark.sql.parquet.fieldId.read.enabled` with
    an id-annotated read schema) — no per-file unions.  Files WITHOUT
    ids keep name resolution with a loud rename guard."""
    import shutil

    from .catalog_sources import _scratch
    from .sources.iceberg import (
        evolve_iceberg_schema,
        read_iceberg,
        write_iceberg_commit,
    )

    path = _scratch("iceberg_evolve", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    s1 = write_iceberg_commit(
        spark, path,
        spark.range(30).select(
            F.col("id").cast("int").alias("id"),
            (F.col("id") % 3).cast("int").alias("p"),
            (F.col("id") * 2).cast("int").alias("val"),
        ),
        partition_by=["p"],
    )
    evolve_iceberg_schema(
        path, renames={"val": "score"}, adds=[("bonus", "int")]
    )
    write_iceberg_commit(
        spark, path,
        spark.range(100, 109).select(
            F.col("id").cast("int").alias("id"),
            (F.col("id") % 3).cast("int").alias("p"),
            (F.col("id") * 3).cast("int").alias("score"),
            (F.col("id") % 5).cast("int").alias("bonus"),
        ),
        partition_by=["p"],
    )
    cur = read_iceberg(spark, path).select(
        "p",
        F.col("score").cast("long").alias("score"),
        F.col("bonus").cast("long").alias("bonus"),
        F.lit("current").alias("snap"),
    )
    old = read_iceberg(spark, path, snapshot_id=s1).select(
        "p",
        F.col("val").cast("long").alias("score"),
        F.lit(None).cast("long").alias("bonus"),
        F.lit("v1").alias("snap"),
    )
    return (
        cur.unionByName(old)
        .groupBy("snap", "p")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("score").alias("score_sum"),
            F.sum("bonus").alias("bonus_sum"),
        )
        .orderBy("snap", "p")
    )


# ---------------------------------------------------------------------------
# q463: Delta column mapping 'id' mode — field-id resolution + rename
# ---------------------------------------------------------------------------
#
# Fixture (closed-form): a table CREATED in column-mapping 'id' mode
# (schemaString carries delta.columnMapping.id + physicalName; data
# files are stamped with parquet field ids = the column ids and carry
# generated physical names).  Commit 0 writes ids 0..29 (p = id % 3,
# val = id * 2), commit 1 appends ids 100..108 (val = id * 3), a
# CHECKPOINT collapses the log (mode + ids must survive bootstrap),
# commit 3 RENAMES val -> score (metadata-only; ids preserved), and
# commit 4 appends id 5000 (p = 2, score = 11).  Output: the same
# census as q458 under the LOGICAL names at the latest snapshot
# (score from files written as val, resolved by id) and at
# time-travel version 1 (pre-rename: column still reads as val).


@query(
    "q463_delta_colmap_id_mode",
    oracle="""
    WITH c0 AS (SELECT unnest(range(0, 30)) AS id),
    c1 AS (SELECT 100 + unnest(range(0, 9)) AS id),
    v1 AS (SELECT id, id % 3 AS p, id * 2 AS val FROM c0
           UNION ALL SELECT id, id % 3, id * 3 FROM c1),
    cur AS (SELECT id, p, val AS score FROM v1
            UNION ALL SELECT 5000, 2, 11),
    snaps AS (SELECT 'latest' AS snap, p, score FROM cur
              UNION ALL SELECT 'v1', p, val FROM v1)
    SELECT snap, CAST(p AS INT) AS p,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(score) AS BIGINT) AS score_sum
    FROM snaps GROUP BY snap, p ORDER BY snap, p
    """,
)
def q463_delta_colmap_id_mode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delta column mapping in 'id' mode (round 11 — sources/delta.py
    + sources/fieldid.py, PROTOCOL.md): data-file columns resolve by
    parquet FIELD ID = delta.columnMapping.id, the same machinery as
    the Iceberg reader — physical names in the files are opaque, a
    logical RENAME is a metadata-only commit (rename_delta_columns;
    ids and physicalName preserved) after which old files read under
    the new name, and the whole arrangement survives a checkpoint
    bootstrap (configuration + schemaString ride in the checkpoint).
    A table claiming 'id' mode whose files lack field ids refuses
    loudly (spec: id-mode writers must stamp them)."""
    import shutil

    from .catalog_sources import _scratch
    from .sources.delta import (
        read_delta,
        rename_delta_columns,
        write_delta_checkpoint,
        write_delta_commit,
    )

    path = _scratch("delta_colmap_id", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    write_delta_commit(
        spark, path,
        spark.range(30).select(
            F.col("id").cast("int").alias("id"),
            (F.col("id") % 3).cast("int").alias("p"),
            (F.col("id") * 2).cast("int").alias("val"),
        ),
        partition_by=["p"], column_mapping="id",
    )
    write_delta_commit(
        spark, path,
        spark.range(100, 109).select(
            F.col("id").cast("int").alias("id"),
            (F.col("id") % 3).cast("int").alias("p"),
            (F.col("id") * 3).cast("int").alias("val"),
        ),
        partition_by=["p"],
    )
    write_delta_checkpoint(spark, path)
    rename_delta_columns(spark, path, {"val": "score"})
    write_delta_commit(
        spark, path,
        spark.createDataFrame(
            [(5000, 2, 11)], "id int, p int, score int"
        ),
        partition_by=["p"],
    )
    latest = read_delta(spark, path).select(
        "p", F.col("score").cast("long").alias("score"),
        F.lit("latest").alias("snap"),
    )
    v1 = read_delta(spark, path, version=1).select(
        "p", F.col("val").cast("long").alias("score"),
        F.lit("v1").alias("snap"),
    )
    return (
        latest.unionByName(v1)
        .groupBy("snap", "p")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("score").alias("score_sum"),
        )
        .orderBy("snap", "p")
    )
