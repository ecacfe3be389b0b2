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
from .sources.lakehouse_util import local_rows_df as _lrd

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
        _lrd(spark, [(i, i % 3, i * 2) for i in range(0, 30)], "id int, p int, val int"),
        partition_by=["p"],
    )
    evolve_iceberg_schema(
        path, renames={"val": "score"}, adds=[("bonus", "int")]
    )
    write_iceberg_commit(
        spark, path,
        _lrd(spark, [(i, i % 3, i * 3, i % 5) for i in range(100, 109)], "id int, p int, score int, bonus int"),
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
        _lrd(spark, [(i, i % 3, i * 2) for i in range(0, 30)], "id int, p int, val int"),
        partition_by=["p"], column_mapping="id",
    )
    write_delta_commit(
        spark, path,
        _lrd(spark, [(i, i % 3, i * 3) for i in range(100, 109)], "id int, p int, val int"),
        partition_by=["p"],
    )
    write_delta_checkpoint(spark, path)
    rename_delta_columns(spark, path, {"val": "score"})
    write_delta_commit(
        spark, path,
        _lrd(spark, 
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


# ---------------------------------------------------------------------------
# q464: Delta Change Data Feed — cdc files + synthesized insert/delete
# ---------------------------------------------------------------------------
#
# Fixture (closed-form): a CDF-enabled unpartitioned table.
# v0 inserts ids 0..9 (val = id*2); v1 inserts (100,7),(101,9) —
# both add-only commits whose CDF rows SYNTHESIZE as inserts.
# v2 UPDATE (id % 5 = 0 -> val += 1000) writes a real _change_data/
# cdc file with update_preimage/update_postimage rows (matched: 0, 5,
# 100).  v3 DELETE (id = 3) writes a cdc delete.  v4 drops the live
# file wholesale (remove-only commit, no cdc) — CDF synthesizes
# deletes by reading the removed file (the spec's remove-only rule).
# Output: per (scope, commit version, change type) census for the
# full range AND a starting_version=3 tail read.


@query(
    "q464_delta_change_data_feed",
    oracle="""
    WITH base AS (SELECT unnest(range(0, 10)) AS id),
    late(id, val) AS (VALUES (100, 7), (101, 9)),
    ins0 AS (SELECT 0 AS v, 'insert' AS ct, id, id * 2 AS val
             FROM base),
    ins1 AS (SELECT 1 AS v, 'insert' AS ct, id, val FROM late),
    upd_match AS (SELECT id, id * 2 AS val FROM base WHERE id % 5 = 0
                  UNION ALL SELECT id, val FROM late WHERE id % 5 = 0),
    u_pre AS (SELECT 2 AS v, 'update_preimage' AS ct, id, val
              FROM upd_match),
    u_post AS (SELECT 2 AS v, 'update_postimage' AS ct, id,
                      val + 1000 AS val FROM upd_match),
    cur2 AS (SELECT id,
                    CASE WHEN id % 5 = 0 THEN val + 1000 ELSE val END
                        AS val
             FROM (SELECT id, id * 2 AS val FROM base
                   UNION ALL SELECT id, val FROM late)),
    d3 AS (SELECT 3 AS v, 'delete' AS ct, id, val FROM cur2
           WHERE id = 3),
    d4 AS (SELECT 4 AS v, 'delete' AS ct, id, val FROM cur2
           WHERE id <> 3),
    all_ch AS (SELECT * FROM ins0 UNION ALL SELECT * FROM ins1
               UNION ALL SELECT * FROM u_pre
               UNION ALL SELECT * FROM u_post
               UNION ALL SELECT * FROM d3 UNION ALL SELECT * FROM d4),
    scoped AS (SELECT 'full' AS scope, * FROM all_ch
               UNION ALL SELECT 'tail', * FROM all_ch WHERE v >= 3)
    SELECT scope, CAST(v AS BIGINT) AS commit_version,
           ct AS change_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(id) AS BIGINT) AS id_sum,
           CAST(sum(val) AS BIGINT) AS val_sum
    FROM scoped GROUP BY scope, v, ct
    ORDER BY scope, commit_version, change_type
    """,
)
def q464_delta_change_data_feed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delta Change Data Feed (round 11 — sources/delta.py,
    PROTOCOL.md 'Add CDC File' + the public CDF semantics): per
    commit, explicit ``_change_data/`` cdc files ARE the change set
    (update pre/post images, cdc deletes) while commits without cdc
    SYNTHESIZE — add-only commits as inserts, remove-only commits as
    deletes read from the removed files, and mixed rewrites without
    cdc refuse loudly.  The reader runs at most THREE distributed
    scans regardless of the version span (cdc / insert / delete file
    groups, commit version re-attached via the basename broadcast
    map), so a month of commits does not mean a month of scans.
    Both a full-range and a starting_version tail read are pinned."""
    import shutil

    from .catalog_sources import _scratch
    from .sources.delta import (
        delete_delta_rows_cdf,
        delta_snapshot_files,
        drop_delta_files,
        read_delta_changes,
        update_delta_rows_cdf,
        write_delta_commit,
    )

    path = _scratch("delta_cdf", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    write_delta_commit(
        spark, path,
        _lrd(spark, [(i, i * 2) for i in range(0, 10)], "id int, val int"),
        enable_cdf=True,
    )
    from .sources.lakehouse_util import local_rows_df

    write_delta_commit(
        spark, path,
        local_rows_df(spark, [(100, 7), (101, 9)], "id int, val int"),
    )
    update_delta_rows_cdf(
        spark, path, "id % 5 = 0", {"val": "val + 1000"}
    )
    delete_delta_rows_cdf(spark, path, "id = 3")
    _m, adds = delta_snapshot_files(spark, path)
    drop_delta_files(spark, path, [a["path"] for a in adds])
    full = read_delta_changes(
        spark, path, starting_version=0
    ).withColumn("scope", F.lit("full"))
    tail = read_delta_changes(
        spark, path, starting_version=3
    ).withColumn("scope", F.lit("tail"))
    return (
        full.unionByName(tail)
        .groupBy("scope", "_commit_version", "_change_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("id").alias("id_sum"),
            F.sum("val").alias("val_sum"),
        )
        .select(
            "scope",
            F.col("_commit_version").alias("commit_version"),
            F.col("_change_type").alias("change_type"),
            "n", "id_sum", "val_sum",
        )
        .orderBy("scope", "commit_version", "change_type")
    )


# ---------------------------------------------------------------------------
# q465: Iceberg incremental read — append diff between snapshots
# ---------------------------------------------------------------------------
#
# Fixture (closed-form): s0 writes ids 0..19 (p = id % 2, val = id);
# s1 appends ids 100..104 (val = id * 2); s2 appends ids 200..203
# (val = id * 3).  Incremental reads return exactly the rows ADDED in
# (from, to]: after_s0 = s1 + s2 rows, after_s1 = s2 rows only; a
# delete/overwrite snapshot in range refuses loudly (append-only
# contract, as real Iceberg incremental scans).


@query(
    "q465_iceberg_incremental",
    oracle="""
    WITH s1 AS (SELECT 100 + unnest(range(0, 5)) AS id),
    s2 AS (SELECT 200 + unnest(range(0, 4)) AS id),
    r1 AS (SELECT id, id % 2 AS p, id * 2 AS val FROM s1),
    r2 AS (SELECT id, id % 2 AS p, id * 3 AS val FROM s2),
    scoped AS (SELECT 'after_s0' AS scope, * FROM r1
               UNION ALL SELECT 'after_s0', * FROM r2
               UNION ALL SELECT 'after_s1', * FROM r2)
    SELECT scope, CAST(p AS INT) AS p,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(id) AS BIGINT) AS id_sum,
           CAST(sum(val) AS BIGINT) AS val_sum
    FROM scoped GROUP BY scope, p ORDER BY scope, p
    """,
)
def q465_iceberg_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iceberg incremental APPEND scan (round 11 —
    sources/iceberg.py read_iceberg_changes): the rows added by every
    snapshot in ``(from, to]``, resolved from each snapshot's
    manifest list (ADDED entries: status == 1 and entry snapshot-id
    == the snapshot), read in ONE distributed scan with the owning
    ``_snapshot_id`` re-attached via the basename broadcast map —
    scan count is O(1) in the snapshot-range length.  Non-append
    snapshots in range refuse loudly (the spec's incremental-scan
    contract); schema resolves at the TO snapshot (field ids)."""
    import shutil

    from .catalog_sources import _scratch
    from .sources.iceberg import (
        read_iceberg_changes,
        write_iceberg_commit,
    )

    path = _scratch("iceberg_incr", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    s0 = write_iceberg_commit(
        spark, path,
        _lrd(spark, [(i, i % 2, i) for i in range(0, 20)], "id int, p int, val int"),
        partition_by=["p"],
    )
    s1 = write_iceberg_commit(
        spark, path,
        _lrd(spark, [(i, i % 2, i * 2) for i in range(100, 105)], "id int, p int, val int"),
        partition_by=["p"],
    )
    write_iceberg_commit(
        spark, path,
        _lrd(spark, [(i, i % 2, i * 3) for i in range(200, 204)], "id int, p int, val int"),
        partition_by=["p"],
    )
    a0 = read_iceberg_changes(
        spark, path, from_snapshot_id=s0
    ).withColumn("scope", F.lit("after_s0"))
    a1 = read_iceberg_changes(
        spark, path, from_snapshot_id=s1
    ).withColumn("scope", F.lit("after_s1"))
    return (
        a0.unionByName(a1)
        .groupBy("scope", "p")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("id").alias("id_sum"),
            F.sum("val").alias("val_sum"),
        )
        .orderBy("scope", "p")
    )


# ---------------------------------------------------------------------------
# q466: Hudi incremental query — _hoodie_commit_time provenance
# ---------------------------------------------------------------------------
#
# Fixture (closed-form): COW table with meta fields.  t0 inserts ids
# 0..11 (p = id % 2, val = id * 2).  t1 upserts the p=0 file group:
# ids with id % 4 == 0 get val += 1000 (new commit time), carried
# rows keep their ORIGINAL t0 commit time, and id 100 (val 777)
# inserts.  t2 inserts ids 300, 301 into p=1 (val = id * 5).
# Incremental (t0, latest] = the updated rows (0/4/8), 100, 300, 301
# — NOT the carried rows sharing the rewritten file; (t1, latest] =
# 300, 301 only.


@query(
    "q466_hudi_incremental",
    oracle="""
    WITH upd AS (SELECT id, 0 AS p, id * 2 + 1000 AS val
                 FROM (SELECT unnest(range(0, 12)) AS id)
                 WHERE id % 2 = 0 AND id % 4 = 0),
    ins1 AS (SELECT 100 AS id, 0 AS p, 777 AS val),
    ins2 AS (SELECT id, 1 AS p, id * 5 AS val
             FROM (SELECT 300 + unnest(range(0, 2)) AS id)),
    scoped AS (SELECT 'after_t0' AS scope, * FROM upd
               UNION ALL SELECT 'after_t0', * FROM ins1
               UNION ALL SELECT 'after_t0', * FROM ins2
               UNION ALL SELECT 'after_t1', * FROM ins2)
    SELECT scope, CAST(p AS INT) AS p,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(id) AS BIGINT) AS id_sum,
           CAST(sum(val) AS BIGINT) AS val_sum
    FROM scoped GROUP BY scope, p ORDER BY scope, p
    """,
)
def q466_hudi_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hudi incremental query (round 11 — sources/hudi.py
    read_hudi_incremental): rows written by completed instants in
    ``(begin, end]``, filtered on the ``_hoodie_commit_time`` meta
    column inside the live file slices whose instant falls in range —
    the copy-on-write subtlety this pins is that a rewritten file
    group carries BOTH carried-over rows (original commit time,
    excluded) and upserted rows (new commit time, included), exactly
    real Hudi's semantics.  Tables without meta fields refuse loudly;
    one distributed scan with hive partition values re-injected."""
    import os as _os
    import re as _re
    import shutil

    from .catalog_sources import _scratch
    from .sources.hudi import (
        hudi_snapshot_files,
        read_hudi,
        read_hudi_incremental,
        write_hudi_commit,
    )

    path = _scratch("hudi_incr", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    t0 = write_hudi_commit(
        spark, path,
        _lrd(spark, [(i, i % 2, i * 2) for i in range(0, 12)], "id int, p int, val int"),
        partition_by=["p"], meta_fields=True,
    )
    slices = hudi_snapshot_files(path)
    fid0 = _re.match(
        r"^([0-9a-f-]+)_",
        _os.path.basename([f for pt, f in slices if pt == "p=0"][0]),
    ).group(1)
    g0 = read_hudi(spark, path).filter("p = 0")
    upserted = g0.select(
        F.when(F.col("id") % 4 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("_hoodie_commit_time"))
        .alias("_hoodie_commit_time"),
        "id", "p",
        F.when(F.col("id") % 4 == 0, F.col("val") + 1000)
        .otherwise(F.col("val")).cast("int").alias("val"),
    ).unionByName(_lrd(spark, 
        [(None, 100, 0, 777)],
        "_hoodie_commit_time string, id int, p int, val int",
    ))
    t1 = write_hudi_commit(
        spark, path, upserted, partition_by=["p"],
        upsert_into={"p=0": fid0}, meta_fields=True,
    )
    write_hudi_commit(
        spark, path,
        _lrd(spark, [(i, 1, i * 5) for i in range(300, 302)], "id int, p int, val int"),
        partition_by=["p"], meta_fields=True,
    )
    a0 = read_hudi_incremental(spark, path, begin_ts=t0).withColumn(
        "scope", F.lit("after_t0")
    )
    a1 = read_hudi_incremental(spark, path, begin_ts=t1).withColumn(
        "scope", F.lit("after_t1")
    )
    return (
        a0.unionByName(a1)
        .groupBy("scope", "p")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("id").alias("id_sum"),
            F.sum("val").alias("val_sum"),
        )
        .orderBy("scope", "p")
    )


# ---------------------------------------------------------------------------
# q467: Delta maintenance — OPTIMIZE (dataChange=false) + VACUUM
# ---------------------------------------------------------------------------
#
# Fixture (closed-form): a CDF-enabled table partitioned by p takes
# three insert commits (ids 0..9, 10..19, 20..29; p = id % 2 — six
# small files), then OPTIMIZE compacts each partition to one file
# with dataChange=false actions, then VACUUM(retain_versions=1)
# physically deletes every file the compacted snapshot no longer
# references.  Pins: the post-maintenance read returns the identical
# census, and the CDF stream across the whole range reports the three
# insert versions and NOTHING for the compaction version (the
# protocol's dataChange=false contract — an OPTIMIZE must never
# appear as churn to a CDC consumer).


@query(
    "q467_delta_maintenance",
    oracle="""
    WITH rows_ AS (SELECT unnest(range(0, 30)) AS id),
    t AS (SELECT id, id % 2 AS p, id // 10 AS v FROM rows_),
    census AS (SELECT 'snapshot' AS section,
                      CAST(p AS BIGINT) AS k,
                      CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(id) AS BIGINT) AS id_sum
               FROM t GROUP BY p),
    cdf AS (SELECT 'cdf_insert' AS section, CAST(v AS BIGINT) AS k,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(id) AS BIGINT) AS id_sum
            FROM t GROUP BY v)
    SELECT * FROM census UNION ALL SELECT * FROM cdf
    ORDER BY section, k
    """,
)
def q467_delta_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta table maintenance (round 11 — sources/delta.py):
    OPTIMIZE-style compaction rewrites each partition's small files
    into one, committed with ``dataChange=false`` remove+add actions
    — the protocol's no-rows-changed signal — and VACUUM physically
    deletes files referenced by no retained version (time travel
    below the horizon then fails at scan, real Delta's contract).
    The oracle pins both the identical post-maintenance census AND
    that the Change Data Feed reports nothing for the compaction
    version: a CDC consumer must never see an OPTIMIZE as churn.
    Compaction over deletion vectors refuses loudly (a naive rewrite
    would resurrect deleted rows)."""
    import shutil

    from .catalog_sources import _scratch
    from .sources.delta import (
        compact_delta_files,
        read_delta,
        read_delta_changes,
        vacuum_delta,
        write_delta_commit,
    )

    path = _scratch("delta_maint", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    for k in range(3):
        write_delta_commit(
            spark, path,
            _lrd(spark, [(i, i % 2) for i in range(k * 10, k * 10 + 10)], "id int, p int"),
            partition_by=["p"], enable_cdf=True,
        )
    compact_delta_files(spark, path)
    # CDF must be consumed BEFORE vacuum: synthesized inserts read
    # the version-0..2 files, which the vacuum below physically
    # deletes (real Delta's ordering constraint too) — so the change
    # census materializes here, then maintenance proceeds
    cdf_rows = [
        (int(r["_commit_version"]), int(r["n"]), int(r["id_sum"]))
        for r in (
            read_delta_changes(spark, path, starting_version=0)
            .groupBy("_commit_version")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("id").alias("id_sum"))
            .collect()
        )
    ]
    vacuum_delta(spark, path, retain_versions=1)
    snap = (
        read_delta(spark, path)
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("id_sum"))
        .select(
            F.lit("snapshot").alias("section"),
            F.col("p").cast("long").alias("k"), "n", "id_sum",
        )
    )
    cdf = _lrd(spark, 
        cdf_rows, "k bigint, n bigint, id_sum bigint"
    ).select(F.lit("cdf_insert").alias("section"), "k", "n", "id_sum")
    return snap.unionByName(cdf).orderBy("section", "k")


# ---------------------------------------------------------------------------
# q468: Iceberg snapshot expiry — retention window + orphan cleanup
# ---------------------------------------------------------------------------
#
# Fixture (closed-form): s0 writes ids 0..9 (val = id), s1 REWRITES
# partition p=0 via dynamic-partition overwrite (even ids get
# val = id * 10 under new file paths), s2 appends ids 100..103
# (val = id * 2).  expire_iceberg_snapshots(keep_last=2) drops s0 —
# deleting its manifest list/manifest and the p=0 data file that only
# s0 referenced — while s1/s2 keep reading identically (their
# carried-forward files survive the reference census).  Output: the
# current read plus the s1 time-travel read, both post-expiry.


@query(
    "q468_iceberg_expiry",
    oracle="""
    WITH base AS (SELECT unnest(range(0, 10)) AS id),
    s1 AS (SELECT id, id % 2 AS p,
                  CASE WHEN id % 2 = 0 THEN id * 10 ELSE id END AS val
           FROM base),
    s2 AS (SELECT id, p, val FROM s1
           UNION ALL
           SELECT 100 + u AS id, (100 + u) % 2 AS p, (100 + u) * 2
           FROM (SELECT unnest(range(0, 4)) AS u)),
    scoped AS (SELECT 'current' AS snap, p, id, val FROM s2
               UNION ALL SELECT 's1', p, id, val FROM s1)
    SELECT snap, CAST(p AS INT) AS p,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(id) AS BIGINT) AS id_sum,
           CAST(sum(val) AS BIGINT) AS val_sum
    FROM scoped GROUP BY snap, p ORDER BY snap, p
    """,
)
def q468_iceberg_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg snapshot expiry (round 11 — sources/iceberg.py, the
    spec's table-maintenance operation): snapshots outside the
    retention window drop from metadata and the manifest lists,
    manifests and data files referenced by NO retained snapshot are
    physically deleted — while files carried forward as EXISTING
    entries into retained snapshots survive the reference census
    (the overwritten pre-s1 p=0 file dies; everything else lives).
    Time travel and incremental reads into the expired range fail
    loudly afterwards (unit-pinned); this query pins that the
    RETAINED snapshots read identically after the cleanup."""
    import shutil

    from .catalog_sources import _scratch
    from .sources.iceberg import (
        expire_iceberg_snapshots,
        read_iceberg,
        write_iceberg_commit,
    )

    path = _scratch("iceberg_expire", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    write_iceberg_commit(
        spark, path,
        _lrd(spark, [(i, i % 2, i) for i in range(0, 10)], "id int, p int, val int"),
        partition_by=["p"],
    )
    s1 = write_iceberg_commit(
        spark, path,
        _lrd(
            spark,
            [(i, 0, i * 10) for i in range(0, 10) if i % 2 == 0],
            "id int, p int, val int",
        ),
        partition_by=["p"], replace_partitions=True,
    )
    write_iceberg_commit(
        spark, path,
        _lrd(spark, [(i, i % 2, i * 2) for i in range(100, 104)], "id int, p int, val int"),
        partition_by=["p"],
    )
    expire_iceberg_snapshots(path, keep_last=2)
    cur = read_iceberg(spark, path).withColumn("snap", F.lit("current"))
    old = read_iceberg(spark, path, snapshot_id=s1).withColumn(
        "snap", F.lit("s1")
    )
    return (
        cur.unionByName(old)
        .groupBy("snap", "p")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("id").alias("id_sum"),
            F.sum("val").alias("val_sum"),
        )
        .orderBy("snap", "p")
    )


# ---------------------------------------------------------------------------
# q469: Iceberg metadata-side file pruning — manifest column bounds
# ---------------------------------------------------------------------------
#
# Fixture (closed-form): four single-file commits carrying disjoint
# id ranges (k*100 .. k*100+99, val = id * 3).  The writer stamps
# per-file lower/upper bounds (spec Appendix D single values) from
# the parquet footers into the manifest entries; the reader's
# ``where`` prunes the FILE LIST by those bounds before the scan —
# id >= 250 provably excludes the first two files, and the string
# equality name = 'n137' keeps TWO files ('n137' sorts inside both
# 'n0'..'n99' and 'n100'..'n199' lexicographically — string bounds
# prune conservatively, exactly like real Iceberg's truncated string
# stats).  Output: the scan-plan counts
# (kept/total per predicate — deterministic because each commit is
# one file) plus the filtered census, which is correct whether or
# not pruning fires (pruning is advisory; the residual filter runs).


@query(
    "q469_iceberg_stats_pruning",
    oracle="""
    WITH ids AS (SELECT unnest(range(0, 400)) AS id),
    plan_ AS (SELECT 'plan' AS section, pred AS k,
                     CAST(kept AS BIGINT) AS a,
                     CAST(total AS BIGINT) AS b
              FROM (VALUES ('ge', 2, 4), ('range', 2, 4),
                           ('name_eq', 2, 4)) p(pred, kept, total)),
    census AS (SELECT 'census' AS section, 'ge' AS k,
                      CAST(count(*) AS BIGINT) AS a,
                      CAST(sum(id * 3) AS BIGINT) AS b
               FROM ids WHERE id >= 250
               UNION ALL
               SELECT 'census', 'range', CAST(count(*) AS BIGINT),
                      CAST(sum(id * 3) AS BIGINT)
               FROM ids WHERE id >= 250 AND id < 310
               UNION ALL
               SELECT 'census', 'name_eq', CAST(count(*) AS BIGINT),
                      CAST(sum(id * 3) AS BIGINT)
               FROM ids WHERE 'n' || CAST(id AS VARCHAR) = 'n137')
    SELECT section, k, a, b FROM plan_
    UNION ALL SELECT section, k, a, b FROM census
    ORDER BY section, k
    """,
)
def q469_iceberg_stats_pruning(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iceberg metadata-side FILE PRUNING on manifest column bounds
    (round 11 — sources/iceberg.py, the spec's lower_bounds /
    upper_bounds with Appendix-D single-value serialization): the
    writer records per-file min/max from the parquet footers
    (footer-only, no data read) and ``read_iceberg(where=...)``
    drops files whose bounds PROVE no row matches a recognized
    conjunct before the scan's file list is even built — at 10^6
    files that prunes the PLAN, which no scan-side filter can do.
    Pruning is advisory (missing bounds and unparsed conjuncts keep
    the file; the full predicate still filters rows), so answers
    never depend on it; this query pins BOTH the plan counts
    (kept/total via iceberg_plan_files) and the filtered census."""
    import shutil

    from .catalog_sources import _scratch
    from .sources.iceberg import (
        iceberg_plan_files,
        read_iceberg,
        write_iceberg_commit,
    )

    path = _scratch("iceberg_prune", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    for k in range(4):
        write_iceberg_commit(
            spark, path,
            _lrd(spark, [(i, f"n{i}", i * 3) for i in range(k * 100, k * 100 + 100)], "id long, name string, val long"),
        )
    preds = {
        "ge": "id >= 250",
        "range": "id >= 250 AND id < 310",
        "name_eq": "name = 'n137'",
    }
    plan_rows = []
    for key, w in sorted(preds.items()):
        kept, total = iceberg_plan_files(path, where=w)
        plan_rows.append(("plan", key, kept, total))
    plan_df = _lrd(spark, 
        plan_rows, "section string, k string, a bigint, b bigint"
    )
    pieces = [plan_df]
    for key, w in preds.items():
        pieces.append(
            read_iceberg(spark, path, where=w).agg(
                F.count(F.lit(1)).alias("a"),
                F.sum("val").alias("b"),
            ).select(
                F.lit("census").alias("section"),
                F.lit(key).alias("k"), "a", "b",
            )
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out.orderBy("section", "k")


# ---------------------------------------------------------------------------
# q470: Delta data skipping — per-file stats + partition-value pruning
# ---------------------------------------------------------------------------
#
# Fixture (closed-form): four single-file commits, commit k carrying
# partition p = k and the disjoint id range k*100 .. k*100+99
# (val = id * 3).  The writer stamps PROTOCOL.md per-file stats
# (numRecords + minValues/maxValues from the parquet footers) into
# every add action; read_delta(where=) skips files whose stats or
# partitionValues prove no match: id >= 250 keeps 2 of 4 files,
# p = 2 keeps 1 (pure partition pruning), and p >= 1 AND id < 150
# keeps 1 (both prune kinds composing).  Output: deterministic plan
# counts plus the filtered census (correct with or without skipping
# — the residual filter always runs).


@query(
    "q470_delta_data_skipping",
    oracle="""
    WITH ids AS (SELECT unnest(range(0, 400)) AS id),
    t AS (SELECT id, id // 100 AS p, id * 3 AS val FROM ids),
    plan_ AS (SELECT 'plan' AS section, pred AS k,
                     CAST(kept AS BIGINT) AS a,
                     CAST(total AS BIGINT) AS b
              FROM (VALUES ('combo', 1, 4), ('ge', 2, 4),
                           ('part', 1, 4)) p(pred, kept, total)),
    census AS (SELECT 'census' AS section, 'ge' AS k,
                      CAST(count(*) AS BIGINT) AS a,
                      CAST(sum(val) AS BIGINT) AS b
               FROM t WHERE id >= 250
               UNION ALL
               SELECT 'census', 'part', CAST(count(*) AS BIGINT),
                      CAST(sum(val) AS BIGINT)
               FROM t WHERE p = 2
               UNION ALL
               SELECT 'census', 'combo', CAST(count(*) AS BIGINT),
                      CAST(sum(val) AS BIGINT)
               FROM t WHERE p >= 1 AND id < 150)
    SELECT section, k, a, b FROM plan_
    UNION ALL SELECT section, k, a, b FROM census
    ORDER BY section, k
    """,
)
def q470_delta_data_skipping(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delta DATA SKIPPING (round 11 — sources/delta.py, PROTOCOL.md
    'Per-file Statistics'): the writer stamps numRecords +
    minValues/maxValues (footer-only row-group stats, physically
    keyed under column mapping) into every add action, and
    ``read_delta(where=...)`` prunes the file list by those stats
    AND by partitionValues before the scan plan exists — the Delta
    twin of q469's Iceberg bounds pruning, covering both pruning
    kinds real engines run (partition pruning is exact point
    intervals; stats pruning is conservative ranges).  Advisory
    only: files without stats and unrecognized conjuncts survive,
    and the residual filter always runs."""
    import shutil

    from .catalog_sources import _scratch
    from .sources.delta import (
        delta_plan_files,
        read_delta,
        write_delta_commit,
    )

    path = _scratch("delta_skip", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    for k in range(4):
        write_delta_commit(
            spark, path,
            _lrd(spark, [(i, k, i * 3) for i in range(k * 100, k * 100 + 100)], "id long, p int, val long"),
            partition_by=["p"],
        )
    preds = {
        "ge": "id >= 250",
        "part": "p = 2",
        "combo": "p >= 1 AND id < 150",
    }
    plan_rows = []
    for key, w in sorted(preds.items()):
        kept, total = delta_plan_files(spark, path, where=w)
        plan_rows.append(("plan", key, kept, total))
    pieces = [_lrd(spark, 
        plan_rows, "section string, k string, a bigint, b bigint"
    )]
    for key, w in preds.items():
        pieces.append(
            read_delta(spark, path, where=w).agg(
                F.count(F.lit(1)).alias("a"),
                F.sum("val").alias("b"),
            ).select(
                F.lit("census").alias("section"),
                F.lit(key).alias("k"), "a", "b",
            )
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out.orderBy("section", "k")
