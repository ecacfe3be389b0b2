"""Catalog round 12: lakehouse migration-estate reads and maintenance.

The round-11 verdict ranked remaining extension gaps by how often a
real pipeline user hits them: Iceberg NAME MAPPING (the spec's Column
Projection rule 2 — Hive-migrated tables whose data files carry no
parquet field ids, the most common real Iceberg estate), Delta
drop-column evolution under column mapping, Hudi MERGE_ON_READ
incremental reads, Delta OPTIMIZE over deletion-vector tables,
partition-transform-aware metadata pruning, and Avro data files.
Each query follows the q451-q470 discipline: a protocol-shaped
fixture written by the repo's own writer half, read back through the
real reader path, with a closed-form DuckDB oracle replaying the
snapshot algebra.
"""

from __future__ import annotations

from datetime import date as _d, timedelta as _td

from pyspark.sql import DataFrame, SparkSession, functions as F

from .catalog import query
from .sources.lakehouse_util import local_rows_df as _lrd

__all__: list[str] = []


# ---------------------------------------------------------------------------
# q471: Iceberg name mapping — unstamped (migrated) files resolve renames
# ---------------------------------------------------------------------------
#
# Fixture (closed-form): commit A writes ids 0..29 (p = id % 3,
# val = id * 2) WITHOUT parquet field ids — the Hive-migrated /
# foreign-writer shape (write_iceberg_commit(stamp_field_ids=False));
# a migration-style `schema.name-mapping.default` property is set
# (each field id under its then-current name); the schema then
# evolves (val RENAMED to score, bonus int ADDED); commit B appends
# ids 100..108 (score = id * 3, bonus = id % 5) with field ids
# stamped (normal writer).  The current-snapshot read must resolve
# commit-A files' physical column 'val' to logical 'score' THROUGH
# THE NAME MAPPING (ids win for commit-B files — spec Column
# Projection rules 1 then 2), read bonus as null for commit-A files,
# and plan one scan per distinct resolved-name signature (2 legs),
# never per file.


@query(
    "q471_iceberg_name_mapping",
    oracle="""
    WITH c0 AS (SELECT unnest(range(0, 30)) AS id),
    c1 AS (SELECT 100 + unnest(range(0, 9)) AS id),
    cur AS (SELECT id, id % 3 AS p, id * 2 AS score,
                   CAST(NULL AS BIGINT) AS bonus FROM c0
            UNION ALL
            SELECT id, id % 3, id * 3, id % 5 FROM c1)
    SELECT CAST(p AS INT) AS p,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(score) AS BIGINT) AS score_sum,
           CAST(sum(bonus) AS BIGINT) AS bonus_sum,
           CAST(count(bonus) AS BIGINT) AS bonus_n
    FROM cur GROUP BY p ORDER BY p
    """,
)
def q471_iceberg_name_mapping(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iceberg name mapping (round 12 — sources/iceberg.py
    parse_name_mapping/_resolve_files_scan, the spec's Column
    Projection rule 2): data files written WITHOUT parquet field ids
    (Hive-migrated tables, older non-Spark writers — the most common
    real Iceberg estate) resolve their physical column names through
    the ``schema.name-mapping.default`` table property to field ids,
    so a column renamed after migration still reads under its new
    name from pre-migration files; field ids WIN when a file carries
    them (rule 1), so mixed stamped/unstamped tables read correctly
    instead of refusing.  The scan unions one leg per DISTINCT
    resolved-name signature (bounded by schema versions, never per
    file); tables without a mapping keep the loud rename-guard
    refusal."""
    import shutil

    from .catalog_sources import _scratch
    from .sources.iceberg import (
        evolve_iceberg_schema,
        read_iceberg,
        set_iceberg_name_mapping,
        write_iceberg_commit,
    )

    path = _scratch("iceberg_name_mapping", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    # commit A: migrated shape — no footer field ids
    write_iceberg_commit(
        spark, path,
        _lrd(spark, [(i, i % 3, i * 2) for i in range(0, 30)], "id int, p int, val int"),
        partition_by=["p"], stamp_field_ids=False,
    )
    set_iceberg_name_mapping(path)  # migration tool step
    evolve_iceberg_schema(
        path, renames={"val": "score"}, adds=[("bonus", "int")]
    )
    # commit B: normal writer — stamped; the table is now MIXED
    write_iceberg_commit(
        spark, path,
        _lrd(spark, [(i, i % 3, i * 3, i % 5) for i in range(100, 109)], "id int, p int, score int, bonus int"),
        partition_by=["p"],
    )
    return (
        read_iceberg(spark, path)
        .groupBy("p")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("score").cast("long").alias("score_sum"),
            F.sum("bonus").cast("long").alias("bonus_sum"),
            F.count("bonus").alias("bonus_n"),
        )
        .orderBy("p")
    )


# ---------------------------------------------------------------------------
# q472: Delta drop-column evolution — logical drop + no-resurrection re-add
# ---------------------------------------------------------------------------
#
# Fixture (closed-form): a column-mapping 'id' table — commit 0
# writes ids 0..29 (p = id % 3, secret = id * 2, keep = id + 1);
# secret is then DROPPED (metadata-only; the bytes stay in the old
# files), a CHECKPOINT collapses the log (the dropped field must stay
# dropped through bootstrap), secret is RE-ADDED (fresh column id +
# physicalName — the no-resurrection guarantee), and commit D appends
# ids 100..104 (secret = id % 7).  Latest read: old files' secret is
# NULL (never the dropped data), new files carry values; time travel
# to version 0 still reads the original secret.


@query(
    "q472_delta_drop_column",
    oracle="""
    WITH c0 AS (SELECT unnest(range(0, 30)) AS id),
    c1 AS (SELECT 100 + unnest(range(0, 5)) AS id),
    cur AS (SELECT id, id % 3 AS p, CAST(NULL AS BIGINT) AS secret,
                   id + 1 AS keep FROM c0
            UNION ALL
            SELECT id, id % 3, id % 7, id + 1 FROM c1),
    v0 AS (SELECT id, id % 3 AS p, id * 2 AS secret FROM c0),
    snaps AS (SELECT 'latest' AS snap, p, secret, keep FROM cur
              UNION ALL
              SELECT 'v0', p, secret, CAST(NULL AS BIGINT) FROM v0)
    SELECT snap, CAST(p AS INT) AS p,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(secret) AS BIGINT) AS secret_n,
           CAST(sum(secret) AS BIGINT) AS secret_sum,
           CAST(sum(keep) AS BIGINT) AS keep_sum
    FROM snaps GROUP BY snap, p ORDER BY snap, p
    """,
)
def q472_delta_drop_column(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delta drop-column evolution under column mapping (round 12 —
    sources/delta.py drop_delta_columns/add_delta_columns,
    PROTOCOL.md): a LOGICAL drop is a metadata-only commit removing
    the field from schemaString; old files keep the physical bytes
    but the reader projects exactly the mapped physical names, so
    the dropped column is never read again.  RE-ADDING the same
    logical name mints a FRESH delta.columnMapping.id (maxColumnId
    bump) and a fresh physicalName, so old files read the new column
    as NULL — dropped data can never resurrect (Iceberg's drop got
    this guarantee in round 11; this closes the asymmetry).  The
    arrangement survives a checkpoint bootstrap, and time travel to
    a pre-drop version still reads the original values."""
    import shutil

    from .catalog_sources import _scratch
    from .sources.delta import (
        add_delta_columns,
        drop_delta_columns,
        read_delta,
        write_delta_checkpoint,
        write_delta_commit,
    )

    path = _scratch("delta_drop_column", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    write_delta_commit(
        spark, path,
        _lrd(spark, [(i, i % 3, i * 2, i + 1) for i in range(0, 30)], "id int, p int, secret int, keep int"),
        partition_by=["p"], column_mapping="id",
    )
    drop_delta_columns(spark, path, ["secret"])
    write_delta_checkpoint(spark, path)
    add_delta_columns(spark, path, [("secret", "int")])
    write_delta_commit(
        spark, path,
        _lrd(spark, [(i, i % 3, i % 7, i + 1) for i in range(100, 105)], "id int, p int, secret int, keep int"),
        partition_by=["p"],
    )
    latest = read_delta(spark, path).select(
        "p",
        F.col("secret").cast("long").alias("secret"),
        F.col("keep").cast("long").alias("keep"),
        F.lit("latest").alias("snap"),
    )
    v0 = read_delta(spark, path, version=0).select(
        "p",
        F.col("secret").cast("long").alias("secret"),
        F.lit(None).cast("long").alias("keep"),
        F.lit("v0").alias("snap"),
    )
    return (
        latest.unionByName(v0)
        .groupBy("snap", "p")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("secret").alias("secret_n"),
            F.sum("secret").alias("secret_sum"),
            F.sum("keep").alias("keep_sum"),
        )
        .orderBy("snap", "p")
    )


# ---------------------------------------------------------------------------
# q473: Hudi MERGE_ON_READ incremental query — log-block instant provenance
# ---------------------------------------------------------------------------
#
# Fixture (closed-form): MOR table with meta fields, record key `id`.
# t0 base-inserts ids 0..11 (p = id % 2, val = id * 2).  t1 is a
# deltacommit: log upserts id 0 -> 1000, id 4 -> 1004 (p=0 group) and
# a NEW record id 100 (p=0, val 777).  t2 is another deltacommit: log
# upserts id 1 -> 9999 (p=1) and id 4 AGAIN -> 4444 (p=0), plus a
# DELETE of id 3 (p=1).  Incremental scopes: (t0, latest] = the
# latest state of records whose last modification is t1 or t2 —
# {0:1000, 100:777, 4:4444, 1:9999}, with the deleted id 3 absent and
# NO carried base rows; (t0, t1] = {0:1000, 4:1004, 100:777} (id 4 at
# its t1 value — the range end snapshots the state); (t1, latest] =
# {4:4444, 1:9999}.


@query(
    "q473_hudi_mor_incremental",
    oracle="""
    WITH s1 AS (SELECT 0 AS id, 0 AS p, 1000 AS val
                UNION ALL SELECT 100, 0, 777
                UNION ALL SELECT 4, 0, 4444
                UNION ALL SELECT 1, 1, 9999),
    s2 AS (SELECT 0 AS id, 0 AS p, 1000 AS val
           UNION ALL SELECT 4, 0, 1004
           UNION ALL SELECT 100, 0, 777),
    s3 AS (SELECT 4 AS id, 0 AS p, 4444 AS val
           UNION ALL SELECT 1, 1, 9999),
    scoped AS (SELECT 'after_t0' AS scope, * FROM s1
               UNION ALL SELECT 't0_to_t1', * FROM s2
               UNION ALL SELECT 'after_t1', * FROM s3)
    SELECT scope, CAST(p AS INT) AS p,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(id) AS BIGINT) AS id_sum,
           CAST(sum(val) AS BIGINT) AS val_sum
    FROM scoped GROUP BY scope, p ORDER BY scope, p
    """,
)
def q473_hudi_mor_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hudi MERGE_ON_READ incremental query (round 12 —
    sources/hudi.py read_hudi_incremental + read_hudi_mor
    provenance): the latest state (as of the range end) of every
    record whose last modification instant falls in ``(begin, end]``.
    Provenance is block-level for log records — the HoodieLogFormat
    INSTANT_TIME header the replay already parses — and the
    ``_hoodie_commit_time`` meta column for base rows, so carried
    base rows never re-emit and a record upserted twice reports once
    with its newest value.  Records deleted in range are absent
    (non-CDC semantics); deletes and rollbacks ride the same replay
    admission as the snapshot read.  Closes the round-11 MOR
    refusal."""
    import shutil

    from .catalog_sources import _scratch
    from .sources.hudi import (
        read_hudi_incremental,
        write_hudi_commit,
        write_hudi_log_commit,
    )

    path = _scratch("hudi_mor_incr", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    t0 = write_hudi_commit(
        spark, path,
        _lrd(spark, [(i, i % 2, i * 2) for i in range(0, 12)], "id int, p int, val int"),
        partition_by=["p"], table_type="MERGE_ON_READ",
        record_key="id", meta_fields=True,
    )
    t1 = write_hudi_log_commit(
        spark, path,
        _lrd(spark, 
            [(0, 0, 1000), (4, 0, 1004), (100, 0, 777)],
            "id int, p int, val int",
        ),
    )
    write_hudi_log_commit(
        spark, path,
        _lrd(spark, 
            [(1, 1, 9999), (4, 0, 4444)], "id int, p int, val int"
        ),
        deletes=[("p=1", "3")],
    )
    scopes = [
        ("after_t0", read_hudi_incremental(spark, path, begin_ts=t0)),
        ("t0_to_t1",
         read_hudi_incremental(spark, path, begin_ts=t0, end_ts=t1)),
        ("after_t1", read_hudi_incremental(spark, path, begin_ts=t1)),
    ]
    frames = [
        df.select(
            "p",
            F.col("id").cast("long").alias("id"),
            F.col("val").cast("long").alias("val"),
            F.lit(name).alias("scope"),
        )
        for name, df in scopes
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return (
        out.groupBy("scope", "p")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("id").alias("id_sum"),
            F.sum("val").alias("val_sum"),
        )
        .orderBy("scope", "p")
    )


# ---------------------------------------------------------------------------
# q474: Delta OPTIMIZE over deletion vectors — materializing compaction
# ---------------------------------------------------------------------------
#
# Fixture (closed-form): a CDF-enabled table — v0 writes ids 0..19
# (p = id % 2, v = id * 3) across several small files per partition;
# v1 tombstones ids 4 and 7 through DELETION VECTORS (remove +
# re-add same file with a DV descriptor); v2 = OPTIMIZE: every
# partition rewrites to ONE file with the DV tombstones MATERIALIZED
# (dropped rows, no DV on the new files), committed dataChange=false.
# Pins: the post-compact census equals the pre-compact one (ids 4/7
# stay gone, never resurrect), the table ends at exactly 2 DV-free
# files, and the CDF stream at the compaction version is EMPTY
# (dataChange=false invisibility).


@query(
    "q474_delta_optimize_dv",
    oracle="""
    WITH ids AS (SELECT unnest(range(0, 20)) AS id),
    live AS (SELECT id, id % 2 AS p, id * 3 AS v FROM ids
             WHERE id NOT IN (4, 7)),
    census AS (SELECT 'census' AS scope, CAST(p AS INT) AS p,
                      count(*) AS n, sum(v) AS v_sum
               FROM live GROUP BY p),
    metaf AS (SELECT 'meta' AS scope, CAST(0 AS INT) AS p,
                     CAST(2 AS BIGINT) AS n, CAST(0 AS BIGINT) AS v_sum)
    SELECT scope, p, CAST(n AS BIGINT) AS n,
           CAST(v_sum AS BIGINT) AS v_sum
    FROM (SELECT * FROM census UNION ALL SELECT * FROM metaf)
    ORDER BY scope, p
    """,
)
def q474_delta_optimize_dv(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delta OPTIMIZE over deletion vectors (round 12 —
    sources/delta.py compact_delta_files): compaction of a
    DV-carrying file MATERIALIZES the tombstones — the DV positions
    anti-join the rewrite scan on (basename, _metadata.row_index)
    exactly as the reader applies them — so the compacted file holds
    only live rows and carries no DV, deleted rows can never
    resurrect, and since no LOGICAL row changes the commit stays
    dataChange=false (CDF readers see silence at the compaction
    version; concurrent writers see no conflict).  Closes the
    round-11 DV-compaction refusal: DV-heavy tables are exactly the
    ones that need OPTIMIZE."""
    import os as _os
    import shutil

    from .catalog_sources import _scratch
    from .sources.delta import (
        compact_delta_files,
        delta_snapshot_files,
        read_delta,
        read_delta_changes,
        write_delta_commit,
        write_delta_delete_rows,
    )

    path = _scratch("delta_optimize_dv", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    write_delta_commit(
        spark, path,
        _lrd(spark, [(i, i % 2, i * 3) for i in range(0, 20)], "id int, p int, v int").repartition(3),
        partition_by=["p"], enable_cdf=True,
    )
    _meta, adds = delta_snapshot_files(spark, path)
    per_file: dict[str, list[int]] = {}
    for a in adds:
        f = _os.path.join(path, a["path"])
        rows = spark.read.parquet(f).select(
            "id", F.col("_metadata.row_index").alias("pos")
        ).collect()
        doomed = [r.pos for r in rows if r.id in (4, 7)]
        if doomed:
            per_file[a["path"]] = doomed
    write_delta_delete_rows(spark, path, per_file)
    v2 = compact_delta_files(spark, path)
    _meta, adds = delta_snapshot_files(spark, path)
    files_after = len(adds)
    dv_after = sum(
        1 for a in adds
        if a.get("deletionVector")
        and a["deletionVector"].get("storageType")
    )
    cdf_rows = read_delta_changes(
        spark, path, starting_version=v2
    ).count()
    census = (
        read_delta(spark, path)
        .groupBy("p")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").cast("long").alias("v_sum"),
        )
        .select("p", "n", "v_sum", F.lit("census").alias("scope"))
    )
    metaf = _lrd(spark, 
        [(dv_after, files_after, cdf_rows, "meta")],
        "p int, n bigint, v_sum bigint, scope string",
    )
    return (
        census.unionByName(metaf)
        .select("scope", "p", "n", "v_sum")
        .orderBy("scope", "p")
    )


# ---------------------------------------------------------------------------
# q475: Iceberg partition-transform pruning — bucket / day / truncate
# ---------------------------------------------------------------------------
#
# Fixture (closed-form): table A writes ids 0..59 (k = id % 10,
# d = 2024-03-01 + (id % 3) days, v = id) under a TRANSFORMED spec
# [bucket[4](k), day(d)] — coalesce(1) seeds make exactly one file
# per distinct transform tuple, and the spec's Murmur3 gives
# bucket(k): {0,1,2->0, 6->1, 4->2, 3,5,7,8,9->3}, so the table holds
# 4 buckets x 3 days = 12 files.  Table B writes 24 ids over six
# fruit names under truncate[2](name) -> 5 prefix files.  Pins (all
# constants pre-computed from the spec transforms): `k = 7 AND
# d = '2024-03-02'` plans 1/12 files (bucket(7)=3, day bin
# 2024-03-02) and returns ids {7, 37}; `k = 4` plans 3/12
# (bucket(4)=2, every day); `name = 'banana'` plans 1/5 (prefix
# 'ba') and returns 4 rows.


@query(
    "q475_iceberg_transform_pruning",
    oracle="""
    WITH facts AS (
      SELECT 'plan_k4' AS scope, 3 AS a, 12 AS b
      UNION ALL SELECT 'plan_k7_d2', 1, 12
      UNION ALL SELECT 'plan_name_ba', 1, 5
      UNION ALL SELECT 'rows_k4', 6, 174
      UNION ALL SELECT 'rows_k7_d2', 2, 44
      UNION ALL SELECT 'rows_name_ba', 4, 44)
    SELECT scope, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b
    FROM facts ORDER BY scope
    """,
)
def q475_iceberg_transform_pruning(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iceberg partition-transform pruning (round 12 —
    sources/iceberg.py _transform_survives + the transform-aware
    writer): `read_iceberg(where=)` and `iceberg_plan_files` prune
    the FILE LIST through the partition spec's transform arithmetic —
    bucket(N) equality via the spec's Murmur3 (Appendix B vectors
    pinned in tests), truncate(W) prefix/bin intervals, days date
    bins, and identity point values — before the scan plan exists;
    the highest-selectivity prune on real transformed tables.
    Advisory as ever (unrecognized ops/type mismatches survive; the
    residual filter still runs).  The writer half groups files by
    computed transform value (vectorized numpy Murmur3 in a pandas
    UDF for bucket; substring/floor-mod/datediff JVM-side for
    truncate/day) while source columns stay in-file."""
    import shutil

    from .catalog_sources import _scratch
    from .sources.iceberg import (
        iceberg_plan_files,
        read_iceberg,
        write_iceberg_commit,
    )

    pa = _scratch("iceberg_transforms_a", sf_dir)
    shutil.rmtree(pa, ignore_errors=True)
    write_iceberg_commit(
        spark, pa,
        _lrd(
            spark,
            [(i, i % 10, _d(2024, 3, 1) + _td(days=i % 3), i)
             for i in range(0, 60)],
            "id int, k int, d date, v int",
        ),
        partition_transforms=[
            ("k_bucket", "k", "bucket[4]"), ("d_day", "d", "day"),
        ],
    )
    pb = _scratch("iceberg_transforms_b", sf_dir)
    shutil.rmtree(pb, ignore_errors=True)
    fruit = ["apple", "apricot", "banana", "blueberry", "cherry",
             "citrus"]
    from .sources.lakehouse_util import local_rows_df

    write_iceberg_commit(
        spark, pb,
        local_rows_df(
            spark, [(i, fruit[i % 6]) for i in range(24)],
            "id int, name string",
        ),
        partition_transforms=[("name_tr", "name", "truncate[2]")],
    )
    k4 = iceberg_plan_files(pa, where="k = 4", spark=spark)
    k7 = iceberg_plan_files(
        pa, where="k = 7 AND d = '2024-03-02'", spark=spark
    )
    ba = iceberg_plan_files(pb, where="name = 'banana'", spark=spark)
    rows_k4 = read_iceberg(spark, pa, where="k = 4").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("id").cast("long").alias("s"),
    ).collect()[0]
    rows_k7 = read_iceberg(
        spark, pa, where="k = 7 AND d = '2024-03-02'"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("id").cast("long").alias("s"),
    ).collect()[0]
    rows_ba = read_iceberg(spark, pb, where="name = 'banana'").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("id").cast("long").alias("s"),
    ).collect()[0]
    return _lrd(spark, 
        [
            ("plan_k4", k4[0], k4[1]),
            ("plan_k7_d2", k7[0], k7[1]),
            ("plan_name_ba", ba[0], ba[1]),
            ("rows_k4", rows_k4["n"], rows_k4["s"]),
            ("rows_k7_d2", rows_k7["n"], rows_k7["s"]),
            ("rows_name_ba", rows_ba["n"], rows_ba["s"]),
        ],
        "scope string, a bigint, b bigint",
    ).orderBy("scope")


# ---------------------------------------------------------------------------
# q476: Iceberg Avro data files — mixed-format snapshots, field-id attrs
# ---------------------------------------------------------------------------
#
# Fixture (closed-form): snapshot 1 writes ids 0..9 (val = id * 2) as
# PARQUET; snapshot 2 appends ids 100..105 (val = id * 3) as AVRO
# containers (stdlib codec, per-field `field-id` attributes stamped —
# the spec requires them); the schema then evolves (val RENAMED to
# score, bonus ADDED).  The read must union one parquet leg (field-id
# parquet resolution) with one Avro leg (binaryFile + mapInArrow
# decode, resolution by the Avro field-id attributes) — the rename
# resolves across BOTH formats, bonus reads null everywhere.


@query(
    "q476_iceberg_avro_files",
    oracle="""
    WITH pq AS (SELECT unnest(range(0, 10)) AS id),
    av AS (SELECT 100 + unnest(range(0, 6)) AS id),
    cur AS (SELECT id, id * 2 AS score, 'parquet' AS fmt FROM pq
            UNION ALL SELECT id, id * 3, 'avro' FROM av)
    SELECT fmt, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(id) AS BIGINT) AS id_sum,
           CAST(sum(score) AS BIGINT) AS score_sum,
           CAST(count(NULL) AS BIGINT) AS bonus_n
    FROM cur GROUP BY fmt ORDER BY fmt
    """,
)
def q476_iceberg_avro_files(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iceberg AVRO data files (round 12 — sources/iceberg.py
    _avro_files_scan + the avro writer half): snapshots may mix
    parquet and Avro data files; Avro files decode on executors
    (binaryFile scan, one task per file, stdlib container codec in
    mapInArrow) with columns resolved by the writer schema's
    per-field `field-id` attributes — the spec requires them, so
    id-less Avro files refuse loudly — which makes renames and added
    columns resolve across both formats identically.  Avro entries
    carry no column bounds; metadata pruning keeps them (advisory
    contract).  ORC stays gated loud (a new codec, separate
    decision)."""
    import shutil

    from .catalog_sources import _scratch
    from .sources.iceberg import (
        evolve_iceberg_schema,
        read_iceberg,
        write_iceberg_commit,
    )

    path = _scratch("iceberg_avro_files", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    write_iceberg_commit(
        spark, path,
        _lrd(spark, [(i, i * 2) for i in range(0, 10)], "id int, val int"),
    )
    write_iceberg_commit(
        spark, path,
        _lrd(spark, [(i, i * 3) for i in range(100, 106)], "id int, val int").coalesce(2),
        file_format="avro",
    )
    evolve_iceberg_schema(
        path, renames={"val": "score"}, adds=[("bonus", "int")]
    )
    return (
        read_iceberg(spark, path)
        .withColumn(
            "fmt",
            F.when(F.col("id") >= 100, F.lit("avro"))
            .otherwise(F.lit("parquet")),
        )
        .groupBy("fmt")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("id").cast("long").alias("id_sum"),
            F.sum("score").cast("long").alias("score_sum"),
            F.count("bonus").alias("bonus_n"),
        )
        .orderBy("fmt")
    )


# ---------------------------------------------------------------------------
# q477: Delta CDF as a Structured Streaming SOURCE — offsets, restart, silence
# ---------------------------------------------------------------------------
#
# Fixture (closed-form): a CDF table takes v0 insert ids 0..11
# (v = 10*id), v1 insert ids 100..102 (v = 0/10/20), v2 UPDATE id=5
# (v 50 -> 51, cdc pre/post images), v3 DELETE id=7 (cdc).  Run 1
# (availableNow) streams versions 0..3 into a parquet sink: 18 rows.
# Then v4 inserts ids 200..201 (v = 0) and v5 is a dataChange=false
# OPTIMIZE; run 2 RESUMES FROM SPARK'S CHECKPOINT and appends exactly
# the v4 inserts (2 rows) — the compaction version is silent, and
# nothing from v0..v3 replays.  Census by _change_type over the final
# sink: insert n=17 v_sum=690, update_preimage 1/50,
# update_postimage 1/51, delete 1/70; meta row pins run-1 rows (18),
# run-2 delta (2), and compaction-version rows (0).


@query(
    "q477_delta_cdf_stream",
    oracle="""
    WITH facts AS (
      SELECT 'c_delete' AS scope, 1 AS n, 70 AS v_sum
      UNION ALL SELECT 'c_insert', 17, 690
      UNION ALL SELECT 'c_update_preimage', 1, 50
      UNION ALL SELECT 'c_update_postimage', 1, 51
      UNION ALL SELECT 'meta', 18, 2)
    SELECT scope, CAST(n AS BIGINT) AS n, CAST(v_sum AS BIGINT) AS v_sum
    FROM facts ORDER BY scope
    """,
)
def q477_delta_cdf_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delta Change Data Feed as a true streaming source (round 12 —
    streaming/lakehouse.py DeltaCDFStreamSource): offsets are commit
    versions persisted in Spark's checkpoint WAL, partitions() plans
    one task per change file for the versions in (start, end] (an
    idle trigger plans zero tasks; a 10k-file batch becomes 10k
    tasks), read() decodes parquet -> Arrow on executors, and
    dataChange=false maintenance commits are silent.  Closes the
    round-11 verdict's last open gap (batch-only lakehouse CDC)."""
    import shutil

    from .catalog_sources import _scratch
    from .sources.delta import (
        compact_delta_files,
        delete_delta_rows_cdf,
        update_delta_rows_cdf,
        write_delta_commit,
    )
    from .streaming.lakehouse import register_lakehouse_streams

    register_lakehouse_streams(spark)
    root = _scratch("delta_cdf_stream", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    path = f"{root}/tbl"
    sink = f"{root}/sink"
    ckpt = f"{root}/ckpt"

    def run():
        q = (
            spark.readStream.format("delta_cdf_stream")
            .option("path", path).load()
            .writeStream.format("parquet").option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(300)
        return spark.read.parquet(sink)

    write_delta_commit(
        spark, path,
        _lrd(spark, [(i, i * 10) for i in range(0, 12)], "id int, v long"),
        enable_cdf=True,
    )
    write_delta_commit(
        spark, path,
        _lrd(spark, [(i + 100, i * 10) for i in range(0, 3)], "id int, v long"),
    )
    update_delta_rows_cdf(spark, path, "id = 5", {"v": "v + 1"})
    delete_delta_rows_cdf(spark, path, "id = 7")
    run1_rows = run().count()

    write_delta_commit(
        spark, path,
        _lrd(spark, [(i + 200, 0) for i in range(0, 2)], "id int, v long"),
    )
    v_compact = compact_delta_files(spark, path)
    final = run()
    run2_delta = final.count() - run1_rows
    compact_rows = final.where(
        F.col("_commit_version") == v_compact
    ).count()

    census = (
        final.groupBy("_change_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").cast("long").alias("v_sum"),
        )
        .select(
            F.concat(F.lit("c_"), F.col("_change_type")).alias("scope"),
            "n", "v_sum",
        )
    )
    meta = _lrd(spark, 
        [("meta", run1_rows, run2_delta + compact_rows)],
        "scope string, n bigint, v_sum bigint",
    )
    return census.unionByName(meta).orderBy("scope")


# ---------------------------------------------------------------------------
# q478: Iceberg appends as a Structured Streaming SOURCE across evolution
# ---------------------------------------------------------------------------
#
# Fixture (closed-form): snapshot 1 appends ids 0..9 (p = id % 2,
# val = 2*id) under an identity partition spec; the schema then
# RENAMES val -> score; snapshot 2 appends ids 100..104 (score =
# 3*(id-100)); run 1 streams both snapshots (15 rows — snapshot-1
# files resolve the renamed column THROUGH PARQUET FIELD IDS, and the
# identity partition value injects per file).  Snapshot 3 appends ids
# 500..502 (p = 0, score = 7); run 2 resumes from the checkpoint and
# appends exactly those 3.  Offsets are snapshot SEQUENCE NUMBERS
# (stable under snapshot expiry, unlike ordinals).  Census by p:
# p=0 n=11 score_sum=79, p=1 n=7 score_sum=62; meta pins run-1 rows
# (15), distinct _snapshot_id count (3).


@query(
    "q478_iceberg_append_stream",
    oracle="""
    WITH facts AS (
      SELECT 'meta' AS scope, -1 AS p, 15 AS n, 3 AS x
      UNION ALL SELECT 'p', 0, 11, 79
      UNION ALL SELECT 'p', 1, 7, 62)
    SELECT scope, CAST(p AS BIGINT) AS p, CAST(n AS BIGINT) AS n,
           CAST(x AS BIGINT) AS x
    FROM facts ORDER BY scope, p
    """,
)
def q478_iceberg_append_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iceberg appends as a true streaming source (round 12 —
    streaming/lakehouse.py IcebergAppendStreamSource): offsets are
    snapshot sequence numbers, planning walks manifest lists ->
    manifests with the pure stdlib Avro codec (no SparkSession exists
    in the datasource planner process), one task per ADDED data file,
    executor-side parquet->Arrow reads resolving columns by parquet
    field id (renames read correctly across the stream), identity
    partition values injected per file, and non-append snapshots
    refuse loudly at the trigger."""
    import shutil

    from .catalog_sources import _scratch
    from .sources.iceberg import (
        evolve_iceberg_schema,
        write_iceberg_commit,
    )
    from .streaming.lakehouse import register_lakehouse_streams

    register_lakehouse_streams(spark)
    root = _scratch("iceberg_append_stream", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    path = f"{root}/tbl"
    sink = f"{root}/sink"
    ckpt = f"{root}/ckpt"

    def run():
        q = (
            spark.readStream.format("iceberg_append_stream")
            .option("path", path).load()
            .writeStream.format("parquet").option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(300)
        return spark.read.parquet(sink)

    write_iceberg_commit(
        spark, path,
        _lrd(spark, [(i, i % 2, i * 2) for i in range(0, 10)], "id long, p int, val long"),
        partition_by=["p"],
    )
    evolve_iceberg_schema(path, renames={"val": "score"})
    write_iceberg_commit(
        spark, path,
        _lrd(spark, [(i + 100, i % 2, i * 3) for i in range(0, 5)], "id long, p int, score long"),
        partition_by=["p"],
    )
    run1_rows = run().count()

    write_iceberg_commit(
        spark, path,
        _lrd(spark, [(i + 500, 0, 7) for i in range(0, 3)], "id long, p int, score long"),
        partition_by=["p"],
    )
    final = run()
    n_snaps = final.select("_snapshot_id").distinct().count()

    census = (
        final.groupBy("p")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("score").cast("long").alias("x"),
        )
        .select(
            F.lit("p").alias("scope"), F.col("p").cast("long").alias("p"),
            "n", "x",
        )
    )
    meta = _lrd(spark, 
        [("meta", -1, run1_rows, n_snaps)],
        "scope string, p bigint, n bigint, x bigint",
    )
    return census.unionByName(meta).orderBy("scope", "p")


# ---------------------------------------------------------------------------
# q479: Hudi incremental as a Structured Streaming SOURCE (COW provenance)
# ---------------------------------------------------------------------------
#
# Fixture (closed-form): commit 1 inserts ids 0..7 (v = 10*id,
# sum 280), commit 2 inserts ids 100..102 (v = 5, sum 15); run 1
# streams both (11 rows, v_sum 295).  Commit 3 inserts ids 200..201
# (v = 9, sum 18); run 2 resumes and appends exactly those 2.
# Offsets are completed commit instants; a batch's tasks are the file
# slices REWRITTEN in the range (slices whose instant predates the
# range never become tasks), and each row's _hoodie_commit_time
# filters it into exactly one batch.  Final: 13 rows, v_sum 313,
# 3 distinct commit instants.


@query(
    "q479_hudi_incr_stream",
    oracle="""
    WITH facts AS (
      SELECT 'final' AS scope, 13 AS n, 313 AS v_sum
      UNION ALL SELECT 'instants', 3, 3
      UNION ALL SELECT 'run1', 11, 295)
    SELECT scope, CAST(n AS BIGINT) AS n, CAST(v_sum AS BIGINT) AS v_sum
    FROM facts ORDER BY scope
    """,
)
def q479_hudi_incr_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hudi COPY_ON_WRITE incremental pulls as a true streaming
    source (round 12 — streaming/lakehouse.py
    HudiIncrementalStreamSource): offsets are completed commit
    instants from the .hoodie timeline, planning lists live file
    slices and keeps only those rewritten inside (start, end] (a
    batch's task count is O(changed file groups), not O(table)),
    executors filter rows by _hoodie_commit_time so carried rows
    never re-emit, and MERGE_ON_READ / meta-field-less tables refuse
    loudly at the trigger."""
    import shutil

    from .catalog_sources import _scratch
    from .sources.hudi import write_hudi_commit
    from .streaming.lakehouse import register_lakehouse_streams

    register_lakehouse_streams(spark)
    root = _scratch("hudi_incr_stream", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    path = f"{root}/tbl"
    sink = f"{root}/sink"
    ckpt = f"{root}/ckpt"

    def run():
        q = (
            spark.readStream.format("hudi_incr_stream")
            .option("path", path).load()
            .writeStream.format("parquet").option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(300)
        return spark.read.parquet(sink)

    write_hudi_commit(
        spark, path,
        _lrd(spark, [(i, i * 10) for i in range(0, 8)], "id long, v long"),
        meta_fields=True,
    )
    write_hudi_commit(
        spark, path,
        _lrd(spark, [(i + 100, 5) for i in range(0, 3)], "id long, v long"),
        meta_fields=True,
    )
    r1 = run()
    run1 = r1.agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("v_sum")
    ).collect()[0]

    write_hudi_commit(
        spark, path,
        _lrd(spark, [(i + 200, 9) for i in range(0, 2)], "id long, v long"),
        meta_fields=True,
    )
    final = run()
    n_instants = final.select("_hoodie_commit_time").distinct().count()

    rows = [
        ("run1", int(run1["n"]), int(run1["v_sum"])),
        ("instants", n_instants, n_instants),
    ]
    meta = _lrd(spark, 
        rows, "scope string, n bigint, v_sum bigint"
    )
    fin = final.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").cast("long").alias("v_sum"),
    ).select(F.lit("final").alias("scope"), "n", "v_sum")
    return fin.unionByName(meta).orderBy("scope")


# ---------------------------------------------------------------------------
# q480: Delta exactly-once streaming SINK (txn identifiers)
# ---------------------------------------------------------------------------
#
# Fixture (closed-form): a parquet source dir holds ids 0..9
# (v = 2*id, sum 90).  Run 1 streams it into a Delta table through
# delta_stream_sink(app_id) — each micro-batch commits with a txn
# action (appId, batchId) per PROTOCOL.md Transaction Identifiers.
# Three more rows (v = 9 each) arrive; run 2 resumes from the same
# checkpoint and appends exactly them (13 rows, v_sum 117).  A
# simulated RETRY then re-delivers the last batch under its old batch
# id — the recorded txn version skips it (census unchanged) — and a
# genuinely new batch id (3 rows, v = 9) commits (16 rows, v_sum
# 144).  The txn watermark equals the last committed batch id.


@query(
    "q480_delta_stream_sink",
    oracle="""
    WITH facts AS (
      SELECT 'after_dup' AS scope, 13 AS n, 117 AS v_sum
      UNION ALL SELECT 'final', 16, 144
      UNION ALL SELECT 'run1', 10, 90
      UNION ALL SELECT 'run2', 13, 117)
    SELECT scope, CAST(n AS BIGINT) AS n, CAST(v_sum AS BIGINT) AS v_sum
    FROM facts ORDER BY scope
    """,
)
def q480_delta_stream_sink(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delta as an exactly-once streaming SINK (round 12 —
    streaming/lakehouse.py delta_stream_sink): foreachBatch commits
    each micro-batch through write_delta_commit with a txn action
    (appId, batchId); a retried batch finds its id already recorded
    and skips, so a crash between sink-commit and WAL advance can
    never double-apply — the PROTOCOL.md Transaction Identifiers
    contract, the write-side twin of the q477 CDF source."""
    import shutil

    from .catalog_sources import _scratch
    from .sources.delta import read_delta, write_delta_commit
    from .streaming.lakehouse import (
        delta_last_txn_version,
        delta_stream_sink,
    )

    root = _scratch("delta_stream_sink", sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    src = f"{root}/src"
    tbl = f"{root}/tbl"
    ckpt = f"{root}/ckpt"

    def census(scope):
        row = read_delta(spark, tbl).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").cast("long").alias("v_sum"),
        ).collect()[0]
        return (scope, int(row["n"]), int(row["v_sum"]))

    spark.range(0, 10, 1, 1).select(
        F.col("id").cast("long").alias("id"),
        (F.col("id") * 2).cast("long").alias("v"),
    ).write.parquet(src)
    stream = spark.readStream.schema("id bigint, v bigint").parquet(src)
    delta_stream_sink(
        stream, tbl, app_id="q480", checkpoint=ckpt
    ).awaitTermination(300)
    rows = [census("run1")]

    spark.range(100, 103, 1, 1).select(
        F.col("id").cast("long").alias("id"),
        F.lit(9).cast("long").alias("v"),
    ).write.mode("append").parquet(src)
    stream = spark.readStream.schema("id bigint, v bigint").parquet(src)
    delta_stream_sink(
        stream, tbl, app_id="q480", checkpoint=ckpt
    ).awaitTermination(300)
    rows.append(census("run2"))

    last = delta_last_txn_version(tbl, "q480")
    dup = _lrd(spark, [(i + 100, 9) for i in range(0, 3)], "id long, v long")

    def replay(batch_df, batch_id):
        lastv = delta_last_txn_version(tbl, "q480")
        if lastv is not None and batch_id <= lastv:
            return
        write_delta_commit(
            spark, tbl, batch_df, txn=("q480", batch_id)
        )

    replay(dup, last)  # duplicate delivery: skipped
    rows.append(census("after_dup"))
    replay(
        _lrd(spark, [(i + 200, 9) for i in range(0, 3)], "id long, v long"),
        last + 1,
    )
    rows.append(census("final"))
    return (
        _lrd(spark, 
            rows, "scope string, n bigint, v_sum bigint"
        ).orderBy("scope")
    )


# ---------------------------------------------------------------------------
# q481: Hudi cleaner — the maintenance triad's third leg
# ---------------------------------------------------------------------------
#
# Fixture (closed-form): file group A (partition p=0) takes three
# full-group versions — v = 10*id, 100*id, 1000*id over ids 0..3 —
# while group B (p=1, ids 0..2, v = 7) is written at the first
# instant and never touched.  clean_hudi(keep_last=2) sets the
# horizon at the second instant: A's first version is physically
# deleted (1 file), B's only version SURVIVES (it is B's state at
# every retained instant), and a .clean instant records the horizon.
# Latest census: p0 n=4 v_sum=6000, p1 n=3 v_sum=21; time travel to
# the horizon: p0 v_sum=600; below-horizon travel refuses (pinned in
# tests); 3 parquet files remain.


@query(
    "q481_hudi_clean",
    oracle="""
    WITH facts AS (
      SELECT 'asof2' AS scope, 0 AS p, 4 AS n, 600 AS v_sum
      UNION ALL SELECT 'asof2', 1, 3, 21
      UNION ALL SELECT 'latest', 0, 4, 6000
      UNION ALL SELECT 'latest', 1, 3, 21
      UNION ALL SELECT 'meta', -1, 1, 3)
    SELECT scope, CAST(p AS INT) AS p, CAST(n AS BIGINT) AS n,
           CAST(v_sum AS BIGINT) AS v_sum
    FROM facts ORDER BY scope, p
    """,
)
def q481_hudi_clean(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hudi cleaner (round 12 — sources/hudi.py clean_hudi,
    KEEP_LATEST_COMMITS shape): base-file slice versions no retained
    instant can serve are physically deleted — per file group the
    versions at/after the horizon survive, and an untouched group's
    newest pre-horizon version survives because it IS the group's
    state at every retained instant.  A .clean timeline instant
    records the horizon; time travel below it refuses loudly instead
    of silently dropping vanished groups.  Completes the maintenance
    triad: Delta OPTIMIZE/VACUUM (q467), Iceberg snapshot expiry
    (q468), Hudi clean."""
    import os as _os
    import shutil

    from .catalog_sources import _scratch
    from .sources.hudi import (
        clean_hudi,
        hudi_snapshot_files,
        read_hudi,
        write_hudi_commit,
    )

    path = _scratch("hudi_clean", sf_dir)
    shutil.rmtree(path, ignore_errors=True)

    def mk(mult):
        return _lrd(spark, [(i, 0, i * mult) for i in range(0, 4)], "id long, p int, v long")

    write_hudi_commit(
        spark, path,
        _lrd(
            spark,
            [(i, 0, i * 10) for i in range(0, 4)]
            + [(i, 1, 7) for i in range(0, 3)],
            "id long, p int, v long",
        ),
        partition_by=["p"], meta_fields=True,
    )
    fid = next(
        _os.path.basename(f).split("_")[0]
        for part, f in hudi_snapshot_files(path) if part == "p=0"
    )
    t2 = write_hudi_commit(
        spark, path, mk(100),
        partition_by=["p"], upsert_into={"p=0": fid}, meta_fields=True,
    )
    write_hudi_commit(
        spark, path, mk(1000),
        partition_by=["p"], upsert_into={"p=0": fid}, meta_fields=True,
    )
    n_deleted = clean_hudi(path, keep_last=2)
    n_files = sum(
        1 for root, _d, files in _os.walk(path)
        if ".hoodie" not in root
        for f in files if f.endswith(".parquet")
    )

    def census(df, scope):
        return df.groupBy("p").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").cast("long").alias("v_sum"),
        ).select(
            F.lit(scope).alias("scope"),
            F.col("p").cast("int").alias("p"), "n", "v_sum",
        )

    latest = census(read_hudi(spark, path), "latest")
    asof2 = census(read_hudi(spark, path, as_of=t2), "asof2")
    meta = _lrd(spark, 
        [("meta", -1, n_deleted, n_files)],
        "scope string, p int, n bigint, v_sum bigint",
    )
    return (
        latest.unionByName(asof2).unionByName(meta)
        .orderBy("scope", "p")
    )


# ---------------------------------------------------------------------------
# q482: Iceberg refs — branches/tags, protected expiry
# ---------------------------------------------------------------------------
#
# Fixture (closed-form): three single-file snapshots (ids 0..3 /
# 10..13 / 20..23).  Tag `v1` pins snapshot 1, branch `audit` points
# at snapshot 2.  Censuses: v1 n=4 id_sum=6, audit n=8 id_sum=52,
# main n=12 id_sum=138.  expire(keep_last=1) removes NOTHING — both
# refs protect their snapshots (the spec's retention rule).  Dropping
# the branch releases snapshot 2: the next expiry removes exactly its
# manifest list + manifest (2 files; its data file survives —
# snapshot 3's full-rewrite manifest still references it) while the
# tag still answers.  Dropping the tag releases snapshot 1 (2 more
# files), one snapshot remains, and main still reads all 12 rows.


@query(
    "q482_iceberg_refs",
    oracle="""
    WITH facts AS (
      SELECT 'audit' AS scope, 8 AS n, 52 AS id_sum
      UNION ALL SELECT 'main', 12, 138
      UNION ALL SELECT 'main_final', 12, 138
      UNION ALL SELECT 'meta_a', 0, 2
      UNION ALL SELECT 'meta_b', 2, 1
      UNION ALL SELECT 'v1', 4, 6
      UNION ALL SELECT 'v1_after_expiry', 4, 6)
    SELECT scope, CAST(n AS BIGINT) AS n, CAST(id_sum AS BIGINT) AS id_sum
    FROM facts ORDER BY scope
    """,
)
def q482_iceberg_refs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iceberg branches and tags (round 12 — sources/iceberg.py
    set_iceberg_ref/resolve_iceberg_ref, the spec's v2 `refs`
    metadata map): a TAG is an immutable bookmark (release audits,
    reproducible training snapshots), a BRANCH a movable head, and
    `main` tracks current-snapshot-id.  read_iceberg(ref=) resolves
    through the map, and refs PROTECT their snapshots from
    expire_iceberg_snapshots until dropped — the spec's retention
    rule and the reason refs exist operationally."""
    import shutil

    from .catalog_sources import _scratch
    from .sources.iceberg import (
        expire_iceberg_snapshots,
        read_iceberg,
        set_iceberg_ref,
        write_iceberg_commit,
        _load_metadata,
    )

    path = _scratch("iceberg_refs", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    sids = []
    for k in range(3):
        sids.append(write_iceberg_commit(
            spark, path,
            _lrd(spark, [(i + 10 * k, k) for i in range(0, 4)], "id long, v long"),
        ))
    set_iceberg_ref(path, "v1", ref_type="tag", snapshot_id=sids[0])
    set_iceberg_ref(
        path, "audit", ref_type="branch", snapshot_id=sids[1]
    )

    def census(df, scope):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("id").cast("long").alias("id_sum"),
        ).select(F.lit(scope).alias("scope"), "n", "id_sum")

    out = census(read_iceberg(spark, path, ref="v1"), "v1")
    out = out.unionByName(
        census(read_iceberg(spark, path, ref="audit"), "audit")
    )
    out = out.unionByName(
        census(read_iceberg(spark, path, ref="main"), "main")
    )
    removed1 = expire_iceberg_snapshots(path, keep_last=1)  # 0: protected
    set_iceberg_ref(path, "audit", drop=True)
    removed2 = expire_iceberg_snapshots(path, keep_last=1)  # s2 released
    out = out.unionByName(
        census(read_iceberg(spark, path, ref="v1"), "v1_after_expiry")
    )
    set_iceberg_ref(path, "v1", drop=True)
    removed3 = expire_iceberg_snapshots(path, keep_last=1)  # s1 released
    n_snaps = len(_load_metadata(path)[0].get("snapshots") or [])
    out = out.unionByName(
        census(read_iceberg(spark, path), "main_final")
    )
    meta = _lrd(spark, 
        [("meta_a", removed1, removed2), ("meta_b", removed3, n_snaps)],
        "scope string, n bigint, id_sum bigint",
    )
    return out.unionByName(meta).orderBy("scope")


# ---------------------------------------------------------------------------
# q483: Iceberg ORC data files — field-id attributes, stats pruning, deletes
# ---------------------------------------------------------------------------
#
# Fixture (closed-form): commit A writes ids 0..9 (val = 2*id) as ONE
# parquet file; the schema evolves (val RENAMED to score, bonus
# ADDED); commit B appends ids 100..105 (score = 3*id, bonus = id%5)
# as TWO ORC files (file_format='orc' — iceberg.id type attributes
# stamped per ORC-529, footer statistics recorded as manifest
# bounds).  A position delete tombstones ordinal 0 of the first ORC
# file (id=100, captured through the ORC leg's record-ordinal
# __ice_pos).  Census by format: parquet n=10 score_sum=90 (renamed
# column resolves BY ID from pre-evolution bytes, bonus all-null),
# orc n=5 score_sum=1545 bonus_sum=10; `id >= 103` plans 1/3 files —
# the ORC FOOTER statistics prune exactly like parquet row-group
# stats (the stdlib tail parser supplies them).


@query(
    "q483_iceberg_orc_files",
    oracle="""
    WITH facts AS (
      SELECT 'fmt_orc' AS scope, 5 AS n, 1545 AS score_sum,
             CAST(10 AS BIGINT) AS bonus_sum, 5 AS bonus_n
      UNION ALL SELECT 'fmt_parquet', 10, 90, CAST(NULL AS BIGINT), 0
      UNION ALL SELECT 'plan_id_103', 1, 3, 0, 0)
    SELECT scope, CAST(n AS BIGINT) AS n,
           CAST(score_sum AS BIGINT) AS score_sum,
           CAST(bonus_sum AS BIGINT) AS bonus_sum,
           CAST(bonus_n AS BIGINT) AS bonus_n
    FROM facts ORDER BY scope
    """,
)
def q483_iceberg_orc_files(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iceberg ORC data files (round 12 — sources/orc.py +
    sources/iceberg.py _orc_files_scan/_orc_bounds): snapshots may
    mix parquet, Avro AND ORC data files.  The ORC data plane rides
    pyarrow.orc on executors (binaryFile scan, one task per file);
    the PROTOCOL metadata rides a pure-stdlib tail parser (PostScript
    + Footer protobuf, validated against pyarrow-written files) —
    iceberg.id TYPE ATTRIBUTES (ORC-529) resolve columns by field id
    so renames read identically across all three formats, and the
    footer column statistics feed manifest bounds so ORC files prune
    at the metadata layer exactly like parquet.  Position deletes
    apply to the ORC leg via the record-ordinal capture; ORC delete
    files and partitioned ORC writes refuse loudly.  Closes the last
    named format gap (round-11 verdict item 4's ORC half)."""
    import glob as _glob
    import shutil

    from .catalog_sources import _scratch
    from .sources.iceberg import (
        evolve_iceberg_schema,
        iceberg_plan_files,
        read_iceberg,
        write_iceberg_commit,
        write_iceberg_position_deletes,
    )

    path = _scratch("iceberg_orc_files", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    write_iceberg_commit(
        spark, path,
        _lrd(spark, [(i, i * 2) for i in range(0, 10)], "id int, val int"),
    )
    evolve_iceberg_schema(
        path, renames={"val": "score"}, adds=[("bonus", "int")]
    )
    write_iceberg_commit(
        spark, path,
        spark.range(100, 106, 1, 2).select(
            F.col("id").cast("int").alias("id"),
            (F.col("id") * 3).cast("int").alias("score"),
            (F.col("id") % 5).cast("int").alias("bonus"),
        ).coalesce(2),
        file_format="orc",
    )
    f0 = sorted(_glob.glob(f"{path}/data/*.orc"))[0]
    write_iceberg_position_deletes(spark, path, [(f0, 0)])
    kept, total = iceberg_plan_files(path, where="id >= 103")

    census = (
        read_iceberg(spark, path)
        .groupBy(
            F.concat(
                F.lit("fmt_"),
                F.when(F.col("id") >= 100, F.lit("orc"))
                .otherwise(F.lit("parquet")),
            ).alias("scope")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("score").cast("long").alias("score_sum"),
            F.sum("bonus").cast("long").alias("bonus_sum"),
            F.count("bonus").alias("bonus_n"),
        )
    )
    plan = _lrd(spark, 
        [("plan_id_103", kept, total, 0, 0)],
        "scope string, n bigint, score_sum bigint, bonus_sum bigint, "
        "bonus_n bigint",
    )
    return census.unionByName(plan).orderBy("scope")


# ---------------------------------------------------------------------------
# q484: Iceberg WAP — write-audit-publish on a branch, plus rollback
# ---------------------------------------------------------------------------
#
# Fixture (closed-form): main holds ids 0..4 (sum 10).  A `staging`
# branch takes two commits (ids 100..102 then 200..201) while main
# stays untouched — the audit reads the branch (n=10, id_sum=714),
# main still answers 5/10.  fast_forward_iceberg publishes (main
# now 10/714; ancestry proven through the writer's
# parent-snapshot-id links), then rollback_iceberg returns main to
# the first snapshot (5/10) with every newer snapshot still
# time-travelable.


@query(
    "q484_iceberg_wap",
    oracle="""
    WITH facts AS (
      SELECT 'main_before' AS scope, 5 AS n, 10 AS id_sum
      UNION ALL SELECT 'published', 10, 714
      UNION ALL SELECT 'rolled_back', 5, 10
      UNION ALL SELECT 'staging', 10, 714)
    SELECT scope, CAST(n AS BIGINT) AS n, CAST(id_sum AS BIGINT) AS id_sum
    FROM facts ORDER BY scope
    """,
)
def q484_iceberg_wap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iceberg write-audit-publish (round 12 — sources/iceberg.py
    write_iceberg_commit(branch=) / fast_forward_iceberg /
    rollback_iceberg): commits on a BRANCH build on the branch head's
    live entries and advance only the branch ref — main readers see
    nothing until the publish step fast-forwards main to the branch
    head, which refuses unless main's snapshot is an ANCESTOR
    (parent-snapshot-id walk; anything else would silently drop
    main-side commits).  Rollback is the metadata-only inverse: main
    returns to an older snapshot, newer ones stay time-travelable.
    The WAP pattern is how real pipelines gate data quality."""
    import shutil

    from .catalog_sources import _scratch
    from .sources.iceberg import (
        fast_forward_iceberg,
        read_iceberg,
        rollback_iceberg,
        set_iceberg_ref,
        write_iceberg_commit,
    )

    path = _scratch("iceberg_wap", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    s1 = write_iceberg_commit(
        spark, path,
        _lrd(spark, [(i,) for i in range(0, 5)], "id long"),
    )
    set_iceberg_ref(path, "staging", ref_type="branch")
    write_iceberg_commit(
        spark, path,
        _lrd(spark, [(i,) for i in range(100, 103)], "id long"),
        branch="staging",
    )
    write_iceberg_commit(
        spark, path,
        _lrd(spark, [(i,) for i in range(200, 202)], "id long"),
        branch="staging",
    )

    def census(df, scope):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("id").cast("long").alias("id_sum"),
        ).select(F.lit(scope).alias("scope"), "n", "id_sum")

    out = census(read_iceberg(spark, path), "main_before")
    out = out.unionByName(
        census(read_iceberg(spark, path, ref="staging"), "staging")
    )
    fast_forward_iceberg(path, "staging")
    out = out.unionByName(
        census(read_iceberg(spark, path), "published")
    )
    rollback_iceberg(path, s1)
    out = out.unionByName(
        census(read_iceberg(spark, path), "rolled_back")
    )
    return out.orderBy("scope")


# ---------------------------------------------------------------------------
# q485: Delta RESTORE — old version reconstructed as a new commit
# ---------------------------------------------------------------------------
#
# Fixture (closed-form): v0 inserts ids 0..4 (sum 10), v1 inserts ids
# 10..12 (table now 8 rows, sum 43).  RESTORE to version 0 appends
# commit v2 removing v1's files: the table answers 5/10 again, while
# time travel to v1 (above the restore) still reads 8/43 — the
# restore is itself a version, exactly like the real operation.  The
# restore version is pinned (2).


@query(
    "q485_delta_restore",
    oracle="""
    WITH facts AS (
      SELECT 'meta' AS scope, 2 AS n, 0 AS id_sum
      UNION ALL SELECT 'pre_restore', 8, 43
      UNION ALL SELECT 'restored', 5, 10)
    SELECT scope, CAST(n AS BIGINT) AS n, CAST(id_sum AS BIGINT) AS id_sum
    FROM facts ORDER BY scope
    """,
)
def q485_delta_restore(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delta RESTORE (round 12 — sources/delta.py restore_delta, the
    public RESTORE TABLE ... TO VERSION AS OF): one appended commit
    removes files live now but absent at the target and re-adds files
    live at the target but absent now — metadata-only surgery, data
    files never move, and the pre-restore state stays readable above
    the restore commit.  Schema/configuration differences re-emit the
    target metaData; CDF tables and vacuumed-away targets refuse
    loudly."""
    import shutil

    from .catalog_sources import _scratch
    from .sources.delta import (
        read_delta,
        restore_delta,
        write_delta_commit,
    )

    path = _scratch("delta_restore", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    write_delta_commit(
        spark, path,
        _lrd(spark, [(i,) for i in range(0, 5)], "id long"),
    )
    write_delta_commit(
        spark, path,
        _lrd(spark, [(i,) for i in range(10, 13)], "id long"),
    )
    v_restore = restore_delta(spark, path, version=0)

    def census(df, scope):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("id").cast("long").alias("id_sum"),
        ).select(F.lit(scope).alias("scope"), "n", "id_sum")

    out = census(read_delta(spark, path), "restored")
    out = out.unionByName(
        census(
            read_delta(spark, path, version=v_restore - 1),
            "pre_restore",
        )
    )
    meta = _lrd(spark, 
        [("meta", v_restore, 0)], "scope string, n bigint, id_sum bigint"
    )
    return out.unionByName(meta).orderBy("scope")
