"""Catalog round 10: lakehouse read-gate closures.

The round-9 verdict ranked the remaining lakehouse gates by how often
a switching user hits them: Iceberg format-v2 position deletes (q455 —
modern engines write v2 by default), Hudi merge-on-read log replay
(q456), and Delta column mapping in 'name' mode (q458).  Each follows
the q451-q453 discipline: a protocol-shaped fixture table written by
the repo's own writer half, read back through the real reader path
(one distributed scan + broadcast-map re-injection), with a
closed-form DuckDB oracle replaying the snapshot algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .catalog import query, table
from .sources.lakehouse_util import local_rows_df as _lrd

__all__: list[str] = []


# ---------------------------------------------------------------------------
# q455: Iceberg v2 position deletes — anti-join on (file, row position)
# ---------------------------------------------------------------------------
#
# Fixture (closed-form): snapshot A writes ids 0..29 (p = id % 3);
# snapshot B appends ids 100..108; snapshot C position-deletes every
# row with id % 7 == 3 (ids 3,10,17,24,101,108), with the (file, pos)
# pairs taken from a _metadata.row_index scan — exactly how real
# engines produce delete files.  Output: per-partition census at the
# current snapshot (deletes applied) and at pre-delete snapshot B.


@query(
    "q455_iceberg_pos_deletes",
    oracle="""
    WITH c0 AS (SELECT unnest(range(0, 30)) AS id),
    c1 AS (SELECT 100 + unnest(range(0, 9)) AS id),
    pre AS (SELECT id, id % 3 AS p FROM c0
            UNION ALL SELECT id, id % 3 AS p FROM c1),
    cur AS (SELECT id, p FROM pre WHERE id % 7 <> 3),
    snaps AS (SELECT 'current' AS snap, p, id FROM cur
              UNION ALL SELECT 'pre' AS snap, p, id FROM pre)
    SELECT snap, CAST(p AS INT) AS p,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(id) AS BIGINT) AS id_sum
    FROM snaps GROUP BY snap, p ORDER BY snap, p
    """,
)
def q455_iceberg_pos_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg format-v2 POSITION deletes (round 10 —
    sources/iceberg.py, the public table spec): delete manifests walk
    next to data manifests and their (file_path, pos) parquet
    tombstones apply as ONE broadcast anti-join on (data-file
    basename, _metadata.row_index) — no per-file loop, no sequence
    numbers needed (data-file paths are immutable and never reused, so
    a position tombstone cannot hit a row it wasn't written against).
    Time travel to the pre-delete snapshot still sees every row.
    Equality deletes are covered by q460."""
    import shutil

    from .catalog_sources import _scratch
    from .sources.iceberg import (
        iceberg_snapshot_files,
        read_iceberg,
        write_iceberg_commit,
        write_iceberg_position_deletes,
    )

    path = _scratch("iceberg_posdel", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    write_iceberg_commit(
        spark, path,
        _lrd(spark, [(i, i % 3) for i in range(0, 30)], "id int, p int"),
        partition_by=["p"],
    )
    s_pre = write_iceberg_commit(
        spark, path,
        _lrd(spark, [(i, i % 3) for i in range(100, 109)], "id int, p int"),
        partition_by=["p"],
    )
    _meta, files = iceberg_snapshot_files(path)
    doomed = [
        (r["f"], r["pos"])
        for r in spark.read.parquet(*[f["file_path"] for f in files])
        .select(
            "id",
            F.regexp_replace(
                F.input_file_name(), "^file:/+", "/"
            ).alias("f"),
            F.col("_metadata.row_index").alias("pos"),
        )
        .where(F.col("id") % 7 == 3)
        .collect()
    ]
    write_iceberg_position_deletes(spark, path, doomed)
    cur = read_iceberg(spark, path).withColumn("snap", F.lit("current"))
    pre = read_iceberg(spark, path, snapshot_id=s_pre).withColumn(
        "snap", F.lit("pre")
    )
    return (
        cur.unionByName(pre)
        .groupBy("snap", "p")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("id_sum"))
        .orderBy("snap", "p")
    )


# ---------------------------------------------------------------------------
# q456: Hudi merge-on-read — log-file replay (upsert/delete/rollback)
# ---------------------------------------------------------------------------
#
# Fixture (closed-form): a MERGE_ON_READ table keyed on id.  Base
# instant A (a compaction-shaped .commit) writes ids 0..29 with
# v = 10*id, p = id % 3.  Deltacommit B appends one log file per file
# group: upserts v = 1000 + id for every id % 5 == 0 and deletes ids
# 7 and 14.  Deltacommit C upserts id 0 to v = 7777, then a rollback
# COMMAND block voids instant C — so the current snapshot equals the
# post-B state, pinning all four block semantics (data, delete,
# command, per-block instant admission), then COMPACTION folds the
# surviving actions into new base versions (the current read is of
# the compacted table; the as-of read still merges the logs).
# Output: per-partition (n, v_sum) at the current snapshot and at
# as_of = A.


@query(
    "q456_hudi_mor_log",
    oracle="""
    WITH c0 AS (SELECT unnest(range(0, 30)) AS id),
    base AS (SELECT id, id % 3 AS p, 10 * id AS v FROM c0),
    cur AS (SELECT id, p,
                   CASE WHEN id % 5 = 0 THEN 1000 + id ELSE v END AS v
            FROM base WHERE id NOT IN (7, 14)),
    snaps AS (SELECT 'current' AS snap, p, v FROM cur
              UNION ALL SELECT 'base' AS snap, p, v FROM base)
    SELECT snap, CAST(p AS INT) AS p,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(v) AS BIGINT) AS v_sum
    FROM snaps GROUP BY snap, p ORDER BY snap, p
    """,
)
def q456_hudi_mor_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hudi MERGE_ON_READ log replay (round 10 — sources/hudi.py,
    HoodieLogFormat over the public block layout): base slices resolve
    as in q453, then each file group's log stream replays on
    EXECUTORS (mapInPandas over the group->log listing): Avro data
    blocks upsert by hoodie.table.recordkey.fields, delete blocks
    drop keys, a rollback COMMAND block voids its target instant, and
    every block passes completed-timeline + as-of admission.  The
    newest surviving action per (file group, key) wins via one
    window; driver holds only the file-group listing."""
    import shutil

    from .catalog_sources import _scratch
    from .sources.hudi import (
        compact_hudi,
        read_hudi,
        write_hudi_commit,
        write_hudi_log_commit,
        write_hudi_rollback_block,
    )

    path = _scratch("hudi_mor", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    base = _lrd(
        spark, [(i, i * 10, i % 3) for i in range(0, 30)],
        "id int, v int, p int",
    )
    t0 = write_hudi_commit(
        spark, path, base, partition_by=["p"],
        table_type="MERGE_ON_READ", record_key="id",
    )
    ups = _lrd(
        spark,
        [(i, 1000 + i, i % 3) for i in range(0, 30) if i % 5 == 0],
        "id int, v int, p int",
    )
    write_hudi_log_commit(
        spark, path, ups, deletes=[("p=1", "7"), ("p=2", "14")]
    )
    t2 = write_hudi_log_commit(
        spark, path,
        _lrd(spark, [(0, 7777, 0)], "id int, v int, p int"),
    )
    write_hudi_rollback_block(spark, path, t2)
    # compaction folds the surviving log actions into new base file
    # versions — the CURRENT snapshot below reads the compacted table,
    # so the oracle also pins compaction's read-invisibility; the
    # as-of read predates it and still merges the original logs
    compact_hudi(spark, path)
    cur = read_hudi(spark, path).withColumn("snap", F.lit("current"))
    pre = read_hudi(spark, path, as_of=t0).withColumn(
        "snap", F.lit("base")
    )
    return (
        cur.unionByName(pre)
        .select("snap", F.col("p").cast("int").alias("p"), "v")
        .groupBy("snap", "p")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("v").cast("bigint").alias("v_sum"))
        .orderBy("snap", "p")
    )


# ---------------------------------------------------------------------------
# q458: Delta column mapping ('name' mode) — physical->logical renames
# ---------------------------------------------------------------------------
#
# Fixture (closed-form): a table CREATED in column-mapping 'name' mode
# (minReaderVersion 2; parquet files and partition dirs carry
# generated physical names like col-<hash>; schemaString annotates
# each field with delta.columnMapping.physicalName; partitionValues
# key physically).  Commit 0 writes ids 0..29 (p = id % 3), commit 1
# appends ids 100..108, then a CHECKPOINT collapses the log (pinning
# that configuration survives checkpointing), and commit 2 appends id
# 5000 (p=2).  Output: per-partition census under the LOGICAL names
# at the latest snapshot and time-travel version 1.


@query(
    "q458_delta_column_mapping",
    oracle="""
    WITH c0 AS (SELECT unnest(range(0, 30)) AS id),
    c1 AS (SELECT 100 + unnest(range(0, 9)) AS id),
    v1 AS (SELECT id, id % 3 AS p FROM c0
           UNION ALL SELECT id, id % 3 AS p FROM c1),
    cur AS (SELECT id, p FROM v1
            UNION ALL SELECT 5000 AS id, 2 AS p),
    snaps AS (SELECT 'latest' AS snap, p, id FROM cur
              UNION ALL SELECT 'v1' AS snap, p, id FROM v1)
    SELECT snap, CAST(p AS INT) AS p,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(id) AS BIGINT) AS id_sum
    FROM snaps GROUP BY snap, p ORDER BY snap, p
    """,
)
def q458_delta_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta column mapping in 'name' mode (round 10 —
    sources/delta.py, PROTOCOL.md reader version 2): parquet files
    carry generated PHYSICAL column names, metaData.schemaString maps
    them to logical names via delta.columnMapping.physicalName, and
    partitionValues are keyed physically.  The reader renames
    physical->logical on the one distributed scan, translates
    partition keys per column, and keeps the mapping across a
    checkpoint bootstrap (configuration rides in the checkpoint).
    'id' mode (parquet field-id resolution) and deletion vectors stay
    gated loudly."""
    import shutil

    from .catalog_sources import _scratch
    from .sources.delta import (
        read_delta,
        write_delta_checkpoint,
        write_delta_commit,
    )

    path = _scratch("delta_colmap", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    write_delta_commit(
        spark, path,
        _lrd(spark, [(i, i % 3) for i in range(0, 30)], "id int, p int"),
        partition_by=["p"], column_mapping=True,
    )
    write_delta_commit(
        spark, path,
        _lrd(spark, [(i, i % 3) for i in range(100, 109)], "id int, p int"),
        partition_by=["p"],
    )
    write_delta_checkpoint(spark, path)
    write_delta_commit(
        spark, path,
        _lrd(spark, [(5000, 2)], "id int, p int"),
        partition_by=["p"],
    )
    latest = read_delta(spark, path).withColumn(
        "snap", F.lit("latest")
    )
    v1 = read_delta(spark, path, version=1).withColumn(
        "snap", F.lit("v1")
    )
    return (
        latest.unionByName(v1)
        .groupBy("snap", "p")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("id_sum"))
        .orderBy("snap", "p")
    )


# ---------------------------------------------------------------------------
# q457: Ogg Vorbis decode — codebook/floor/residue/IMDCT end to end
# ---------------------------------------------------------------------------
#
# Fixture (closed-form, margin-verified): doc d < 16 encodes 3 blocks
# of blocksize 256, channels 2, with integer MDCT coefficients
# c(d,b,ch,k) = ((7d + 13b + 29ch + 11k) % 31) - 15 through the REAL
# Vorbis path (stream-described codebooks, flat unit floor1, residue
# type 2, Ogg pages with CRCs).  Decode = windowed IMDCT overlap-add
# of exactly those integers, so the oracle replays the same analytic
# sum: y(b,j) = sum_k c*cos(pi/512 (2j+1+128)(2k+1)), window
# w(i) = sin(pi/2 sin^2((i+0.5)/128 pi/2)), segment m sample i =
# w(127-i) y(m-1, 128+i) + w(i) y(m, i).  Samples quantize as
# floor(s*1000 + 0.5) — the fixture's minimum distance to a rounding
# boundary is 2.8e-5 (unit-tested), five orders above the ~1e-12
# float64 summation-order difference between numpy and DuckDB, so the
# integer features are engine-exact.  Feature: per (doc, channel) the
# position-weighted sum of quantized samples (pins order AND values).


@query(
    "q457_vorbis_decode",
    oracle="""
    WITH d AS (SELECT unnest(range(0, 16)) AS doc_id),
    chn AS (SELECT doc_id, unnest(range(0, 2)) AS channel FROM d),
    bj AS (SELECT doc_id, channel, b.b, j.j
           FROM chn, (SELECT unnest(range(0, 3)) AS b) b,
                (SELECT unnest(range(0, 256)) AS j) j),
    y AS (SELECT doc_id, channel, b, j,
                 SUM((((7*doc_id + 13*b + 29*channel + 11*k.k) % 31)
                      - 15)
                     * cos(pi()/512 * (2*j + 1 + 128) * (2*k.k + 1)))
                 AS v
          FROM bj, (SELECT unnest(range(0, 128)) AS k) k
          GROUP BY doc_id, channel, b, j),
    seg AS (SELECT doc_id, channel, m.m, i.i,
                   (m.m - 1) * 128 + i.i AS n
            FROM chn, (SELECT 1 AS m UNION ALL SELECT 2) m,
                 (SELECT unnest(range(0, 128)) AS i) i),
    s AS (SELECT seg.doc_id, seg.channel, seg.n,
                 sin(pi()/2 * pow(sin((127 - seg.i + 0.5)/128
                                      * pi()/2), 2)) * yp.v
                 + sin(pi()/2 * pow(sin((seg.i + 0.5)/128
                                        * pi()/2), 2)) * yc.v
                 AS sample
          FROM seg
          JOIN y yp ON yp.doc_id = seg.doc_id
                   AND yp.channel = seg.channel
                   AND yp.b = seg.m - 1 AND yp.j = 128 + seg.i
          JOIN y yc ON yc.doc_id = seg.doc_id
                   AND yc.channel = seg.channel
                   AND yc.b = seg.m AND yc.j = seg.i)
    SELECT doc_id, CAST(channel AS INT) AS channel,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(SUM((n + 1) * CAST(FLOOR(sample * 1000 + 0.5)
                                   AS BIGINT)) AS BIGINT) AS qsum
    FROM s GROUP BY doc_id, channel ORDER BY doc_id, channel
    """,
)
def q457_vorbis_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ogg Vorbis decode (round 10 — operators/vorbis.py, the Vorbis I
    spec): stream-described codebooks (canonical lowest-codeword
    Huffman, VQ lattice lookup), floor1 synthesis, residue-2 partition
    decode, square-polar uncoupling, IMDCT + Vorbis window + centered
    overlap-add — implementable under the memorized-constant rule
    because every entropy table rides in the setup header.  Fixtures
    cross the REAL encode->Ogg->decode path on executors
    (Arrow-batched mapInPandas); the oracle replays the analytic
    windowed-IMDCT algebra and the integer quantization is
    margin-verified engine-exact."""
    docs = table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 16
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        from rust_dataframe_spark.operators.vorbis import (
            decode_vorbis,
            encode_vorbis,
        )

        for pdf in batches:
            rows = {"doc_id": [], "channel": [], "n_samples": [],
                    "qsum": []}
            for d in pdf["doc_id"]:
                d = int(d)
                blocks = [
                    [[((7 * d + 13 * b + 29 * c + 11 * k) % 31) - 15
                      for k in range(128)]
                     for c in range(2)]
                    for b in range(3)
                ]
                blob = encode_vorbis(8000, 2, blocks, blocksize=256)
                _r, _nch, samples = decode_vorbis(blob)
                for c in range(2):
                    s = np.asarray(samples[c])
                    q = np.floor(s * 1000 + 0.5).astype(np.int64)
                    n = np.arange(len(q), dtype=np.int64)
                    rows["doc_id"].append(d)
                    rows["channel"].append(c)
                    rows["n_samples"].append(len(q))
                    rows["qsum"].append(int(((n + 1) * q).sum()))
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        synth,
        "doc_id bigint, channel int, n_samples bigint, qsum bigint",
    ).orderBy("doc_id", "channel")


# ---------------------------------------------------------------------------
# q459: Delta deletion vectors — roaring-bitmap row tombstones
# ---------------------------------------------------------------------------
#
# Fixture (closed-form): commit 0 writes ids 0..29 (p = id % 3);
# commit 1 appends ids 100..108; commit 2 deletion-vector-deletes
# every row with id % 7 == 3 (positions harvested from a
# _metadata.row_index scan, serialized as a portable RoaringBitmapArray
# with CRC-32 per the protocol, the add actions re-added with DV
# descriptors and the protocol upgraded to reader 3 + deletionVectors);
# a CHECKPOINT then collapses the log (DV descriptors must survive
# it).  Output: per-partition census at the latest snapshot (DVs
# applied, read through the checkpoint) and at pre-delete version 1.


@query(
    "q459_delta_deletion_vectors",
    oracle="""
    WITH c0 AS (SELECT unnest(range(0, 30)) AS id),
    c1 AS (SELECT 100 + unnest(range(0, 9)) AS id),
    v1 AS (SELECT id, id % 3 AS p FROM c0
           UNION ALL SELECT id, id % 3 AS p FROM c1),
    cur AS (SELECT id, p FROM v1 WHERE id % 7 <> 3),
    snaps AS (SELECT 'latest' AS snap, p, id FROM cur
              UNION ALL SELECT 'v1' AS snap, p, id FROM v1)
    SELECT snap, CAST(p AS INT) AS p,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(id) AS BIGINT) AS id_sum
    FROM snaps GROUP BY snap, p ORDER BY snap, p
    """,
)
def q459_delta_deletion_vectors(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delta deletion vectors (round 10 — sources/delta.py +
    operators/roaring.py, PROTOCOL.md 'Deletion Vectors' over the
    public RoaringFormatSpec): row tombstones ride as portable
    roaring bitmaps (array/bitmap/run containers, 64-bit bucket
    wrapper, CRC-32 + cardinality enforced), decode on EXECUTORS via
    mapInPandas over the per-file descriptors, and apply as ONE
    anti-join on (data-file basename, _metadata.row_index) — the same
    shape as Iceberg position deletes (q455).  Descriptors survive
    checkpoint bootstrap; time travel to the pre-delete version still
    sees every row."""
    import os
    import shutil

    from .catalog_sources import _scratch
    from .sources.delta import (
        delta_snapshot_files,
        read_delta,
        write_delta_checkpoint,
        write_delta_commit,
        write_delta_delete_rows,
    )

    path = _scratch("delta_dv", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    write_delta_commit(
        spark, path,
        _lrd(spark, [(i, i % 3) for i in range(0, 30)], "id int, p int"),
        partition_by=["p"],
    )
    write_delta_commit(
        spark, path,
        _lrd(spark, [(i, i % 3) for i in range(100, 109)], "id int, p int"),
        partition_by=["p"],
    )
    _m, adds = delta_snapshot_files(spark, path)
    by_base = {os.path.basename(a["path"]): a["path"] for a in adds}
    doomed: dict[str, list[int]] = {}
    for r in (
        spark.read.parquet(
            *[os.path.join(path, a["path"]) for a in adds]
        )
        .select(
            "id",
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias(
                "b"
            ),
            F.col("_metadata.row_index").alias("pos"),
        )
        .where(F.col("id") % 7 == 3)
        .collect()
    ):
        doomed.setdefault(by_base[r["b"]], []).append(r["pos"])
    write_delta_delete_rows(spark, path, doomed)
    write_delta_checkpoint(spark, path)
    latest = read_delta(spark, path).withColumn(
        "snap", F.lit("latest")
    )
    v1 = read_delta(spark, path, version=1).withColumn(
        "snap", F.lit("v1")
    )
    return (
        latest.unionByName(v1)
        .groupBy("snap", "p")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("id_sum"))
        .orderBy("snap", "p")
    )


# ---------------------------------------------------------------------------
# q460: Iceberg v2 equality deletes — sequence-number-scoped anti-join
# ---------------------------------------------------------------------------
#
# Fixture (closed-form): snapshot A (seq 1) writes ids 0..29
# (p = id % 3); snapshot B (seq 2) EQUALITY-deletes keys id in
# {3, 10, 17, 24}; snapshot C (seq 3) re-appends id 3 (p=0) — the
# re-appended key has data seq 3 > delete seq 2, so the spec's
# temporal scoping keeps it while the seq-1 original stays dead.
# Output: per-partition census at the current snapshot and at
# pre-delete snapshot A.


@query(
    "q460_iceberg_eq_deletes",
    oracle="""
    WITH c0 AS (SELECT unnest(range(0, 30)) AS id),
    pre AS (SELECT id, id % 3 AS p FROM c0),
    cur AS (SELECT id, p FROM pre WHERE id NOT IN (3, 10, 17, 24)
            UNION ALL SELECT 3 AS id, 0 AS p),
    snaps AS (SELECT 'current' AS snap, p, id FROM cur
              UNION ALL SELECT 'pre' AS snap, p, id FROM pre)
    SELECT snap, CAST(p AS INT) AS p,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(id) AS BIGINT) AS id_sum
    FROM snaps GROUP BY snap, p ORDER BY snap, p
    """,
)
def q460_iceberg_eq_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg format-v2 EQUALITY deletes (round 10 —
    sources/iceberg.py, the public table spec): delete files carry
    equality-column values plus a sequence number; a data row dies
    when a delete row with a STRICTLY newer sequence number matches
    it null-safely on the equality columns — one broadcast anti-join
    per delete group, with data-file sequence numbers attached via
    the basename broadcast map.  The fixture pins the temporal
    semantics: a key re-appended AFTER its equality delete survives
    while the older copy stays dead.  This closes the last Iceberg
    row-level-delete gate (q455 covered position deletes)."""
    import shutil

    from .catalog_sources import _scratch
    from .sources.iceberg import (
        read_iceberg,
        write_iceberg_commit,
        write_iceberg_equality_deletes,
    )

    path = _scratch("iceberg_eqdel", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    s_pre = write_iceberg_commit(
        spark, path,
        _lrd(spark, [(i, i % 3) for i in range(0, 30)], "id int, p int"),
        partition_by=["p"],
    )
    from .sources.lakehouse_util import local_rows_df

    write_iceberg_equality_deletes(
        spark, path,
        local_rows_df(spark, [(3,), (10,), (17,), (24,)], "id int"),
        ["id"],
    )
    write_iceberg_commit(
        spark, path,
        local_rows_df(spark, [(3, 0)], "id int, p int"),
        partition_by=["p"],
    )
    cur = read_iceberg(spark, path).withColumn("snap", F.lit("current"))
    pre = read_iceberg(spark, path, snapshot_id=s_pre).withColumn(
        "snap", F.lit("pre")
    )
    return (
        cur.unionByName(pre)
        .groupBy("snap", "p")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("id_sum"))
        .orderBy("snap", "p")
    )


# ---------------------------------------------------------------------------
# q461: Delta checkpoint formats — multi-part + V2 (uuid/sidecar)
# ---------------------------------------------------------------------------
#
# Fixture (closed-form): TWO tables with identical content (ids 0..29,
# p = id % 3, plus an appended id 100 in p=1), one checkpointed in the
# MULTI-PART classic scheme (n.checkpoint.<part>.<parts>.parquet, file
# actions split across parts), one in the V2 scheme
# (n.checkpoint.<uuid>.parquet top level carrying checkpointMetadata +
# a sidecar reference; file actions in _delta_log/_sidecars/).  The
# pre-checkpoint JSON commits are DELETED, so the reads below resolve
# from the checkpoints alone; a post-checkpoint commit (id 200, p=2)
# proves tail replay on top.  Output: per (style, p) census.


@query(
    "q461_delta_checkpoint_formats",
    oracle="""
    WITH c0 AS (SELECT unnest(range(0, 30)) AS id),
    rows_ AS (SELECT id, id % 3 AS p FROM c0
              UNION ALL SELECT 100 AS id, 1 AS p
              UNION ALL SELECT 200 AS id, 2 AS p),
    styles AS (SELECT 'multipart' AS style UNION ALL SELECT 'v2')
    SELECT style, CAST(p AS INT) AS p,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(id) AS BIGINT) AS id_sum
    FROM styles, rows_ GROUP BY style, p ORDER BY style, p
    """,
)
def q461_delta_checkpoint_formats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delta checkpoint naming schemes beyond the classic single file
    (round 10 — sources/delta.py, PROTOCOL.md 'Checkpoint Naming
    Scheme'): MULTI-PART checkpoints (completeness of the part set
    enforced loudly) and V2 checkpoints (uuid-named top level with
    checkpointMetadata + sidecar actions; file actions in
    _delta_log/_sidecars parquet; the v2Checkpoint reader feature is
    accepted; JSON top levels parse too).  The fixture deletes every
    pre-checkpoint commit so snapshot resolution genuinely bootstraps
    from each format, then replays a JSON tail on top."""
    import os
    import shutil

    from .catalog_sources import _scratch
    from .sources.delta import (
        read_delta,
        write_delta_checkpoint,
        write_delta_commit,
    )

    outs = []
    for style in ("multipart", "v2"):
        path = _scratch(f"delta_cp_{style}", sf_dir)
        shutil.rmtree(path, ignore_errors=True)
        write_delta_commit(
            spark, path,
            _lrd(spark, [(i, i % 3) for i in range(0, 30)], "id int, p int"),
            partition_by=["p"],
        )
        write_delta_commit(
            spark, path,
            _lrd(spark, [(100, 1)], "id int, p int"),
            partition_by=["p"],
        )
        write_delta_checkpoint(spark, path, style=style)
        log = os.path.join(path, "_delta_log")
        for v in (0, 1):
            os.remove(os.path.join(log, f"{v:020d}.json"))
        write_delta_commit(
            spark, path,
            _lrd(spark, [(200, 2)], "id int, p int"),
            partition_by=["p"],
        )
        outs.append(
            read_delta(spark, path).withColumn("style", F.lit(style))
        )
    return (
        outs[0].unionByName(outs[1])
        .groupBy("style", "p")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("id_sum"))
        .orderBy("style", "p")
    )
