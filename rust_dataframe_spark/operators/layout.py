"""Data-layout operators: Z-order (Morton) clustering for multi-column scan
pruning.

Parquet prunes row groups / files by min-max statistics.  Sorting by one
column gives tight stats on THAT column only; interleaving the bits of
several columns (a space-filling curve) gives moderately tight ranges on ALL
of them, so predicates on any participating column skip most of the data —
the lever behind Delta/Iceberg ``OPTIMIZE ZORDER BY``.  At 100 TB this is a
one-time layout job (repartitionByRange on the curve value + sorted write)
that turns every later selective scan into a partial scan.

The curve value is plain integer bit-math (shifts, masks, adds) — pure
whole-stage codegen, reproducible in any engine (the catalog oracle replays
it in DuckDB arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["zorder_value", "write_zordered", "build_manifest", "pruned_read", "compact_files"]


def zorder_value(cols: list, *, bits: int = 16):
    """Morton interleave of ``len(cols)`` non-negative int columns, ``bits``
    low bits each: result bit ``b * n_cols + c`` = bit ``b`` of column ``c``.

    Columns must already be rank/scale-normalized into ``[0, 2^bits)`` (use
    ``width_bucket`` or epoch-day arithmetic upstream); values are masked to
    ``bits`` so out-of-range inputs wrap rather than corrupt high bits.
    ``n_cols * bits`` must fit a signed 64-bit int.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs >= 2 columns (else just sort)")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed 64-bit value")
    z = F.lit(0).cast("bigint")
    for c_idx, col in enumerate(cols):
        x = F.col(col).cast("bigint") if isinstance(col, str) else col.cast("bigint")
        x = x.bitwiseAND(F.lit((1 << bits) - 1))
        for b in range(bits):
            bit = F.shiftright(x, b).bitwiseAND(F.lit(1))
            z = z + (F.shiftleft(bit, b * n + c_idx)).cast("bigint")
    return z


def write_zordered(
    df: DataFrame,
    cols: list[str],
    path: str,
    *,
    bits: int = 16,
    num_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered on the Z-curve of ``cols``:
    repartitionByRange on the curve value (files = contiguous curve segments)
    + sortWithinPartitions (tight row-group stats inside each file).

    The curve column itself is dropped before writing — it is a layout
    artifact, not data.  Effectiveness is tested by measuring per-file
    min-max spans of every participating column against a naive layout
    (tests/test_sources.py) rather than asserted by fiat.
    """
    z = zorder_value(cols, bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def build_manifest(spark, path: str, stat_cols: list[str]):
    """File-skipping manifest: per-FILE min/max of the given columns — the
    data-skipping index a table format (Delta/Iceberg/Hudi) keeps in its
    log, built here directly from the open parquet directory via one scan
    grouped on ``input_file_name()``.  Combine with :func:`write_zordered`:
    Z-ordering is what makes per-file ranges TIGHT, the manifest is what
    turns tight ranges into skipped IO.

    Returns (file, n_rows, <c>_min, <c>_max ...).  Scale: the manifest is
    O(files) rows — thousands of entries for a 100 TB table — and is itself
    a tiny broadcastable table; rebuild incrementally per ingested file in
    production rather than by rescanning (this builder is the bootstrap).
    """
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in stat_cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return (
        df.withColumn("file", F.input_file_name())
        .groupBy("file")
        .agg(*aggs)
    )


def pruned_read(spark, path: str, manifest, col: str, lo, hi):
    """Manifest-driven pruned read: select only the files whose [min, max]
    range for ``col`` intersects [lo, hi], read just those, and apply the
    exact predicate as a post-filter.  The result EQUALS the full-scan
    filter (skipping only removes files that cannot match); what changes is
    IO — with a clustered layout, a selective range touches a small
    fraction of files (pinned by the inputFiles assertion in tests).

    The file list is collected driver-side: O(matching files) strings, the
    same metadata a table format's planner would hand Spark.
    """
    hits = [
        r["file"]
        for r in manifest.filter(
            (F.col(f"{col}_max") >= lo) & (F.col(f"{col}_min") <= hi)
        ).collect()
    ]
    if not hits:
        return spark.read.parquet(path).filter(F.lit(False))
    return (
        spark.read.parquet(*[h.replace("file:", "") for h in hits])
        .filter((F.col(col) >= lo) & (F.col(col) <= hi))
    )


def compact_files(
    spark,
    src_path: str,
    dst_path: str,
    *,
    target_files: int,
    sort_cols: list[str] | None = None,
) -> dict:
    """Small-file compaction — the table-maintenance job every long-lived
    100 TB dataset needs: streaming sinks and incremental batch appends
    leave thousands of KB-sized files whose per-file open/footer/seek
    overhead dominates scan time and bloats the driver's file index.

    Rewrites ``src_path`` (parquet) into ``target_files`` files at
    ``dst_path``, optionally range-sorted by ``sort_cols`` so min-max file
    stats become selective again (repartitionByRange + sortWithinPartitions
    — the same stats-tightening lever as Z-order, for the 1-column case).
    Returns {"files_before", "files_after", "rows"} for auditability.

    Scale notes: the rewrite is one pass (scan → optional range shuffle →
    write); ``target_files`` should target 128 MB-1 GB per file.  On a real
    lakehouse this runs per-partition-directory, compacting only
    directories whose small-file count passed a threshold.  The audit
    counts come from Spark's own file index (``input_file_name`` over each
    scan), not a local-filesystem glob, so they are correct on s3:// /
    hdfs:// / abfs:// paths too (ADVICE r3).
    """
    df = spark.read.parquet(src_path)
    n_before = (
        df.select(F.input_file_name().alias("f")).distinct().count()
    )
    if sort_cols:
        out = df.repartitionByRange(target_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.repartition(target_files)
    out.write.mode("overwrite").parquet(dst_path)
    compacted = spark.read.parquet(dst_path)
    audit = (
        compacted.select(F.input_file_name().alias("__f"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.countDistinct("__f").alias("files"),
        )
        .collect()[0]
    )
    return {
        "files_before": n_before,
        "files_after": int(audit["files"]),
        "rows": int(audit["rows"]),
    }


def compaction_plan(
    manifest: DataFrame,
    file_col: str,
    size_col: str,
    *,
    target: int,
) -> DataFrame:
    """Small-file compaction planner: assign every file in a manifest to a
    rewrite bin of roughly ``target`` size — the OPTIMIZE/bin-packing step
    a table format runs when streaming ingestion has littered a partition
    with kilobyte files (the #1 operational scan-killer at 100 TB: file
    open cost dominates, scan parallelism collapses to file count).

    Strategy: next-fit over the (size DESC, file ASC) order — sort-by-size
    keeps big files from fragmenting many bins (the "decreasing" half of
    FFD); the sequential fill is ``bin = floor(exclusive_prefix / target)``
    on the GLOBAL prefix sum of sizes, which rides
    :func:`training.global_cumsum` (two-phase range partitioning — the
    planner itself never funnels the manifest through one task, so it
    holds at millions of files).  A file straddling a boundary joins the
    bin where it starts; bins therefore overflow by at most one file —
    the same guarantee Delta's OPTIMIZE greedy packer gives.

    Returns per-file ``(file, size, bin)``, deterministic for a given
    manifest (ties broken on file name).  Integer arithmetic throughout.
    """
    from .training import global_cumsum

    m = manifest.select(
        F.col(file_col).alias("file"),
        F.col(size_col).cast("bigint").alias("size"),
        (-F.col(size_col)).cast("bigint").alias("__neg"),
    )
    c = global_cumsum(m, ["__neg", "file"], "size", out_col="__cum")
    return c.select(
        "file",
        "size",
        F.floor((F.col("__cum") - F.col("size")) / F.lit(target))
        .cast("bigint")
        .alias("bin"),
    )
