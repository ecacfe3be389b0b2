"""Shared lakehouse-reader helper: re-inject per-file metadata
(partition values) over ONE distributed scan.

All three lakehouse readers (sources/delta.py, iceberg.py, hudi.py)
read every live data file in a single ``spark.read.parquet`` scan and
join the per-file partition values back via ``input_file_name()`` with
a broadcast map — no per-partition union chains, scale-safe at 100 TB.

Join key subtlety: ``input_file_name()`` returns a percent-encoded
URI (``file:///…/p=a%20b/part-….parquet``), while the reader holds
decoded filesystem paths, and the two encodings (Hadoop ``Path.toUri``
vs ``urllib.quote``) don't agree on every character.  Rather than
re-implement Hadoop's escaping, the join key is the part-file
BASENAME: every lakehouse writer (Delta/Iceberg/Hudi, Spark's own
committers) embeds a UUID in the file name, so basenames are unique
per table and URI-safe ASCII.  Uniqueness is verified loudly before
the join — a duplicate basename falls back to nothing silently wrong.
"""

from __future__ import annotations

import os
import re
import uuid

from pyspark.sql import DataFrame, functions as F


_PRED_RE = __import__("re").compile(
    r"^\s*`?([A-Za-z_]\w*)`?\s*(<=|>=|==|=|<|>)\s*(.+?)\s*$"
)


def parse_conjuncts(where: str) -> list[tuple[str, str, object]]:
    """Best-effort parse of ``a AND b AND ...`` into (column, op,
    literal) triples for METADATA-SIDE file pruning.  Conjuncts that
    don't fit the simple col-op-literal shape are dropped — pruning
    is advisory in every caller (the residual filter still runs), so
    a dropped conjunct costs pruning power, never correctness.

    Disjunction guard: an OR (or NOT) anywhere makes the AND-split
    unsound — ``x = 1 AND y = 2 OR z = 3`` would yield a false
    'required' conjunct ``x = 1`` and prune files that only satisfy
    the ``z = 3`` arm, which the residual filter CANNOT restore.  Any
    OR/NOT token (word match, case-insensitive, including inside
    string literals — conservative) disables pruning entirely."""
    import re as _re

    if _re.search(r"(?i)\b(or|not)\b", where):
        return []
    out: list[tuple[str, str, object]] = []
    for part in _re.split(r"(?i)\s+and\s+", where):
        m = _PRED_RE.match(part)
        if not m:
            continue
        col, op, lit = m.groups()
        lit = lit.strip()
        if (lit.startswith("'") and lit.endswith("'")) or (
            lit.startswith('"') and lit.endswith('"')
        ):
            val = lit[1:-1]
            if "'" in val or '"' in val:
                # a quote surviving inside the stripped literal means
                # the AND-split cut through a string — unsound, drop
                continue
            val: object = val
        else:
            try:
                val = int(lit)
            except ValueError:
                try:
                    val = float(lit)
                except ValueError:
                    continue
        out.append((col, op, val))
    return out


def range_survives(lo, hi, op: str, val) -> bool:
    """False only when a file's [lo, hi] value interval PROVES no row
    can satisfy ``column op val``; None bounds always survive."""
    try:
        if op in ("=", "=="):
            if (hi is not None and hi < val) or (
                lo is not None and lo > val
            ):
                return False
        elif op == "<":
            if lo is not None and lo >= val:
                return False
        elif op == "<=":
            if lo is not None and lo > val:
                return False
        elif op == ">":
            if hi is not None and hi <= val:
                return False
        elif op == ">=":
            if hi is not None and hi < val:
                return False
    except TypeError:
        return True  # uncomparable literal: keep the file
    return True


def local_rows_df(spark, rows: list, schema: str):
    """Slice-capped DataFrame from driver-local rows.

    ``spark.createDataFrame(rows, ddl)`` parallelizes the list into
    ``defaultParallelism`` pickled slices (32 on local[32], mostly
    empty for fixture-sized data); a later ``.coalesce(1)`` then
    evaluates all 32 slices SEQUENTIALLY in one task — one Python
    worker round-trip each, ~4.5 s of pure overhead measured for a
    24-row frame (guide §4: every Python-boundary crossing costs).
    Slices are therefore capped at one per 4096 rows (fixture-sized
    frames get exactly ONE): the same rows, the same output, one
    Python round-trip for the common case, while a genuinely large
    driver-side list (e.g. a million-file manifest map) still spreads
    across the cluster."""
    n = max(1, min(
        spark.sparkContext.defaultParallelism, (len(rows) + 4095) // 4096
    ))
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, numSlices=n), schema
    )
    if n == 1:
        # Fast-path tag: the lakehouse writers recognize a one-slice
        # local frame and can write its data file DRIVER-SIDE (pyarrow)
        # instead of launching a Spark write job (~0.25-0.4 s each; see
        # write_rows_hive_tmp).  The tag lives on this exact DataFrame
        # object only — any transformation returns an untagged frame,
        # so a derived plan can never be mistaken for driver rows.
        try:
            df._sg_rows = [tuple(r) for r in rows]
        except Exception:
            pass
    return df


def tagged_rows(df: DataFrame) -> list[tuple] | None:
    """Driver-local rows of a one-slice :func:`local_rows_df` frame,
    or None for any other DataFrame (including anything derived from
    a tagged frame by a transformation)."""
    return getattr(df, "_sg_rows", None)


# Types for which the pyarrow fast path is pinned byte-equivalent to
# Spark's parquet writer (tests/test_r13_opt.py: same read-back schema,
# same footer row counts and min/max stats, same file census).  Anything
# else falls back to the Spark write job.
_FAST_DATA_TYPES = {
    "integer", "long", "string", "double", "float", "boolean", "date",
    "short", "byte",
}
# Partition-dir values additionally must render to the same directory
# string Spark produces; pinned for int-family, string and date.
_FAST_PART_TYPES = {"integer", "long", "string", "date", "short", "byte"}
# Characters Spark/Hive never escape in a partition dir name.  Anything
# outside (including '%', so unquote() round-trips) falls back.
_SAFE_PART_RE = re.compile(r"^[A-Za-z0-9._+-]+$")


def write_rows_hive_tmp(
    rows: list[tuple],
    data_schema,
    tmp: str,
    part_names: list[str],
    part_vals: list[tuple] | None,
    *,
    field_ids: dict[str, int] | None = None,
) -> bool:
    """Driver-side twin of ``df.write.mode('overwrite')
    .partitionBy(*cols).parquet(tmp)`` for ONE-SLICE local-rows frames
    (guide §5: the driver should do almost no data work — and a
    distributed write job over a driver-local fixture list is exactly
    that work, ~0.25-0.4 s of scheduling per tiny commit).

    Produces the SAME tmp layout the Spark job would: hive partition
    dirs ``k=v``, ONE part file per partition value (a one-slice frame
    is a one-task write), parquet schema derived through the same
    ``to_arrow_schema`` mapping the checkpoint fast path pinned, footer
    min/max statistics on, optional ``PARQUET:field_id`` stamping.
    Returns False — caller runs the original Spark job — whenever
    equivalence is not provable: pyarrow missing, empty input, a type
    outside the pinned whitelist, or a partition value that is null or
    would be hive-escaped (chars outside ``_SAFE_PART_RE``).

    ``rows`` are the FILE contents (partition columns already removed,
    matching partitionBy semantics) in input order; ``part_vals`` the
    per-row partition tuples aligned with ``rows`` (None ≡ all-empty,
    unpartitioned)."""
    if not rows or len(rows) > 4096:
        # >4096 rows would have been a multi-slice frame: the Spark
        # job writes one file PER SLICE per value — a different file
        # census the fast path must not silently change
        return False
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema
    except Exception:
        return False
    for f in data_schema.fields:
        if f.dataType.typeName() not in _FAST_DATA_TYPES:
            return False
    if part_names:
        if part_vals is None or len(part_vals) != len(rows):
            return False
        for pv in part_vals:
            for v in pv:
                if v is None:
                    return False  # Spark path fail-louds identically
                s = str(v)
                if not _SAFE_PART_RE.match(s):
                    return False
    try:
        arrow_schema = to_arrow_schema(data_schema)
    except Exception:
        return False
    if field_ids is not None:
        missing = [n for n in arrow_schema.names if n not in field_ids]
        if missing:
            return False
        arrow_schema = pa.schema([
            f.with_metadata(
                {b"PARQUET:field_id": str(int(field_ids[f.name])).encode()}
            )
            for f in arrow_schema
        ])
    # stable group by partition tuple: input order within each group is
    # exactly the one-task Spark write's order (positions in the file
    # matter to position-delete fixtures)
    groups: dict[tuple, list[tuple]] = {}
    if part_names:
        for r, pv in zip(rows, part_vals):
            groups.setdefault(tuple(pv), []).append(tuple(r))
    else:
        groups[()] = [tuple(r) for r in rows]
    ncols = len(data_schema.fields)
    try:
        for pv, grp in groups.items():
            sub = "/".join(
                f"{c}={v}" for c, v in zip(part_names, pv)
            )
            out_dir = os.path.join(tmp, sub) if sub else tmp
            os.makedirs(out_dir, exist_ok=True)
            cols = [
                pa.array([r[i] for r in grp], type=arrow_schema.types[i])
                for i in range(ncols)
            ]
            tbl = pa.Table.from_arrays(cols, schema=arrow_schema)
            pq.write_table(
                tbl,
                os.path.join(
                    out_dir, f"part-00000-{uuid.uuid4().hex[:12]}.parquet"
                ),
                compression="snappy",
            )
    except Exception:
        # half-written tmp must not leak into the caller's discovery
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        return False
    return True


def assert_unique_basenames(
    paths: list[str], *, err_cls: type[Exception], tag: str
) -> None:
    """Loud duplicate-basename check for any basename-keyed join.

    ``attach_file_values`` performs this check itself, but the
    position-delete / deletion-vector anti-joins key on the scan
    basename WITHOUT going through it — an unpartitioned table with
    two live files sharing a basename in different directories would
    otherwise tombstone rows in the wrong file silently."""
    seen: dict[str, str] = {}
    for path in paths:
        base = os.path.basename(path)
        if base in seen and seen[base] != path:
            raise err_cls(
                f"{tag}: duplicate data-file basename {base!r} "
                "(basename-keyed row-level-delete join would be "
                "ambiguous)"
            )
        seen[base] = path


def attach_file_values(
    df: DataFrame,
    spark,
    file_to_vals: list[tuple[str, list]],
    value_cols: list[str],
    *,
    err_cls: type[Exception],
    tag: str,
    key_col: str | None = None,
) -> DataFrame:
    """Broadcast-join ``value_cols`` onto ``df`` keyed by the source
    file of each row.  ``file_to_vals`` is ``[(abs file path,
    [values...]), ...]`` — one entry per live data file.  With
    ``key_col`` the basename was already computed into that column
    (needed when a join sits between the scan and this call, where
    ``input_file_name()`` would be ambiguous); the column is kept."""
    rows = []
    seen: dict[str, str] = {}
    for path, vals in file_to_vals:
        base = os.path.basename(path)
        if base in seen and seen[base] != path:
            raise err_cls(
                f"{tag}: duplicate data-file basename {base!r} "
                "(file-map join would be ambiguous)"
            )
        seen[base] = path
        rows.append((base, *vals))
    key = key_col or f"__{tag}_file"
    map_df = spark.createDataFrame(
        spark.sparkContext.parallelize(
            rows,
            numSlices=max(1, min(
                spark.sparkContext.defaultParallelism,
                (len(rows) + 4095) // 4096,
            )),
        ),
        [key] + [f"__pv_{c}" for c in value_cols],
    )
    if key_col is None:
        df = df.withColumn(
            key, F.element_at(F.split(F.input_file_name(), "/"), -1)
        )
    out = df.join(F.broadcast(map_df), key, "left")
    return out if key_col else out.drop(key)
