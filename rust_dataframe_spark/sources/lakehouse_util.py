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
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, numSlices=n), schema
    )


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
