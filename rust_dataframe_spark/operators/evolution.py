"""Schema-evolution ingestion: read across parquet vintages whose schema
drifted, and migrate them to one target schema with an audit trail.

The most common operational hit a 100 TB lake takes that isn't a data bug:
a producer added a column, renamed one, or widened a type, and now the
table directory holds files of several "vintages".  Spark's
``mergeSchema`` covers exactly one case — ADDED columns of identical
types (conflicting primitive types fail with CANNOT_MERGE_SCHEMAS, by
design).  This module covers the rest explicitly:

* :func:`migrate_schema` — normalize ONE vintage to a target schema:
  renames (old name -> new), type widenings (cast to the target type),
  and backfills (literal default for columns the vintage predates).  It
  returns the migrated frame plus an AUDIT frame — one row per applied
  action with the affected row count — because silent migration is how
  type-punned garbage enters a lake; the audit rows are what a WAP gate
  (q304's pattern) inspects before publishing.
* :func:`read_evolved` — the two-step read: per-vintage
  ``migrate_schema`` then ``unionByName`` — equivalent to what
  Delta/Iceberg column-mapping metadata does, expressed over plain
  parquet.

Scale posture: migrations are pure per-row projections (rename = alias,
widen = cast, backfill = literal) — no shuffle, full codegen, and the
per-vintage filter prunes to each vintage's files.  The audit needs one
count per vintage (metadata-cheap on parquet).  Nothing here is
row-at-a-time Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["migrate_schema", "read_evolved"]


def migrate_schema(
    df: DataFrame,
    target: dict[str, str],
    *,
    renames: dict[str, str] | None = None,
    backfills: dict[str, object] | None = None,
    vintage: str = "v?",
) -> tuple[DataFrame, DataFrame]:
    """Normalize one vintage to ``target`` (column -> Spark type string).

    Steps, in order: apply ``renames`` (old -> new), CAST any column whose
    type differs from the target (widening — int->bigint, float->double;
    the cast is audited either way), BACKFILL target columns the vintage
    lacks with the literal in ``backfills`` (a missing column with no
    backfill default is an error — better to fail the ingest than to
    invent nulls silently), and drop columns not in the target (audited
    as ``drop``).  Returns ``(migrated, audit)`` where ``audit`` has one
    row per action: (vintage, column, action, n_affected) with
    n_affected = the vintage's row count (one metadata-cheap count).
    """
    renames = dict(renames or {})
    backfills = dict(backfills or {})
    spark = df.sparkSession
    actions: list[tuple[str, str, str]] = []

    cur = df
    for old, new in sorted(renames.items()):
        if old in cur.columns:
            if new in cur.columns:
                # round-6 ADVICE: renaming onto an existing column would
                # create duplicate names and surface later as an opaque
                # ambiguous-reference AnalysisException — fail the
                # migration up front with the actual conflict instead
                raise ValueError(
                    f"vintage {vintage}: rename {old!r} -> {new!r} collides "
                    f"with an existing column {new!r} — drop or rename the "
                    f"conflicting column first"
                )
            cur = cur.withColumnRenamed(old, new)
            actions.append((old, "rename", new))
    have = dict(cur.dtypes)
    cols = []
    for name, typ in target.items():
        if name in have:
            if have[name] != typ:
                cols.append(F.col(name).cast(typ).alias(name))
                actions.append((name, "widen", f"{have[name]}->{typ}"))
            else:
                cols.append(F.col(name))
        else:
            if name not in backfills:
                raise ValueError(
                    f"vintage {vintage} lacks column {name!r} and no backfill "
                    f"default was given — refusing to invent nulls"
                )
            cols.append(F.lit(backfills[name]).cast(typ).alias(name))
            actions.append((name, "backfill", repr(backfills[name])))
    for name in cur.columns:
        if name not in target:
            actions.append((name, "drop", ""))
    migrated = cur.select(*cols)
    n = df.count()
    from ..sources.lakehouse_util import local_rows_df

    audit = local_rows_df(
        spark,
        [(vintage, c, a, d, n) for c, a, d in sorted(actions)] or
        [(vintage, "*", "passthrough", "", n)],
        "vintage string, column string, action string, detail string,"
        " n_affected bigint",
    )
    return migrated, audit


def read_evolved(
    spark: SparkSession,
    vintage_paths: dict[str, str],
    target: dict[str, str],
    *,
    renames: dict[str, dict[str, str]] | None = None,
    backfills: dict[str, object] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Read several parquet vintages (name -> path), migrate each to the
    target schema, and union them by name.  ``renames`` maps vintage name
    -> that vintage's rename dict; ``backfills`` is shared (a column a
    vintage predates gets the same default everywhere).  Returns
    ``(unified, audit)`` with the audit frames unioned across vintages.
    """
    renames = renames or {}
    unified = None
    audits = None
    for vname in sorted(vintage_paths):
        vdf = spark.read.parquet(vintage_paths[vname])
        m, a = migrate_schema(
            vdf,
            target,
            renames=renames.get(vname),
            backfills=backfills,
            vintage=vname,
        )
        unified = m if unified is None else unified.unionByName(m)
        audits = a if audits is None else audits.unionByName(a)
    if unified is None:
        raise ValueError("no vintages given")
    return unified, audits
