"""Parquet field-id resolution shared by the Iceberg and Delta readers.

Both table specs resolve data-file columns by FIELD ID, not by name
(Iceberg spec "Column Projection"; Delta PROTOCOL.md column mapping
'id' mode): a column renamed by schema evolution keeps its id, so the
reader must match parquet columns to the logical schema through the
ids stamped in each file's footer.  Name-based reads silently
resurrect the old name after a rename — the exact wrong-read this
module exists to prevent.

Mechanics (all public Spark surface):

* Spark stamps ids on WRITE when a field's metadata carries
  ``parquet.field.id`` (``spark.sql.parquet.fieldId.write.enabled``,
  default true);
* Spark matches by id on READ when the requested schema carries the
  same metadata AND ``spark.sql.parquet.fieldId.read.enabled`` is on.
  That conf is read at ACTION time, not plan time (a set/reset pair
  around ``spark.read`` silently yields nulls later), so this module
  turns it on once per session and leaves it on — the setting only
  changes behavior for schemas that carry id metadata, which only
  these readers construct;
* whether a table's files carry ids at all is discovered by a
  footer-only probe (pyarrow ``read_schema``; ids surface as the
  ``PARQUET:field_id`` field metadata).  The probe distributes via
  ``mapInPandas`` above the same 64-file threshold as the Iceberg
  manifest walk, so a 10^6-file table never serializes footer reads
  on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import DataType, StructField, StructType

__all__ = ["probe_field_ids", "read_by_field_id", "with_field_ids"]

_DISTRIBUTE_PROBE_FROM = 64


def _probe_one(path: str) -> tuple[dict[int, str] | None, list[str]]:
    """``({field id: physical name} or None, [physical names])`` from
    one parquet footer.  The map is None when any top-level column
    lacks an id (partial stamping is treated as unstamped — id
    resolution needs every column); the name list is always complete
    so the name path can detect renames it cannot resolve."""
    import pyarrow.parquet as pq

    ids: dict[int, str] | None = {}
    names: list[str] = []
    for fld in pq.read_schema(path):
        names.append(fld.name)
        if ids is None:
            continue
        md = fld.metadata or {}
        fid = md.get(b"PARQUET:field_id")
        if fid is None:
            ids = None
        else:
            ids[int(fid)] = fld.name
    return ids, names


def probe_field_ids(
    paths: list[str], spark: SparkSession | None = None
) -> list[tuple[dict[int, str] | None, list[str]]]:
    """Footer probe for every path, order-preserving.  Distributed on
    executors above ``_DISTRIBUTE_PROBE_FROM`` files when a session is
    available (footers are ~KB; the returned maps are schema-sized,
    not data-sized)."""
    if spark is None or len(paths) < _DISTRIBUTE_PROBE_FROM:
        return [_probe_one(p) for p in paths]
    import json as _json

    jdf = spark.createDataFrame(
        [(i, p) for i, p in enumerate(paths)], "i bigint, path string"
    )

    def work(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"i": [], "m": [], "n": []}
            for i, p in zip(pdf["i"], pdf["path"]):
                m, names = _probe_one(p)
                rows["i"].append(int(i))
                rows["m"].append("" if m is None else _json.dumps(m))
                rows["n"].append(_json.dumps(names))
            yield pd.DataFrame(rows)

    got = {
        r["i"]: (r["m"], r["n"])
        for r in jdf.mapInPandas(
            work, "i bigint, m string, n string"
        ).collect()
    }
    return [
        (
            None if got[i][0] == "" else
            {int(k): v for k, v in _json.loads(got[i][0]).items()},
            _json.loads(got[i][1]),
        )
        for i in range(len(paths))
    ]


def read_by_field_id(
    spark: SparkSession,
    paths: list[str],
    fields: list[tuple[int, str, DataType]],
) -> DataFrame:
    """One distributed scan resolving columns by parquet field id:
    ``fields`` is ``[(field id, logical name, spark type), ...]`` in
    output order.  A file missing an id yields nulls for that column
    (the add-evolution semantics both table specs require); a file
    with NO ids fails loudly at scan time — callers route those files
    through the name path instead (see ``probe_field_ids``)."""
    schema = StructType([
        StructField(name, dtype, True, {"parquet.field.id": int(fid)})
        for fid, name, dtype in fields
    ])
    # action-time conf: must stay on for the frame's whole lifetime
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    return spark.read.schema(schema).parquet(*paths)


def with_field_ids(df: DataFrame, ids_by_name: dict[str, int]) -> DataFrame:
    """Re-alias every column with ``parquet.field.id`` metadata so a
    subsequent parquet write stamps ids into the footers.  Columns
    absent from ``ids_by_name`` fail loudly — silently unstamped
    columns would poison the table for id-resolution readers."""
    missing = [c for c in df.columns if c not in ids_by_name]
    if missing:
        raise ValueError(
            f"no field id assigned for columns {missing} "
            "(every written column needs one)"
        )
    return df.select(*[
        F.col(f"`{c}`").alias(
            c, metadata={"parquet.field.id": int(ids_by_name[c])}
        )
        for c in df.columns
    ])
