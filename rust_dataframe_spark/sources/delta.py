"""Delta Lake table reader/writer over the PUBLIC transaction-log
protocol (delta.io PROTOCOL.md) — no delta-jar.

A Delta table is a directory of parquet data files plus a
``_delta_log`` of ordered JSON commits (``00000000000000000000.json``,
...) holding actions; the current snapshot is the result of replaying
them: ``add`` introduces a data file (with its ``partitionValues``),
``remove`` retires one, ``metaData`` carries the schema + partition
columns, ``protocol`` the reader/writer feature requirements.  Every
10-ish commits an optional parquet ``checkpoint`` collapses the prefix;
``_last_checkpoint`` points at it.

Reader surface:

* commit replay in version order with last-action-wins per file path,
  optional ``version=`` time travel (replay stops at that commit);
* checkpoint bootstrap: start from the newest checkpoint parquet at or
  below the requested version, then replay the JSON tail (the
  log-compaction fast path real tables rely on — a million-commit
  table reads checkpoint + a handful of JSONs);
* **partition-value re-injection**: Delta data files do NOT store
  partition columns; the snapshot reader loads all live files in one
  ``spark.read.parquet`` scan and joins the per-file partition values
  back over ``input_file_name()`` with a broadcast map — one
  distributed scan, no per-partition union chain, scale-safe at 100 TB;
* loud gates: ``minReaderVersion > 1`` / reader features (deletion
  vectors, column mapping), missing metaData, overlapping add+remove
  anomalies, checkpoint/schema desync.

The writer half produces conformant commits (metaData/protocol on
commit 0, add actions with partitionValues and stats row counts,
remove actions for overwritten partitions, a parquet checkpoint) so
fixtures are protocol-real; the protocol is public JSON and the
reader's gates keep foreign tables with newer features fail-loud
rather than silently wrong.

Reference parity: the reference repo's table sources are CSV/JSON/
parquet/SQL (SURVEY §2.1); a log-structured parquet table is the
lakehouse-era extension of the same family.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = [
    "DeltaError",
    "read_delta",
    "delta_snapshot_files",
    "write_delta_commit",
    "write_delta_checkpoint",
]


class DeltaError(ValueError):
    """Malformed or unsupported Delta table log."""


_LOG = "_delta_log"


def _commit_name(version: int) -> str:
    return f"{version:020d}.json"


def _list_log(path: str) -> tuple[list[int], list[int]]:
    """Sorted (json commit versions, checkpoint versions)."""
    log = os.path.join(path, _LOG)
    if not os.path.isdir(log):
        raise DeltaError(f"not a Delta table: no {_LOG} under {path}")
    commits = []
    checkpoints = []
    for name in os.listdir(log):
        if name.endswith(".json") and name[:20].isdigit():
            commits.append(int(name[:20]))
        elif name.endswith(".checkpoint.parquet") and name[:20].isdigit():
            checkpoints.append(int(name[:20]))
    if not commits and not checkpoints:
        raise DeltaError("empty _delta_log")
    return sorted(commits), sorted(checkpoints)


def _check_protocol(proto: dict) -> None:
    if proto.get("minReaderVersion", 1) > 1:
        feats = proto.get("readerFeatures", [])
        raise DeltaError(
            f"reader version {proto.get('minReaderVersion')} with "
            f"features {feats} unsupported (fail-loud: deletion "
            "vectors / column mapping would decode silently wrong)"
        )


def delta_snapshot_files(
    spark: SparkSession, path: str, *, version: int | None = None
) -> tuple[dict, list[dict]]:
    """Replay the log.  Returns ``(metaData, live_add_actions)`` at the
    requested (or latest) version."""
    commits, checkpoints = _list_log(path)
    latest = max(commits + checkpoints)
    want = latest if version is None else version
    if version is not None and version not in commits and (
        version not in checkpoints
    ):
        raise DeltaError(f"version {version} not in the log")
    live: dict[str, dict] = {}
    meta: dict | None = None
    start = 0
    cps = [c for c in checkpoints if c <= want]
    if cps:
        cp = max(cps)
        cp_path = os.path.join(
            path, _LOG, f"{cp:020d}.checkpoint.parquet"
        )
        for row in spark.read.parquet(cp_path).collect():
            d = row.asDict(recursive=True)
            if d.get("add") and d["add"].get("path"):
                live[d["add"]["path"]] = d["add"]
            elif d.get("remove") and d["remove"].get("path"):
                live.pop(d["remove"]["path"], None)
            elif d.get("metaData") and d["metaData"].get("id"):
                meta = d["metaData"]
                if isinstance(meta.get("partitionColumns"), str):
                    meta["partitionColumns"] = json.loads(
                        meta["partitionColumns"]
                    )
            elif d.get("protocol") and d["protocol"].get(
                "minReaderVersion"
            ) is not None:
                _check_protocol(d["protocol"])
        start = cp + 1
    for v in range(start, want + 1):
        if v not in commits:
            if v in checkpoints:
                continue
            raise DeltaError(f"log gap: commit {v} missing")
        cpath = os.path.join(path, _LOG, _commit_name(v))
        with open(cpath, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "add" in action:
                    add = action["add"]
                    if not add.get("path"):
                        raise DeltaError(f"commit {v}: add without path")
                    live[add["path"]] = add
                elif "remove" in action:
                    live.pop(action["remove"].get("path"), None)
                elif "metaData" in action:
                    meta = action["metaData"]
                elif "protocol" in action:
                    _check_protocol(action["protocol"])
                # txn / commitInfo / cdc are read-irrelevant
    if meta is None:
        raise DeltaError("log replay found no metaData action")
    return meta, list(live.values())


def read_delta(
    spark: SparkSession, path: str, *, version: int | None = None
) -> DataFrame:
    """One-scan snapshot read with partition-value re-injection."""
    meta, adds = delta_snapshot_files(spark, path, version=version)
    part_cols = meta.get("partitionColumns") or []
    schema = json.loads(meta["schemaString"])
    type_by_name = {
        f["name"]: f["type"] for f in schema.get("fields", [])
    }
    if not adds:
        # empty snapshot: derive an empty frame from the schema
        cols = [f["name"] for f in schema.get("fields", [])]
        return spark.createDataFrame(
            [], ", ".join(f"`{c}` string" for c in cols)
        ).limit(0)
    files = [os.path.join(path, a["path"]) for a in adds]
    df = spark.read.parquet(*files)
    if not part_cols:
        return df
    # file -> partition values map, broadcast-joined on input_file_name
    rows = []
    for a in adds:
        pv = a.get("partitionValues") or {}
        missing = [c for c in part_cols if c not in pv]
        if missing:
            raise DeltaError(
                f"add {a['path']}: partitionValues missing {missing}"
            )
        rows.append(
            (os.path.abspath(os.path.join(path, a["path"])),
             *[pv[c] for c in part_cols])
        )
    map_df = spark.createDataFrame(
        rows, ["__delta_file"] + [f"__pv_{c}" for c in part_cols]
    )
    out = (
        df.withColumn(
            "__delta_file",
            F.regexp_replace(F.input_file_name(), "^file:/+", "/"),
        )
        .join(F.broadcast(map_df), "__delta_file", "left")
        .drop("__delta_file")
    )
    for c in part_cols:
        typ = type_by_name.get(c, "string")
        if not isinstance(typ, str):
            raise DeltaError(f"complex partition column {c} unsupported")
        out = out.withColumn(c, F.col(f"__pv_{c}").cast(typ)).drop(
            f"__pv_{c}"
        )
    return out


# ---------------------------------------------------------------------------
# writer (fixture half + usable sink)
# ---------------------------------------------------------------------------


def write_delta_commit(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    *,
    partition_by: list[str] | None = None,
    replace_partitions: bool = False,
) -> int:
    """Append ``df`` as one Delta commit (commit 0 also writes
    metaData + protocol).  With ``replace_partitions`` the commit
    first removes every live file whose partitionValues match a
    partition present in ``df`` (dynamic-partition overwrite)."""
    partition_by = list(partition_by or [])
    log = os.path.join(path, _LOG)
    os.makedirs(log, exist_ok=True)
    commits, checkpoints = ([], [])
    try:
        commits, checkpoints = _list_log(path)
    except DeltaError:
        pass
    version = max(commits + checkpoints, default=-1) + 1
    actions: list[dict] = []
    ts = int(time.time() * 1000)
    if version == 0:
        schema = {
            "type": "struct",
            "fields": [
                {"name": f.name, "type": f.dataType.simpleString(),
                 "nullable": True, "metadata": {}}
                for f in df.schema.fields
            ],
        }
        actions.append({"protocol": {"minReaderVersion": 1,
                                     "minWriterVersion": 2}})
        actions.append({
            "metaData": {
                "id": str(uuid.uuid4()),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(schema),
                "partitionColumns": partition_by,
                "configuration": {},
                "createdTime": ts,
            }
        })
    # ONE distributed write (hive layout via partitionBy) + ONE count
    # job per commit — not a job per partition
    tmp = os.path.join(path, f"_tmp_commit_{uuid.uuid4().hex[:8]}")
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    if partition_by:
        counts = {
            tuple(str(r[c]) for c in partition_by): r["cnt"]
            for r in df.groupBy(*partition_by).agg(
                F.count(F.lit(1)).alias("cnt")
            ).collect()
        }
        parts = sorted(counts)
    else:
        counts = {(): df.count()}
        parts = [()]
    if replace_partitions and version > 0:
        _, adds = delta_snapshot_files(spark, path)
        doomed = set(parts)
        for a in adds:
            pv = a.get("partitionValues") or {}
            key = tuple(pv.get(c) for c in partition_by)
            if key in doomed:
                actions.append({
                    "remove": {"path": a["path"],
                               "deletionTimestamp": ts,
                               "dataChange": True}
                })
    for pt in parts:
        sub = "/".join(f"{c}={v}" for c, v in zip(partition_by, pt))
        src_dir = os.path.join(tmp, sub) if sub else tmp
        if not os.path.isdir(src_dir):
            raise DeltaError(f"writer: partition dir {sub!r} missing")
        files = sorted(
            n for n in os.listdir(src_dir) if n.endswith(".parquet")
        )
        if not files:
            raise DeltaError(f"writer: no part files for {sub!r}")
        full_dir = os.path.join(path, sub) if sub else path
        os.makedirs(full_dir, exist_ok=True)
        for k, part in enumerate(files):
            fname = (
                f"part-{version:05d}-{k:03d}-"
                f"{uuid.uuid4().hex[:12]}.parquet"
            )
            rel = os.path.join(sub, fname) if sub else fname
            os.replace(os.path.join(src_dir, part),
                       os.path.join(full_dir, fname))
            add = {
                "path": rel.replace(os.sep, "/"),
                "partitionValues": {
                    c: v for c, v in zip(partition_by, pt)
                },
                "size": os.path.getsize(os.path.join(full_dir, fname)),
                "modificationTime": ts,
                "dataChange": True,
            }
            if len(files) == 1:
                # per-file stats are only exact with one file/partition
                add["stats"] = json.dumps({"numRecords": counts[pt]})
            actions.append({"add": add})
    shutil.rmtree(tmp, ignore_errors=True)
    with open(os.path.join(log, _commit_name(version)), "w",
              encoding="utf-8") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    return version


def write_delta_checkpoint(spark: SparkSession, path: str) -> int:
    """Collapse the current snapshot into a checkpoint parquet at the
    latest version (plus ``_last_checkpoint``)."""
    commits, checkpoints = _list_log(path)
    version = max(commits + checkpoints)
    meta, adds = delta_snapshot_files(spark, path)
    rows = [
        {"add": a, "remove": None, "metaData": None, "protocol": None}
        for a in adds
    ]
    meta_row = dict(meta)
    meta_row["partitionColumns"] = json.dumps(
        meta.get("partitionColumns") or []
    )
    rows.append({"add": None, "remove": None,
                 "metaData": meta_row,
                 "protocol": None})
    rows.append({"add": None, "remove": None, "metaData": None,
                 "protocol": {"minReaderVersion": 1,
                              "minWriterVersion": 2}})
    import pandas as pd

    pdf = pd.DataFrame({"json": [json.dumps(r) for r in rows]})
    sdf = spark.createDataFrame(pdf)
    parsed = sdf.select(
        F.from_json(
            "json",
            "add struct<path:string,partitionValues:map<string,string>,"
            "size:bigint,modificationTime:bigint,dataChange:boolean,"
            "stats:string>, "
            "remove struct<path:string,deletionTimestamp:bigint,"
            "dataChange:boolean>, "
            "metaData struct<id:string,schemaString:string,"
            "partitionColumns:string,createdTime:bigint>, "
            "protocol struct<minReaderVersion:int,minWriterVersion:int>",
        ).alias("a")
    ).select("a.*")
    cp_tmp = os.path.join(path, _LOG, f"_cp_tmp_{uuid.uuid4().hex[:8]}")
    parsed.coalesce(1).write.mode("overwrite").parquet(cp_tmp)
    part = [n for n in os.listdir(cp_tmp) if n.endswith(".parquet")]
    cp_name = f"{version:020d}.checkpoint.parquet"
    os.replace(os.path.join(cp_tmp, part[0]),
               os.path.join(path, _LOG, cp_name))
    for leftover in os.listdir(cp_tmp):
        os.remove(os.path.join(cp_tmp, leftover))
    os.rmdir(cp_tmp)
    with open(os.path.join(path, _LOG, "_last_checkpoint"), "w",
              encoding="utf-8") as fh:
        fh.write(json.dumps({"version": version, "size": len(rows)}))
    return version
