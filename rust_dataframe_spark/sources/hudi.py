"""Apache Hudi copy-on-write table reader/writer over the PUBLIC
timeline layout (hudi.apache.org/docs — table layout + timeline) — no
hudi-spark bundle.

A Hudi COW table is hive-partitioned parquet plus a ``.hoodie/``
timeline of instants: ``<ts>.commit`` (completed), ``.inflight`` /
``.requested`` (pending, must be ignored), plus ``hoodie.properties``.
Data files carry their identity in the FILENAME:
``<fileId>_<writeToken>_<instantTs>.parquet``.  A *file group* is all
files sharing a fileId within a partition; the live *file slice* is
the one whose instant is the LATEST completed instant <= the queried
instant — older slices are obsolete copies kept for time travel.

Reader surface:

* timeline scan: completed ``.commit``/``.replacecommit`` instants
  only; inflight/requested ignored; ``.replacecommit`` replaced file
  groups (clustering/insert-overwrite) drop;
* snapshot resolution: per (partition, fileId) keep the newest file
  version at-or-before the asked instant (``as_of=`` time travel);
* one-scan read: Hudi files are hive-partitioned AND carry partition
  columns in-file via ``_hoodie_partition_path`` metadata columns? —
  NOT relied on: this reader re-injects partition values parsed from
  the hive path through the same input_file_name broadcast join as
  the Delta/Iceberg readers, so tables written without the meta
  columns still read correctly;
* loud gates: merge-on-read tables (``.deltacommit`` instants or log
  files present — replaying those as parquet-only would silently drop
  updates), unfinished-only timelines, filename-shape violations.

The writer half emits the layout for fixtures and as a usable sink:
each commit writes hive-partitioned parquet with conformant filenames
and a ``<ts>.commit`` JSON instant; upserts come from writing a new
file version into an existing file group (same fileId, newer instant).

Reference parity: third member of the lakehouse trio next to
sources/delta.py and sources/iceberg.py (SURVEY §2.1 extension).
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from .lakehouse_util import attach_file_values

__all__ = [
    "HudiError",
    "read_hudi",
    "hudi_snapshot_files",
    "write_hudi_commit",
]


class HudiError(ValueError):
    """Malformed or unsupported Hudi table."""


_FILE_RE = re.compile(
    r"^(?P<fid>[0-9a-f-]+)_(?P<token>[\w-]+)_(?P<ts>\d+)\.parquet$"
)


def _timeline(path: str) -> list[tuple[int, str]]:
    hoodie = os.path.join(path, ".hoodie")
    if not os.path.isdir(hoodie):
        raise HudiError(f"not a Hudi table: no .hoodie under {path}")
    completed: list[tuple[int, str]] = []
    for name in os.listdir(hoodie):
        if name.endswith(".deltacommit"):
            raise HudiError(
                "merge-on-read timeline (.deltacommit) unsupported "
                "(fail-loud: log files would be silently dropped)"
            )
        for suffix in (".commit", ".replacecommit"):
            if name.endswith(suffix):
                stem = name[: -len(suffix)]
                if stem.isdigit():
                    completed.append((int(stem), suffix[1:]))
    if not completed:
        raise HudiError("timeline has no completed commits")
    return sorted(completed)


def _read_instant(path: str, ts: int, kind: str) -> dict:
    p = os.path.join(path, ".hoodie", f"{ts}.{kind}")
    with open(p, encoding="utf-8") as fh:
        raw = fh.read().strip()
    return json.loads(raw) if raw else {}


def hudi_snapshot_files(
    path: str, *, as_of: int | None = None
) -> list[tuple[str, str]]:
    """Live file slices at the latest (or ``as_of``) completed instant.
    Returns ``[(relative partition path, absolute file path), ...]``."""
    instants = _timeline(path)
    usable = [t for t in instants if as_of is None or t[0] <= as_of]
    if not usable:
        raise HudiError(f"no completed instant at or before {as_of}")
    cutoff = usable[-1][0]
    # Membership, not just <= cutoff: a file written by a FAILED or
    # still-inflight commit whose ts sits below a later completed
    # instant is NOT live (real Hudi's file-system view admits only
    # files whose instant is in the completed timeline).  Such files
    # are skipped, mirroring Hudi's ignore-pending semantics.
    completed_ts = {t for t, _k in usable}
    replaced: set[tuple[str, str]] = set()
    for ts, kind in usable:
        if kind == "replacecommit":
            meta = _read_instant(path, ts, kind)
            for part, fids in (
                meta.get("partitionToReplaceFileIds") or {}
            ).items():
                for fid in fids:
                    replaced.add((part, fid))
    best: dict[tuple[str, str], tuple[int, str, str]] = {}
    for root, _dirs, files in os.walk(path):
        rel_root = os.path.relpath(root, path)
        if rel_root.startswith(".hoodie") or "_tmp" in rel_root:
            continue
        part = "" if rel_root == "." else rel_root.replace(os.sep, "/")
        for name in files:
            if not name.endswith(".parquet"):
                continue
            if name.endswith(".log.parquet") or ".log." in name:
                raise HudiError(
                    "log files present: merge-on-read unsupported"
                )
            m = _FILE_RE.match(name)
            if not m:
                raise HudiError(
                    f"data file {name!r} violates the "
                    "fileId_writeToken_instant naming scheme"
                )
            ts = int(m.group("ts"))
            if ts > cutoff or ts not in completed_ts:
                continue  # newer than asked instant, or uncommitted
            fid = m.group("fid")
            if (part, fid) in replaced:
                continue
            key = (part, fid)
            cand = (ts, part, os.path.join(root, name))
            if key not in best or cand[0] > best[key][0]:
                best[key] = cand
    return [(p, f) for _ts, p, f in sorted(best.values())]


def _partition_cols(files: list[tuple[str, str]]) -> list[str]:
    cols: list[str] | None = None
    for part, _f in files:
        names = [
            seg.split("=", 1)[0] for seg in part.split("/") if "=" in seg
        ] if part else []
        if cols is None:
            cols = names
        elif cols != names:
            raise HudiError(
                f"inconsistent hive partition layout: {cols} vs {names}"
            )
    return cols or []


def read_hudi(
    spark: SparkSession, path: str, *, as_of: int | None = None
) -> DataFrame:
    """Snapshot (or time-travel) read with hive-path partition values
    re-injected via the one-scan broadcast join."""
    files = hudi_snapshot_files(path, as_of=as_of)
    if not files:
        raise HudiError("snapshot resolves to zero file slices")
    part_cols = _partition_cols(files)
    df = spark.read.parquet(*[f for _p, f in files])
    if not part_cols:
        return df
    file_to_vals = []
    for part, f in files:
        vals = dict(
            seg.split("=", 1) for seg in part.split("/") if "=" in seg
        )
        file_to_vals.append(
            (os.path.abspath(f), [vals[c] for c in part_cols])
        )
    out = attach_file_values(
        df, spark, file_to_vals, part_cols,
        err_cls=HudiError, tag="hudi",
    )
    for c in part_cols:
        out = out.withColumn(c, F.col(f"__pv_{c}")).drop(f"__pv_{c}")
    return out


# ---------------------------------------------------------------------------
# writer (fixture half + usable sink)
# ---------------------------------------------------------------------------


def write_hudi_commit(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    *,
    partition_by: list[str] | None = None,
    upsert_into: dict[str, str] | None = None,
) -> int:
    """Append ``df`` as one COW commit.  ``upsert_into`` maps a hive
    partition path to an EXISTING fileId: that partition's rows become
    a NEW VERSION of that file group (the copy-on-write update shape);
    everything else lands in fresh file groups.  Returns the instant
    timestamp."""
    import shutil

    partition_by = list(partition_by or [])
    hoodie = os.path.join(path, ".hoodie")
    os.makedirs(hoodie, exist_ok=True)
    props = os.path.join(hoodie, "hoodie.properties")
    if not os.path.exists(props):
        with open(props, "w", encoding="utf-8") as fh:
            fh.write("hoodie.table.name=fixture\n"
                     "hoodie.table.type=COPY_ON_WRITE\n")
    prev = []
    try:
        prev = _timeline(path)
    except HudiError:
        pass
    ts = int(time.time() * 1000)
    if prev and ts <= prev[-1][0]:
        ts = prev[-1][0] + 1
    tmp = os.path.join(path, f"_tmp_hudi_{uuid.uuid4().hex[:8]}")
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    if partition_by:
        tuples = sorted(
            tuple(str(r[c]) for c in partition_by)
            for r in df.select(*partition_by).distinct().collect()
        )
    else:
        tuples = [()]
    written: dict[str, list[str]] = {}
    for pt in tuples:
        sub = "/".join(f"{c}={v}" for c, v in zip(partition_by, pt))
        src_dir = os.path.join(tmp, sub) if sub else tmp
        files = sorted(
            n for n in os.listdir(src_dir) if n.endswith(".parquet")
        )
        full_dir = os.path.join(path, sub) if sub else path
        os.makedirs(full_dir, exist_ok=True)
        for k, part in enumerate(files):
            fid = (upsert_into or {}).get(sub) if k == 0 else None
            if fid is None:
                fid = str(uuid.uuid5(
                    uuid.NAMESPACE_URL, f"{sub}/{ts}/{k}"
                ))
            fname = f"{fid}_0-{k}-0_{ts}.parquet"
            os.replace(os.path.join(src_dir, part),
                       os.path.join(full_dir, fname))
            written.setdefault(sub, []).append(fname)
    shutil.rmtree(tmp, ignore_errors=True)
    with open(os.path.join(hoodie, f"{ts}.commit"), "w",
              encoding="utf-8") as fh:
        json.dump({"operationType": "UPSERT" if upsert_into else
                   "INSERT", "partitionToWriteStats": {
                       p: [{"path": n} for n in ns]
                       for p, ns in written.items()
                   }}, fh)
    return ts
