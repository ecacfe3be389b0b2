"""Pure-stdlib SQLite database-file reader — corpora ship ``.sqlite`` /
``.db`` artifacts (app exports, telemetry, scraped caches) and a
distributed pipeline needs to explode their tables into rows without a
per-executor C library round trip through temp files.

Implements the published SQLite file format (sqlite.org/fileformat2):

* the 100-byte header: magic, page size (including the ``1`` = 65536
  encoding), usable-size reserve, text encodings (UTF-8 and both
  UTF-16 variants), loud gates on WAL write-version files and
  non-positive page sizes;
* table b-trees: interior (0x05) and leaf (0x0D) pages, the page-1
  +100 offset, cell-pointer arrays, left-child walk with the
  right-most pointer;
* cell payload spill: the exact U/X/M/K overflow-threshold arithmetic
  and overflow-page chains;
* the record format: header/serial-type varints and all serial types —
  NULL, 1/2/3/4/6/8-byte big-endian two's-complement ints, float64,
  the constant-0/1 types, text and blob — plus the INTEGER PRIMARY KEY
  rowid-alias rule (the column's record slot is NULL; the value IS the
  rowid);
* ``sqlite_master`` (root page 1) for schema discovery; column names
  from a conservative CREATE TABLE parse that gates loudly on
  ``WITHOUT ROWID``, generated columns and table constraints it cannot
  attribute.

**The fixtures are genuinely third-party bytes**: tests and the q450
oracle build databases with Python's bundled real SQLite engine
(``sqlite3`` + ``Connection.serialize``), so this decoder is pinned
against the reference implementation's output, not an encoder twin.

Scale: per-payload executor work; a multi-GB file reads page-at-a-time
O(cells) with no driver involvement.  Reference parity: the reference
repo reads Postgres via a server; serverless SQLite artifacts extend
SURVEY §2.1's SQL-source family.
"""

from __future__ import annotations

import struct

__all__ = [
    "SqliteError",
    "is_sqlite",
    "sqlite_tables",
    "sqlite_read_table",
]

_MAGIC = b"SQLite format 3\x00"


class SqliteError(ValueError):
    """Malformed or unsupported SQLite database file."""


def is_sqlite(head: bytes) -> bool:
    return head[:16] == _MAGIC


def _varint(data: bytes, pos: int) -> tuple[int, int]:
    out = 0
    for i in range(8):
        if pos >= len(data):
            raise SqliteError("truncated varint")
        b = data[pos]
        pos += 1
        out = (out << 7) | (b & 0x7F)
        if not b & 0x80:
            return out, pos
    if pos >= len(data):
        raise SqliteError("truncated 9-byte varint")
    out = (out << 8) | data[pos]
    return out, pos + 1


class _Db:
    def __init__(self, data: bytes) -> None:
        data = bytes(data)
        if not is_sqlite(data):
            raise SqliteError("bad magic (not a SQLite 3 file)")
        if len(data) < 100:
            raise SqliteError("truncated header")
        ps = struct.unpack_from(">H", data, 16)[0]
        page_size = 65536 if ps == 1 else ps
        if page_size < 512 or page_size & (page_size - 1):
            raise SqliteError(f"illegal page size {ps}")
        write_ver = data[18]
        if write_ver == 2:
            raise SqliteError(
                "WAL-mode database: the main file may be stale without "
                "its -wal (fail-loud; checkpoint before ingesting)"
            )
        reserved = data[20]
        enc = struct.unpack_from(">I", data, 56)[0]
        if enc not in (1, 2, 3):
            raise SqliteError(f"unknown text encoding {enc}")
        self.data = data
        self.page_size = page_size
        self.usable = page_size - reserved
        if self.usable < 480:
            raise SqliteError("usable page size below the 480-byte floor")
        self.encoding = {1: "utf-8", 2: "utf-16-le", 3: "utf-16-be"}[enc]
        if len(data) % page_size:
            raise SqliteError("file size is not a whole page count")
        self.n_pages = len(data) // page_size

    def page(self, no: int) -> bytes:
        if not 1 <= no <= self.n_pages:
            raise SqliteError(f"page {no} out of range ({self.n_pages})")
        at = (no - 1) * self.page_size
        return self.data[at : at + self.page_size]

    # ----------------------------- b-tree walk -----------------------------

    def table_rows(self, root: int) -> list[tuple[int, list]]:
        """All (rowid, values) under a table b-tree root, in rowid
        order (the leaf walk is in-order)."""
        out: list[tuple[int, list]] = []
        seen: set[int] = set()
        self._walk(root, out, seen, 0)
        return out

    def _walk(self, no: int, out: list, seen: set, depth: int) -> None:
        if depth > 40:
            raise SqliteError("b-tree deeper than 40 levels (cycle?)")
        if no in seen:
            raise SqliteError(f"b-tree page cycle at {no}")
        seen.add(no)
        page = self.page(no)
        base = 100 if no == 1 else 0
        ptype = page[base]
        if ptype == 0x05:  # interior table
            ncells = struct.unpack_from(">H", page, base + 3)[0]
            right = struct.unpack_from(">I", page, base + 8)[0]
            ptr_at = base + 12
            for i in range(ncells):
                off = struct.unpack_from(">H", page, ptr_at + 2 * i)[0]
                if off + 4 > len(page):
                    raise SqliteError("interior cell offset out of page")
                child = struct.unpack_from(">I", page, off)[0]
                self._walk(child, out, seen, depth + 1)
            self._walk(right, out, seen, depth + 1)
            return
        if ptype != 0x0D:
            raise SqliteError(
                f"page {no}: expected a table b-tree page, got type "
                f"{ptype:#x} (index pages / corruption)"
            )
        ncells = struct.unpack_from(">H", page, base + 3)[0]
        ptr_at = base + 8
        for i in range(ncells):
            off = struct.unpack_from(">H", page, ptr_at + 2 * i)[0]
            if off >= len(page):
                raise SqliteError("leaf cell offset out of page")
            payload_len, pos = _varint(page, off)
            rowid, pos = _varint(page, pos)
            payload = self._payload(page, pos, payload_len)
            out.append((rowid, self._record(payload)))

    def _payload(self, page: bytes, pos: int, total: int) -> bytes:
        """Inline payload + overflow chain (the leaf-table U/X/M/K
        spill arithmetic, fileformat2 §1.6)."""
        u = self.usable
        x = u - 35
        if total <= x:
            if pos + total > len(page):
                raise SqliteError("inline payload overruns page")
            return page[pos : pos + total]
        m = ((u - 12) * 32) // 255 - 23
        k = m + (total - m) % (u - 4)
        inline = k if k <= x else m
        if pos + inline + 4 > len(page):
            raise SqliteError("spilled payload head overruns page")
        body = bytearray(page[pos : pos + inline])
        nxt = struct.unpack_from(">I", page, pos + inline)[0]
        remaining = total - inline
        hops = 0
        while remaining > 0:
            if nxt == 0:
                raise SqliteError("overflow chain ends early")
            opage = self.page(nxt)
            nxt = struct.unpack_from(">I", opage, 0)[0]
            take = min(remaining, self.usable - 4)
            body += opage[4 : 4 + take]
            remaining -= take
            hops += 1
            if hops > self.n_pages:
                raise SqliteError("overflow chain longer than the file")
        return bytes(body)

    def _record(self, payload: bytes) -> list:
        hlen, pos = _varint(payload, 0)
        if hlen > len(payload):
            raise SqliteError("record header longer than payload")
        stypes = []
        while pos < hlen:
            st, pos = _varint(payload, pos)
            stypes.append(st)
        if pos != hlen:
            raise SqliteError("record header desync")
        vals = []
        for st in stypes:
            if st == 0:
                vals.append(None)
            elif 1 <= st <= 6:
                width = (1, 2, 3, 4, 6, 8)[st - 1]
                if pos + width > len(payload):
                    raise SqliteError("record int overruns payload")
                v = int.from_bytes(
                    payload[pos : pos + width], "big", signed=True
                )
                vals.append(v)
                pos += width
            elif st == 7:
                if pos + 8 > len(payload):
                    raise SqliteError("record float overruns payload")
                vals.append(struct.unpack_from(">d", payload, pos)[0])
                pos += 8
            elif st == 8:
                vals.append(0)
            elif st == 9:
                vals.append(1)
            elif st >= 12:
                n = (st - 12) // 2
                if pos + n > len(payload):
                    raise SqliteError("record blob/text overruns payload")
                raw = payload[pos : pos + n]
                pos += n
                if st % 2:  # odd: text
                    try:
                        vals.append(raw.decode(self.encoding))
                    except UnicodeDecodeError as e:
                        raise SqliteError(
                            f"undecodable text value: {e}"
                        ) from None
                else:
                    vals.append(bytes(raw))
            else:
                raise SqliteError(f"reserved serial type {st}")
        return vals


def sqlite_tables(data: bytes) -> list[dict]:
    """Schema discovery: ``sqlite_master`` rows of type 'table'."""
    db = _Db(data)
    out = []
    for _rowid, vals in db.table_rows(1):
        if len(vals) != 5:
            raise SqliteError("sqlite_master row with wrong arity")
        typ, name, tbl, root, sql = vals
        if typ == "table":
            out.append(
                {"name": name, "tbl_name": tbl, "rootpage": root,
                 "sql": sql}
            )
    return out


_CONSTRAINT_LEADS = (
    "primary", "unique", "check", "foreign", "constraint",
)


def _columns_from_sql(sql: str) -> tuple[list[str], int]:
    """Column names from CREATE TABLE, plus the index of the INTEGER
    PRIMARY KEY rowid-alias column (-1 if none).  Conservative: gates
    loudly on WITHOUT ROWID and generated columns."""
    if sql is None:
        raise SqliteError("table has no CREATE TABLE sql")
    low = sql.lower()
    if "without rowid" in low.rsplit(")", 1)[-1]:
        raise SqliteError("WITHOUT ROWID tables unsupported (fail-loud)")
    lp = sql.find("(")
    rp = sql.rfind(")")
    if lp < 0 or rp < lp:
        raise SqliteError("CREATE TABLE sql without a column list")
    body = sql[lp + 1 : rp]
    # split on top-level commas
    parts = []
    depth = 0
    cur = []
    in_str = None
    for ch in body:
        if in_str:
            if ch == in_str:
                in_str = None
            cur.append(ch)
            continue
        if ch in "'\"`[":
            in_str = {"[": "]"}.get(ch, ch)
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    cols = []
    ipk = -1
    for part in parts:
        p = part.strip()
        if not p:
            continue
        first = p.split(None, 1)[0].strip('"`[]').lower()
        if first in _CONSTRAINT_LEADS:
            continue  # table-level constraint
        name = p.split(None, 1)[0].strip('"`[]')
        rest = p[len(p.split(None, 1)[0]):].lower() if " " in p else ""
        if "generated" in rest or " as " in rest + " ":
            raise SqliteError(
                f"generated column {name!r} unsupported (fail-loud)"
            )
        if "integer" in rest and "primary key" in rest:
            ipk = len(cols)
        cols.append(name)
    if not cols:
        raise SqliteError("CREATE TABLE with no columns")
    return cols, ipk


def sqlite_read_table(data: bytes, name: str) -> tuple[list[str], list[list]]:
    """Read one table: ``(column_names, rows)``.  The INTEGER PRIMARY
    KEY column (if any) is materialized from the rowid per the record-
    format rule; short records (legacy ALTER TABLE ADD COLUMN files)
    pad missing trailing columns with None."""
    db = _Db(data)
    meta = None
    for t in sqlite_tables(data):
        if t["name"] == name:
            meta = t
            break
    if meta is None:
        raise SqliteError(f"table {name!r} not in sqlite_master")
    cols, ipk = _columns_from_sql(meta["sql"])
    rows = []
    for rowid, vals in db.table_rows(meta["rootpage"]):
        if len(vals) < len(cols):
            vals = vals + [None] * (len(cols) - len(vals))
        elif len(vals) > len(cols):
            raise SqliteError(
                f"row with {len(vals)} values for {len(cols)} columns"
            )
        if ipk >= 0:
            vals = list(vals)
            vals[ipk] = rowid
        rows.append(vals)
    return cols, rows
