"""SQLite file-reader tests (operators/sqlite_reader.py) behind q450.
Every fixture is built by Python's bundled REAL SQLite engine
(sqlite3 + Connection.serialize), so the pure-stdlib parser is pinned
against the reference implementation's bytes — no encoder twin."""

import random
import sqlite3

import pytest

from rust_dataframe_spark.operators.sqlite_reader import (
    SqliteError,
    is_sqlite,
    sqlite_read_table,
    sqlite_tables,
)


def _build(stmts):
    conn = sqlite3.connect(":memory:")
    cur = conn.cursor()
    for stmt, args in stmts:
        if args is None:
            cur.execute(stmt)
        else:
            cur.executemany(stmt, args)
    conn.commit()
    blob = bytes(conn.serialize())
    conn.close()
    return blob


class TestRealEngineBytes:
    def test_multi_page_all_serial_types(self):
        rng = random.Random(3)
        rows = [
            (
                i + 1,
                f"name-{i}" * (1 + i % 3),
                rng.randrange(-(2 ** 40), 2 ** 40),
                i / 7,
                None if i % 5 == 0 else "x" * (i % 50),
                sqlite3.Binary(bytes((i + k) % 256 for k in range(i % 20))),
                i % 2,
            )
            for i in range(3000)  # forces interior b-tree pages
        ]
        blob = _build([
            ("CREATE TABLE t (id INTEGER PRIMARY KEY, nm TEXT, "
             "big INTEGER, f REAL, s TEXT, b BLOB, flag INTEGER)", None),
            ("INSERT INTO t VALUES (?,?,?,?,?,?,?)", rows),
        ])
        assert is_sqlite(blob)
        assert [t["name"] for t in sqlite_tables(blob)] == ["t"]
        cols, got = sqlite_read_table(blob, "t")
        assert cols == ["id", "nm", "big", "f", "s", "b", "flag"]
        assert len(got) == 3000
        for want, have in zip(rows, got):
            w = list(want)
            w[5] = bytes(w[5])
            assert list(have) == w

    def test_overflow_chains(self):
        long = "Z" * 100000
        blob = _build([
            ("CREATE TABLE o (k INTEGER PRIMARY KEY, v TEXT)", None),
            ("INSERT INTO o VALUES (?,?)", [(1, long), (2, "short")]),
        ])
        _, got = sqlite_read_table(blob, "o")
        assert got[0][1] == long and got[1][1] == "short"

    def test_rowid_alias_materialized(self):
        blob = _build([
            ("CREATE TABLE r (pk INTEGER PRIMARY KEY, v TEXT)", None),
            ("INSERT INTO r (v) VALUES (?)", [("a",), ("b",)]),
        ])
        _, got = sqlite_read_table(blob, "r")
        assert [r[0] for r in got] == [1, 2]  # engine-assigned rowids

    def test_legacy_short_records_pad(self):
        conn = sqlite3.connect(":memory:")
        cur = conn.cursor()
        cur.execute("CREATE TABLE a (x INTEGER)")
        cur.execute("INSERT INTO a VALUES (5)")
        conn.commit()
        cur.execute("ALTER TABLE a ADD COLUMN y TEXT")
        cur.execute("INSERT INTO a VALUES (6, 'new')")
        conn.commit()
        blob = bytes(conn.serialize())
        conn.close()
        cols, got = sqlite_read_table(blob, "a")
        assert cols == ["x", "y"]
        assert got == [[5, None], [6, "new"]]

    def test_multiple_tables_and_indexes_skipped(self):
        blob = _build([
            ("CREATE TABLE t1 (a INT)", None),
            ("CREATE TABLE t2 (b TEXT)", None),
            ("CREATE INDEX i2 ON t2 (b)", None),
            ("INSERT INTO t2 VALUES ('hi')", None),
        ])
        names = [t["name"] for t in sqlite_tables(blob)]
        assert names == ["t1", "t2"]
        assert sqlite_read_table(blob, "t2")[1] == [["hi"]]

    def test_deleted_rows_not_resurrected(self):
        blob = _build([
            ("CREATE TABLE d (k INTEGER PRIMARY KEY, v TEXT)", None),
            ("INSERT INTO d VALUES (?,?)",
             [(i, f"v{i}") for i in range(200)]),
            ("DELETE FROM d WHERE k % 2 = 0", None),
        ])
        _, got = sqlite_read_table(blob, "d")
        assert [r[0] for r in got] == [k for k in range(200) if k % 2]


class TestGates:
    def test_without_rowid_gate(self):
        blob = _build([
            ("CREATE TABLE w (k TEXT PRIMARY KEY, v INT) WITHOUT ROWID",
             None),
        ])
        with pytest.raises(SqliteError, match="WITHOUT ROWID"):
            sqlite_read_table(blob, "w")

    def test_missing_table(self):
        blob = _build([("CREATE TABLE q (x INT)", None)])
        with pytest.raises(SqliteError, match="not in sqlite_master"):
            sqlite_read_table(blob, "nope")

    def test_bad_magic(self):
        with pytest.raises(SqliteError, match="magic"):
            sqlite_tables(b"garbage" + bytes(200))

    def test_truncation_loud(self):
        blob = _build([
            ("CREATE TABLE t (x INT)", None),
            ("INSERT INTO t VALUES (1)", None),
        ])
        for frac in (0.1, 0.5, 0.9):
            cut = blob[: int(len(blob) * frac)]
            with pytest.raises(SqliteError):
                sqlite_read_table(cut, "t")

    def test_flips_never_undocumented(self):
        rng = random.Random(77)
        blob = _build([
            ("CREATE TABLE t (x INTEGER, s TEXT)", None),
            ("INSERT INTO t VALUES (?,?)",
             [(i, f"s{i}" * 5) for i in range(300)]),
        ])
        for _ in range(60):
            i = rng.randrange(len(blob))
            m = blob[:i] + bytes([blob[i] ^ 0xFF]) + blob[i + 1:]
            try:
                sqlite_read_table(m, "t")
            except SqliteError:
                pass  # documented
            # silent success allowed: flips in cold/freelist bytes
