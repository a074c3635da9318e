"""SQLite file-format decoding (functions/sqlite_file — r15
post-seal): the from-scratch page/b-tree/record parser differentially
pinned against the stdlib reference engine (every fixture authored BY
sqlite3, every decoded table compared row-for-row with its SELECT
output and with the module's own native twin), across page sizes,
text encodings, overflow chains, multi-level b-trees, rowid aliasing,
ALTER TABLE padding, and freelist churn — plus the honest-raise
surface (WITHOUT ROWID, hostile/truncated images, mutation fuzz)."""

from __future__ import annotations

import os
import random
import sqlite3
import tempfile

import pytest

from data_warehouse_migration_spark.functions.sqlite_file import (
    sqlite_rows,
    sqlite_rows_native,
    sqlite_tables,
)


def build_db(setup, pragmas=()) -> bytes:
    fd, path = tempfile.mkstemp(suffix=".db")
    os.close(fd)
    os.unlink(path)
    con = sqlite3.connect(path)
    try:
        for p in pragmas:
            con.execute(p)
        setup(con)
        con.commit()
    finally:
        con.close()
    with open(path, "rb") as f:
        blob = f.read()
    os.unlink(path)
    return blob


def assert_matches_reference(blob: bytes, table: str) -> list[tuple]:
    """The core differential: our parser == the reference engine ==
    the native twin, row-for-row in rowid order."""
    mine = sqlite_rows(blob, table)
    ref = sqlite_rows_native(blob, table)
    assert mine == ref, (table, next(
        (pair for pair in zip(mine, ref) if pair[0] != pair[1]), None))
    return mine


def test_type_matrix_and_rowid_alias():
    """Every serial-type family in one table: NULL, ints at all six
    byte widths (positive and negative), float64, the schema-format-4
    0/1 constants, text with multi-byte UTF-8, blobs, plus INTEGER
    PRIMARY KEY aliasing (stored as NULL, materialized from rowid)."""
    def setup(con):
        con.execute(
            "CREATE TABLE t (id INTEGER PRIMARY KEY, i INT, f REAL, "
            "s TEXT, b BLOB)"
        )
        ints = [0, 1, -1, 127, -128, 255, 32767, -32768, 1 << 23,
                -(1 << 23), 1 << 31, -(1 << 31), 1 << 47, -(1 << 47),
                (1 << 63) - 1, -(1 << 63)]
        for k, v in enumerate(ints):
            con.execute(
                "INSERT INTO t VALUES (?,?,?,?,?)",
                (k + 1, v, v * 0.5, f"ü中-{v}", v.to_bytes(8, "big",
                                                          signed=True)),
            )
        con.execute("INSERT INTO t (i) VALUES (NULL)")
        con.execute("INSERT INTO t VALUES (1000, 3, 1e308, '', x'')")

    blob = build_db(setup)
    rows = assert_matches_reference(blob, "t")
    assert rows[-1][0] == 1000  # the alias carries the explicit id
    assert any(r[0] == 17 for r in rows)  # and the auto-assigned one


def test_schema_listing_tables_indexes_views():
    def setup(con):
        con.execute("CREATE TABLE a (x INT)")
        con.execute("CREATE TABLE b (y TEXT)")
        con.execute("CREATE INDEX ix_a ON a (x)")
        con.execute("CREATE VIEW v AS SELECT x FROM a")
        con.executemany("INSERT INTO a VALUES (?)", [(i,) for i in range(9)])

    blob = build_db(setup)
    listing = sqlite_tables(blob)
    kinds = {(e["type"], e["name"]) for e in listing}
    assert {("table", "a"), ("table", "b"), ("index", "ix_a"),
            ("view", "v")} <= kinds
    assert assert_matches_reference(blob, "a") == [(i,) for i in range(9)]
    assert assert_matches_reference(blob, "b") == []


@pytest.mark.parametrize("page_pragma,label", [
    ("PRAGMA page_size=512", "512"),
    ("PRAGMA page_size=4096", "4096"),
    ("PRAGMA page_size=65536", "65536-encoded-as-1"),
])
def test_overflow_chains_and_interior_pages_across_page_sizes(
        page_pragma, label):
    """Payloads far beyond one page force real overflow chains, and
    enough rows force multi-level interior b-trees — the spill
    formula and in-order traversal differentially pinned at the
    smallest, default, and maximum page sizes."""
    def setup(con):
        con.execute("CREATE TABLE big (x TEXT, y BLOB)")
        rng = random.Random(hash(label) & 0xFFFF)
        con.executemany(
            "INSERT INTO big VALUES (?,?)",
            [("w" * rng.randrange(10, 30_000),
              rng.randbytes(rng.randrange(0, 9_000)))
             for _ in range(400)],
        )

    blob = build_db(setup, [page_pragma])
    assert len(assert_matches_reference(blob, "big")) == 400


@pytest.mark.parametrize("enc", ["UTF-16le", "UTF-16be"])
def test_utf16_text_encodings(enc):
    def setup(con):
        con.execute("CREATE TABLE u (s TEXT, t TEXT)")
        con.executemany(
            "INSERT INTO u VALUES (?,?)",
            [(f"Überraschung-{i}", f"中文测试 русский {i}")
             for i in range(300)],
        )

    blob = build_db(setup, [f"PRAGMA encoding='{enc}'"])
    assert len(assert_matches_reference(blob, "u")) == 300


def test_freelist_churn_and_alter_table_padding():
    """Deletions leave free pages the walk must skip via the b-tree
    (never by scanning pages); rows written before an ALTER TABLE ADD
    COLUMN are shorter than the final schema and pad with None
    exactly as the reference engine fills them."""
    def setup(con):
        con.execute("CREATE TABLE c (a TEXT)")
        con.executemany("INSERT INTO c VALUES (?)",
                        [(f"row {i} " * 30,) for i in range(1_000)])
        con.execute("DELETE FROM c WHERE rowid % 3 = 0")
        con.execute("ALTER TABLE c ADD COLUMN extra INT")
        con.execute("INSERT INTO c VALUES ('tail', 42)")
        con.execute("DELETE FROM c WHERE rowid % 7 = 1")

    blob = build_db(setup)
    rows = assert_matches_reference(blob, "c")
    assert rows[-1] == ("tail", 42)
    assert all(len(r) == 2 for r in rows)


def test_deep_tree_and_max_rows():
    def setup(con):
        con.execute("CREATE TABLE d (n INT)")
        con.executemany("INSERT INTO d VALUES (?)",
                        [(i,) for i in range(25_000)])

    blob = build_db(setup, ["PRAGMA page_size=512"])
    rows = assert_matches_reference(blob, "d")
    assert rows == [(i,) for i in range(25_000)]
    head = sqlite_rows(blob, "d", max_rows=100)
    assert head == rows[:100]  # rowid order, capped early


def test_autoincrement_and_sqlite_sequence():
    def setup(con):
        con.execute(
            "CREATE TABLE q (id INTEGER PRIMARY KEY AUTOINCREMENT, v TEXT)")
        con.executemany("INSERT INTO q (v) VALUES (?)",
                        [(f"v{i}",) for i in range(20)])

    blob = build_db(setup)
    assert_matches_reference(blob, "q")
    # the engine's bookkeeping table decodes like any other
    assert assert_matches_reference(blob, "sqlite_sequence") == [("q", 20)]


def test_table_level_constraints_not_counted_as_columns():
    def setup(con):
        con.execute(
            "CREATE TABLE k (a INT, b INT, c TEXT, "
            "PRIMARY KEY (a, b), UNIQUE (c), CHECK (a >= 0))")
        con.executemany("INSERT INTO k VALUES (?,?,?)",
                        [(i, i * 2, f"s{i}") for i in range(50)])
        con.execute("ALTER TABLE k ADD COLUMN d INT")

    blob = build_db(setup)
    rows = assert_matches_reference(blob, "k")
    assert all(len(r) == 4 for r in rows)


def test_without_rowid_raises():
    def setup(con):
        con.execute(
            "CREATE TABLE w (k TEXT PRIMARY KEY, v INT) WITHOUT ROWID")
        con.execute("INSERT INTO w VALUES ('a', 1)")

    blob = build_db(setup)
    with pytest.raises(NotImplementedError, match="WITHOUT ROWID"):
        sqlite_rows(blob, "w")


def test_hostile_inputs_raise_valueerror():
    for bad in (
        b"",
        b"not a database at all",
        b"SQLite format 3\x00" + b"\x00" * 84,     # header only
        b"SQLite format 3\x00" + b"\x00" * 5000,   # zeroed page sizes
    ):
        with pytest.raises(ValueError):
            sqlite_tables(bad)
    def setup(con):
        con.execute("CREATE TABLE t (a INT)")
        con.execute("INSERT INTO t VALUES (1)")
    blob = build_db(setup)
    with pytest.raises(ValueError, match="not in sqlite_schema"):
        sqlite_rows(blob, "missing")
    # truncating the image below the declared page count must raise,
    # not mis-decode, once a walk touches the missing tail
    with pytest.raises(ValueError):
        sqlite_rows(blob[: len(blob) // 2] , "t")


def test_mutation_fuzz_never_escapes_the_exception_contract():
    """300 seeded single-byte corruptions of a real image: decoded
    output may legally differ (no checksums in the format), but the
    only raise classes are ValueError/NotImplementedError — no raw
    IndexError/struct.error/UnicodeDecodeError/RecursionError."""
    def setup(con):
        con.execute("CREATE TABLE f (a INT, b TEXT, c BLOB)")
        con.executemany(
            "INSERT INTO f VALUES (?,?,?)",
            [(i, f"text {i} " * 20, bytes(range(i % 256)))
             for i in range(300)],
        )

    blob = bytearray(build_db(setup, ["PRAGMA page_size=512"]))
    rng = random.Random(0x5EED)
    for _ in range(300):
        i = rng.randrange(len(blob))
        old = blob[i]
        blob[i] ^= 1 << rng.randrange(8)
        try:
            sqlite_rows(bytes(blob), "f")
        except (ValueError, NotImplementedError):
            pass
        blob[i] = old


# --- property fuzz: random schemas and values through the reference
# --- engine, decoded identically --------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_VALUES = (
    st.none()
    | st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1)
    | st.floats(allow_nan=False)  # NaN legally becomes NULL on insert
    | st.text(max_size=60)
    | st.binary(max_size=60)
)


@settings(
    max_examples=25, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    n_cols=st.integers(min_value=1, max_value=8),
    rows=st.lists(st.lists(_VALUES, min_size=8, max_size=8), max_size=40),
    page_size=st.sampled_from([512, 4096]),
)
def test_property_random_tables_decode_identically(n_cols, rows, page_size):
    def setup(con):
        cols = ", ".join(f"c{i}" for i in range(n_cols))
        con.execute(f"CREATE TABLE p ({cols})")
        marks = ", ".join("?" * n_cols)
        con.executemany(
            f"INSERT INTO p VALUES ({marks})",
            [tuple(r[:n_cols]) for r in rows],
        )

    blob = build_db(setup, [f"PRAGMA page_size={page_size}"])
    assert_matches_reference(blob, "p")


def test_spark_stage_extracts_tables(spark):
    """The scale-posture claim as a pin: per-asset parsing inside one
    Arrow-batched mapInPandas stage — (asset, table) rows out, counts
    matching the reference engine, no temp files on the engine path."""
    import pandas as pd

    blobs = []
    for k in range(8):
        def setup(con, k=k):
            con.execute("CREATE TABLE t (a INT, b TEXT)")
            con.executemany(
                "INSERT INTO t VALUES (?,?)",
                [(i, f"db{k} row{i}") for i in range(50 + k)],
            )
            con.execute("CREATE TABLE empty (x INT)")
        blobs.append((k, build_db(setup)))

    df = spark.createDataFrame(blobs, "db_id int, blob binary")

    def stage(batches):
        from data_warehouse_migration_spark.functions.sqlite_file import (
            sqlite_rows as rows_fn,
            sqlite_tables as tables_fn,
        )

        for pdf in batches:
            out = []
            for db_id, blob in zip(pdf["db_id"], pdf["blob"]):
                for entry in tables_fn(bytes(blob)):
                    if entry["type"] != "table":
                        continue
                    n = len(rows_fn(bytes(blob), entry["name"]))
                    out.append((int(db_id), entry["name"], n))
            yield pd.DataFrame(out, columns=["db_id", "table", "n_rows"])

    got = sorted(
        tuple(r) for r in df.repartition(4, "db_id").mapInPandas(
            stage, schema="db_id int, table string, n_rows int"
        ).collect()
    )
    want = sorted(
        [(k, "t", 50 + k) for k in range(8)]
        + [(k, "empty", 0) for k in range(8)]
    )
    assert got == want
    for k, blob in blobs[:2]:  # reference agreement spot-check
        assert len(sqlite_rows_native(blob, "t")) == 50 + k
