"""Local replica of the driver's correctness gate.

Runs every catalog query on Spark AND its DuckDB oracle on the same
parquet tables, then compares row count, column names/order-insensitive
sorted columns, and an order-insensitive value hash. Usage:

    python tools/check_oracle.py [--window] [sf_dir] [query ...]

Defaults to /root/testdata/sf0.001 and all queries; ``--window``
restricts to the first 50 registry entries — the driver's attestation
window (ROTATION.md).
"""

from __future__ import annotations

import hashlib
import os
import sys
import time
import traceback

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon_cell(v):
    import datetime
    import math
    from decimal import Decimal

    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, Decimal):
        f = float(v)
        return canon_cell(f)
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(canon_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    args = sys.argv[1:]
    # --window: only the first DRIVER_WINDOW registry entries —
    # exactly the set
    # the driver's correctness gate attests (ROTATION.md), for a fast
    # local replica of that run.
    window_only = "--window" in args
    args = [a for a in args if a != "--window"]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    from data_warehouse_migration_spark.catalog import REGISTRY
    from data_warehouse_migration_spark.session import get_spark

    if window_only:
        from tools.plan_audit import DRIVER_WINDOW  # single source of truth

        only = set(list(REGISTRY)[:DRIVER_WINDOW]) & (only or set(REGISTRY))

    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')"
        )

    failures = []
    ran = 0
    for name, q in REGISTRY.items():
        if only and name not in only:
            continue
        ran += 1
        t0 = time.time()
        try:
            # Queries that persist() intermediates would otherwise leak
            # cached blocks for the session lifetime (ADVICE r5); each
            # query is independent, so bound the cache to one query.
            spark.catalog.clearCache()
            sdf = q.spark_fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"✗ {name}: SPARK ERROR\n{traceback.format_exc()}")
            failures.append(name)
            continue
        if q.oracle is None:
            print(f"○ {name}: rows-only ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(q.oracle)
            o_cols = list(rel.columns)
            o_types = [str(t).upper() for t in rel.types]
            o_rows = rel.fetchall()
        except Exception:
            print(f"✗ {name}: ORACLE ERROR\n{traceback.format_exc()}")
            failures.append(name)
            continue

        problems = []
        if sorted(s_cols) != sorted(o_cols):
            problems.append(f"cols spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        # Driver-parity dtype check: the driver compares via pandas, where
        # DuckDB HUGEINT (e.g. a bare sum(int) output column) lands as
        # float64 and hash-diverges from a Spark bigint even when every
        # value is identical (the r3 q12 failure). fetchall() returns
        # Python ints for HUGEINT, so canon_cell masks it — catch it at
        # the type level instead: any oracle column typed HUGEINT in an
        # otherwise integer position must be CAST to BIGINT in the SQL.
        hugeints = [c for c, ty in zip(o_cols, o_types) if ty == "HUGEINT"]
        if hugeints:
            problems.append(
                f"oracle HUGEINT vs spark int on {hugeints} — CAST(... AS BIGINT) in the oracle SQL"
            )
        if len(s_rows) != len(o_rows):
            problems.append(f"rows spark={len(s_rows)} oracle={len(o_rows)}")
        if not problems:
            hs, ho = table_hash(s_cols, s_rows), table_hash(o_cols, o_rows)
            if hs != ho:
                problems.append("value-hash mismatch")
                # show first differing canonical line for debugging
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_o = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
                ls = sorted("|".join(canon_cell(r[i]) for i in order_s) for r in s_rows)
                lo = sorted("|".join(canon_cell(r[i]) for i in order_o) for r in o_rows)
                for a, b in zip(ls, lo):
                    if a != b:
                        problems.append(f"  spark : {a}\n  oracle: {b}")
                        break
        if problems:
            print(f"✗ {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(p)
            failures.append(name)
        else:
            print(f"✓ {name} ({len(s_rows)} rows, {time.time()-t0:.1f}s)")

    scope = "" if not only else f" (filtered; registry has {len(REGISTRY)})"
    print(f"\n{ran - len(failures)}/{ran} OK{scope}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
