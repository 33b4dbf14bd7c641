#!/usr/bin/env python
"""Local emulation of the driver's correctness gate: run every queries()
entry at sf0.01 side-by-side with its oracle_sql() through DuckDB and compare
row count, schema arity, and order-insensitive values.

Usage: python tools/check_queries.py [query_name ...]
       CHECK_SF_DIR=/root/testdata/sf0.1 python tools/check_queries.py doc_... (table-backed only)
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, ".")

import duckdb  # noqa: E402

# SF override checks scale-stability of the queries: table-backed ones read
# the same parquet in both engines; synthetic-generator queries (seq_*/tok_*/
# kf_*) bake ORACLE_N_DOCS into their SQL at import, so derive the matching
# oracle SF from CHECK_SF_DIR before any plans module is imported (r4
# verdict item 5 — without this the kernel family was value-pinned only at
# driver scale).
SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
_m = __import__("re").search(r"sf([0-9.]+)", SF_DIR)
if _m:
    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF", _m.group(1))
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def rowset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    import __spark_entry__ as entry
    from kfts_insar_spark.session import get_spark

    spark = get_spark(app_name="check_queries", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = sys.argv[1:] or list(qs)
    failures = 0
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            got_cols = df.columns
            got = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows)")
            continue
        try:
            cur = con.execute(oracles[name])
            want_cols = [d[0] for d in cur.description]
            want = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = []
        if sorted(c.lower() for c in got_cols) != sorted(
            c.lower() for c in want_cols
        ):
            problems.append(f"schema {got_cols} vs {want_cols}")
        if len(got) != len(want):
            problems.append(f"rows {len(got)} vs {len(want)}")
        if not problems:
            a, b = rowset(got, got_cols), rowset(want, want_cols)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"ok   {name}: {len(got)} rows value-exact")
    spark.stop()
    print(f"\n{len(names) - failures}/{len(names)} queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
