#!/usr/bin/env python
"""sf1 scale-stability timing gate (r3 verdict #7).

Times every TABLE-BACKED query (those whose oracle SQL references the sf
tables — synthetic-generator queries bake sf0.01 constants into their SQL
and are excluded) at sf0.1 and at the locally generated sf1
(tools/gen_sf1.py, 10× rows), both on the same local[16] session, and
flags any query whose sf1 time exceeds GATE_RATIO× (default 10×) its
sf0.1 time — the signature of accidentally super-linear candidate
generation that the per-query df-caps don't cover. Sub-floor sf0.1 times
are clamped to GATE_FLOOR seconds (default 0.5) so plan-compile fixed
costs don't trip the ratio.

Results are materialized with the noop writer (full compute, no driver
collect). Value-exactness at sf1 is checked separately with the existing
oracle harness:  CHECK_SF_DIR=$SF1_DIR python tools/check_queries.py <names>

Usage: python tools/gate_sf1.py [query ...]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, ".")

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("SF1_DIR", "/tmp/testdata_sf1")
RATIO = float(os.environ.get("GATE_RATIO", "10"))
FLOOR = float(os.environ.get("GATE_FLOOR", "0.5"))
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def table_backed(qs, oracles) -> list[str]:
    pat = re.compile(r"\b(" + "|".join(TABLES) + r")\b", re.I)
    return [n for n in qs if n in oracles and pat.search(oracles[n])]


def main() -> int:
    import __spark_entry__ as entry
    from kfts_insar_spark.session import get_spark

    if not os.path.exists(f"{SF1}/documents.parquet"):
        print(f"{SF1} missing — run tools/gen_sf1.py first", file=sys.stderr)
        return 2
    spark = get_spark(app_name="gate_sf1", cores=16, shuffle_partitions=16)
    qs = entry.queries()
    names = sys.argv[1:] or table_backed(qs, entry.oracle_sql())

    def run(name: str, sf_dir: str) -> float:
        df = qs[name](spark, sf_dir)
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    # warm: JIT/codegen + Python worker pool
    run(names[0], SF01)
    failures = 0
    print(f"{'query':34s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>6s}")
    for name in names:
        try:
            t01 = run(name, SF01)
            t1 = run(name, SF1)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            failures += 1
            continue
        ratio = t1 / max(t01, FLOOR)
        flag = ""
        if ratio > RATIO:
            flag = f"  << >{RATIO}x"
            failures += 1
        print(f"{name:34s} {t01:8.2f} {t1:8.2f} {ratio:6.2f}{flag}")
    spark.stop()
    print(f"\n{len(names) - failures}/{len(names)} within {RATIO}x")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
