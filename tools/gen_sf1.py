#!/usr/bin/env python
"""Deterministic local sf1 set — 10× sf0.1, same schemas (r3 verdict #7).

The driver's generator isn't in this repo and /root/testdata is read-only,
so sf1 is derived from sf0.1 by replication with deterministic, seedless
per-replica transforms (pure functions of the source rows — re-running
yields byte-identical data). The scale-stability gate compares Spark
against DuckDB on the SAME files, so parity with the driver's generator is
not required; what matters is 10× the rows with the same shape and skew.

Per-replica transforms (replica k = 0..9; k=0 is sf0.1 verbatim):
- events:     event_id + k·10⁶, user_id + k·10⁴ (10× users, per-user
              session structure preserved), ts/type/value/props unchanged
- documents:  doc_id + k·10⁵; for k>0 the text goes through a replica-
              specific letter-rotation cipher (translate a→a+k mod 26,
              both cases) so each replica is a disjoint "language":
              shingle sets across replicas are disjoint and the
              dedup/near-dup pair structure scales exactly linearly
              (replicating text verbatim would make every doc a 10-way
              near-dup — a 45× pair blowup, a different problem, not the
              same problem at 10×). The cipher preserves length, word
              boundaries, digits and punctuation, so n_chars and every
              per-char workload are EXACTLY 10× (an earlier word-suffix
              variant grew texts ~35% and skewed the timing gate);
              n_chars copied (the n_chars == length(text) invariant
              holds in the source)
- embeddings: vec_id + k·10⁴; dims rolled by 7k (rotation preserves all
              intra-replica inner products → per-replica ANN structure
              identical to sf0.1), label unchanged
- lineitem:   l_orderkey + k·10⁶; part/supp keys UNCHANGED — facts grow
              10×, dims stay (fan-in grows, the realistic scale path)
- orders:     o_orderkey + k·10⁶, custkey unchanged
- region/nation/customer/supplier/part: copied verbatim (dim tables)

Usage: python tools/gen_sf1.py   →  $SF1_DIR (default /tmp/testdata_sf1)
"""

from __future__ import annotations

import os
import shutil

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SF1_SRC", "/root/testdata/sf0.1")
DST = os.environ.get("SF1_DIR", "/tmp/testdata_sf1")
R = int(os.environ.get("SF1_REPLICAS", "10"))


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    con.execute(f"CREATE TABLE ks AS SELECT unnest(range({R})) AS k")

    for t in ("region", "nation", "customer", "supplier", "part"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")

    con.execute(
        f"""
        COPY (
          SELECT event_id + k*1000000 AS event_id, ts,
                 user_id + k*10000 AS user_id, event_type, value, props
          FROM '{SRC}/events.parquet' CROSS JOIN ks
          ORDER BY event_id
        ) TO '{DST}/events.parquet' (FORMAT PARQUET)
        """
    )
    lower = "abcdefghijklmnopqrstuvwxyz"
    alpha = lower + lower.upper()
    cases = "\n".join(
        f"WHEN k = {k} THEN translate(text, '{alpha}', "
        f"'{lower[k:] + lower[:k] + (lower[k:] + lower[:k]).upper()}')"
        for k in range(1, R)
    )
    con.execute(
        f"""
        COPY (
          SELECT doc_id + k*100000 AS doc_id,
                 CASE WHEN k = 0 THEN text
                      {cases}
                 END AS text,
                 lang, source, n_chars
          FROM '{SRC}/documents.parquet' CROSS JOIN ks
          ORDER BY doc_id
        ) TO '{DST}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT l_orderkey + k*1000000 AS l_orderkey, l_partkey, l_suppkey,
                 l_linenumber, l_quantity, l_extendedprice, l_discount,
                 l_tax, l_returnflag, l_linestatus, l_shipdate
          FROM '{SRC}/lineitem.parquet' CROSS JOIN ks
          ORDER BY l_orderkey
        ) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT o_orderkey + k*1000000 AS o_orderkey, o_custkey,
                 o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
          FROM '{SRC}/orders.parquet' CROSS JOIN ks
          ORDER BY o_orderkey
        ) TO '{DST}/orders.parquet' (FORMAT PARQUET)
        """
    )

    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_id = emb["vec_id"].to_numpy()
    label = emb["label"].to_numpy()
    mat = np.array(emb["embedding"].to_pylist(), dtype=np.float32)
    ids, labs, vecs = [], [], []
    for k in range(R):
        ids.append(vec_id + k * 10000)
        labs.append(label)
        vecs.append(np.roll(mat, 7 * k, axis=1))
    out = pa.table(
        {
            "vec_id": np.concatenate(ids),
            "embedding": pa.array(
                list(np.concatenate(vecs)), type=pa.list_(pa.float32())
            ),
            "label": np.concatenate(labs).astype(np.int32),
        }
    )
    pq.write_table(out, f"{DST}/embeddings.parquet")

    for t in (
        "events", "documents", "embeddings", "lineitem", "orders",
    ):
        n = con.execute(
            f"SELECT count(*) FROM '{DST}/{t}.parquet'"
        ).fetchone()[0]
        print(f"{t}: {n} rows")
    print(f"sf1 written to {DST}")


if __name__ == "__main__":
    main()
