"""Shard-keyed window decomposition: break per-key ordered windows into
time-range shards with halo-row replication, so a window family whose
partition key has tiny cardinality (the raw tier's ~5 `source` values)
runs at cores-many tasks instead of five.

The problem shape: every read-path window query partitions by `source`
(≈5 distinct values) — a 5-task ceiling no matter how many executors the
cluster has. But every operator in the family is *shard-decomposable*:
its window frame is either

- ROWS-bounded (lag K, ±H rolling) → a shard needs only a HALO of the
  neighbouring shard's boundary rows. Replicate those rows into the
  adjacent shard, run the identical window per (key, shard), drop the
  halo rows' outputs. Exact by construction: inside the halo'd
  partition every surviving row sees precisely the frame it would have
  seen in the global per-key window.
- unbounded-anchored (running last/first) → per-shard local anchors
  plus a per-(key, shard) boundary aggregate (first/last observation),
  closed over shards with a window on the TINY boundary table and
  broadcast back. (interp_fill and gaps_islands build this form
  directly in their plans.)

This is the same (key → key × shard) migration the pipeline's KF stage
made in round 2 (pipeline.py: 5 × kf_shards sub-series); here the shard
axis is the time range itself, so parallelism grows with history length —
exactly the axis that grows at 100 TB.

Reference analogue: the MPI rank split over pixels
(/root/reference/kf/readinput.py:166-212) is the same move — decompose an
embarrassingly-sequential-per-key recursion along an axis the operator
does not couple, then patch the boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# steps (300 s buckets) per shard: small enough that even the two-day
# test window yields > cores shards × sources; at production history
# lengths (years) the shard count is O(10^4) per source. Halo overhead
# is ≤ (rows_before + rows_after)/SHARD_STEPS ≈ 10-20 % duplicated rows.
SHARD_STEPS = 64


def with_shard(df: DataFrame, step_col, name: str = "shard") -> DataFrame:
    """Attach the time-range shard id: shard = step div SHARD_STEPS
    (exact integral division — never `/`-then-cast)."""
    return df.withColumn(
        name, F.expr(f"CAST({step_col} AS BIGINT) div {SHARD_STEPS}")
    )


def halo(
    df: DataFrame,
    keys: list[str],
    shard: str,
    order: str,
    rows_before: int = 0,
    rows_after: int = 0,
    flag: str = "_halo",
) -> DataFrame:
    """Replicate each (keys, shard) partition's trailing ``rows_before``
    rows into shard+1 and leading ``rows_after`` rows into shard−1,
    marked with ``flag`` — the halo exchange that makes ROWS-bounded
    windows exact per (keys, shard).

    After running the window partitioned by keys+[shard], the caller
    MUST filter ``~F.col(flag)`` — halo rows exist only to complete
    their neighbours' frames; their own outputs see a truncated frame.
    """
    parts = [F.col(k) for k in keys] + [F.col(shard)]
    base = df.withColumn(flag, F.lit(False))
    out = base
    if rows_before > 0:
        w_desc = Window.partitionBy(*parts).orderBy(F.col(order).desc())
        tail = (
            df.withColumn("_rn", F.row_number().over(w_desc))
            .filter(F.col("_rn") <= rows_before)
            .drop("_rn")
            .withColumn(shard, F.col(shard) + 1)
            .withColumn(flag, F.lit(True))
        )
        out = out.unionByName(tail)
    if rows_after > 0:
        w_asc = Window.partitionBy(*parts).orderBy(F.col(order).asc())
        head = (
            df.withColumn("_rn", F.row_number().over(w_asc))
            .filter(F.col("_rn") <= rows_after)
            .drop("_rn")
            .withColumn(shard, F.col(shard) - 1)
            .withColumn(flag, F.lit(True))
        )
        out = out.unionByName(head)
    return out
