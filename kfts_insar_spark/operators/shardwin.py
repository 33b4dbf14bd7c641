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


def _all(conds):
    out = None
    for c in conds:
        out = c if out is None else (out & c)
    return out if out is not None else F.lit(True)


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
    """Replicate, for every (keys, shard) partition, the ``rows_before``
    rows that GLOBALLY precede its first row and the ``rows_after`` rows
    that globally follow its last row, marked with ``flag`` — the halo
    exchange that makes ROWS-bounded windows exact per (keys, shard).

    ROWS frames count OBSERVED rows, not time steps: on a gappy series a
    shard may hold fewer than K rows (or none), so the K frame rows of a
    shard's first row can live several shards back. Adjacent-shard
    copying is therefore NOT sufficient. Instead:

    1. a per-(keys, shard) count table — tiny: one row per non-empty
       shard — gets per-key prefix sums, giving each shard its global
       row-number range [_F, _E] in the per-key ``order``;
    2. a self-join of that tiny table finds every (src shard, dst shard)
       pair whose row ranges prove src holds rows inside dst's needed
       global range ([_F−K, _F−1] before / [_E+1, _E+K] after) — the
       join fans one src row out to EVERY dst shard that needs it, which
       is what fixes the sparse-shard case;
    3. the mapping (broadcast — it is bounded by shard-pair adjacency
       counts, not data size) joins back to ``df`` on keys+shard with a
       local row-number bound, so only the needed rows replicate.

    Exactness: global row numbers are consecutive per key and shards are
    monotone in ``order``, so "local row number within src shard" maps
    affinely onto the global row number (_F_src − 1 + p); the bound in
    step 3 selects exactly the globally-needed rows. No per-key global
    window is ever run over the data itself — only over the counts table.

    After running the window partitioned by keys+[shard], the caller
    MUST filter ``~F.col(flag)`` — halo rows exist only to complete
    their neighbours' frames; their own outputs see a truncated frame.
    """
    parts = [F.col(k) for k in keys] + [F.col(shard)]
    base = df.withColumn(flag, F.lit(False))
    if rows_before <= 0 and rows_after <= 0:
        return base
    out = base
    counts = df.groupBy(*(keys + [shard])).agg(F.count(F.lit(1)).alias("_c"))
    wk = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col(shard).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bounds = counts.withColumn("_E", F.sum("_c").over(wk)).withColumn(
        "_F", F.col("_E") - F.col("_c") + 1
    )
    pk = [f"_pk_{k}" for k in keys]

    def _fanout(mapping: DataFrame, rn_window: Window, bound: str) -> DataFrame:
        # eqNullSafe: a null-keyed series is still one series — the plain
        # equality would never route halo rows to it and its cross-shard
        # windows would silently lose exactness
        cond = [F.col(k).eqNullSafe(F.col(p)) for k, p in zip(keys, pk)]
        cond.append(F.col(shard) == F.col("_src"))
        cond.append(F.col("_rn") <= F.col(bound))
        joined = (
            df.withColumn("_rn", F.row_number().over(rn_window))
            .join(F.broadcast(mapping), cond, "inner")
            .withColumn(shard, F.col("_dst"))
            .withColumn(flag, F.lit(True))
        )
        return joined.select(*base.columns)

    if rows_before > 0:
        # dst needs global rows [_F_dst − K, _F_dst − 1]; src < dst holds
        # some of them iff _E_src ≥ _F_dst − K (upper bound is automatic:
        # every src row precedes dst). In src-local DESCENDING row number
        # q (global rn = _E_src − q + 1) the needed rows are q ≤
        # _E_src − _F_dst + K + 1.
        src = bounds.select(
            *[F.col(k).alias(p) for k, p in zip(keys, pk)],
            F.col(shard).alias("_src"),
            F.col("_E").alias("_sE"),
        )
        dst = bounds.select(
            *[F.col(k).alias(f"{p}2") for k, p in zip(keys, pk)],
            F.col(shard).alias("_dst"),
            F.col("_F").alias("_dF"),
        )
        map_b = (
            src.join(
                dst,
                _all(F.col(p).eqNullSafe(F.col(f"{p}2")) for p in pk),
            )
            .filter(
                (F.col("_src") < F.col("_dst"))
                & (F.col("_sE") >= F.col("_dF") - rows_before)
            )
            .select(
                *pk,
                "_src",
                "_dst",
                (F.col("_sE") - F.col("_dF") + rows_before + 1).alias("_maxq"),
            )
        )
        w_desc = Window.partitionBy(*parts).orderBy(F.col(order).desc())
        out = out.unionByName(_fanout(map_b, w_desc, "_maxq"))
    if rows_after > 0:
        # dst needs global rows [_E_dst + 1, _E_dst + K]; src > dst holds
        # some iff _F_src ≤ _E_dst + K. In src-local ASCENDING row number
        # p (global rn = _F_src − 1 + p): p ≤ _E_dst + K − _F_src + 1.
        src = bounds.select(
            *[F.col(k).alias(p) for k, p in zip(keys, pk)],
            F.col(shard).alias("_src"),
            F.col("_F").alias("_sF"),
        )
        dst = bounds.select(
            *[F.col(k).alias(f"{p}2") for k, p in zip(keys, pk)],
            F.col(shard).alias("_dst"),
            F.col("_E").alias("_dE"),
        )
        map_a = (
            src.join(
                dst,
                _all(F.col(p).eqNullSafe(F.col(f"{p}2")) for p in pk),
            )
            .filter(
                (F.col("_src") > F.col("_dst"))
                & (F.col("_sF") <= F.col("_dE") + rows_after)
            )
            .select(
                *pk,
                "_src",
                "_dst",
                (F.col("_dE") + rows_after - F.col("_sF") + 1).alias("_maxp"),
            )
        )
        w_asc = Window.partitionBy(*parts).orderBy(F.col(order).asc())
        out = out.unionByName(_fanout(map_a, w_asc, "_maxp"))
    return out
