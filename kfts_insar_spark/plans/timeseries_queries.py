"""Time-series analysis operators over the rolled-up token series: gap
detection, interpolation fill, rendering decimation, counter rates,
distribution drift, finite-horizon smoothing, robust outlier flags.

These extend the tier engine's read path with the query family a
time-series store serves AFTER rollup (the reference's post-processing
stage summarizes its per-pixel series the same way — rms/innovation maps,
/root/reference/kf2rms.py:143-154, checkinnov.py:94-107 — but its toolbox
stops at grouped means; this module is the standard TSDB surface:
gaps-and-islands, interpolation, min/max decimation, PromQL-style rate,
drift scoring, EWMA, Hampel filter).

Every query is a pure Catalyst plan (window functions + higher-order
expressions, zero Python) and every oracle replays it exactly in DuckDB:
inputs are integer token sums on an integer bucket lattice, so window
arithmetic is bit-exact; the few fractional outputs are produced by the
SAME double-precision expression on both engines and rounded well above
the 1-ulp level.

Scale notes (10^12-row base, tier-sized inputs):
- all operators run on the RAW TIER (≈3 orders of magnitude smaller than
  the base table) — the expensive base→tier shuffle happens once in the
  pipeline, not per query;
- per-source windows shuffle on `source` (~5 keys): real deployments key
  by (source, shard) exactly like the pipeline's KF stage — the window
  frame never needs cross-shard rows because every operator here is
  shard-decomposable (documented per query);
- no per-row Python anywhere; plans stay inside WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.rollup import RAW_SECONDS, rollup_cascade, rollup_raw
from ..operators.shardwin import SHARD_STEPS, halo, with_shard
from ..synth import sequences, sequences_sql
from .common import ORACLE_N_DOCS, n_docs_of


def _seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sequences(spark, n_docs_of(sf_dir))


def _raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rollup_raw(_seq(spark, sf_dir))


def _oracle_raw() -> str:
    """DuckDB CTE body: the raw tier (source, bucket_es, sum_tok, n_docs)."""
    return f"""
SELECT source,
       CAST((ingest_es // {RAW_SECONDS}) * {RAW_SECONDS} AS BIGINT) AS bucket_es,
       CAST(sum(n_tok) AS BIGINT) AS sum_tok,
       CAST(count(*) AS BIGINT)   AS n_docs
FROM ({sequences_sql(ORACLE_N_DOCS, with_tokens=False)})
GROUP BY 1, 2
"""


# --------------------------------------------------------------- gaps/islands
def q_seq_gaps_islands(spark, sf_dir):
    """Gaps-and-islands: maximal runs of consecutive 300 s buckets per
    source. The classic step − row_number() grouping trick: consecutive
    steps share (step − rn), one groupBy per island.

    Scale (SHARD-KEYED, round-3): island detection runs per
    (source, time-range shard) — cores-many tasks instead of 5 — and a
    second pass over ISLAND ENDPOINTS ONLY (rows ≪ series rows: one per
    island) chains boundary-adjacent islands across shards with a
    per-source running sum of break flags. The heavy window/groupBy
    never sees a 5-key partition; only the endpoint merge does, on a
    table whose size is the number of islands."""
    raw = _raw(spark, sf_dir)
    stepped = with_shard(
        raw.select(
            "source",
            "bucket_es",
            (F.col("bucket_es") / RAW_SECONDS).cast("long").alias("step"),
        ),
        "step",
    )
    w = Window.partitionBy("source", "shard").orderBy("bucket_es")
    local = (
        stepped.withColumn("grp", F.col("step") - F.row_number().over(w))
        .groupBy("source", "shard", "grp")
        .agg(
            F.min("step").alias("s0"),
            F.max("step").alias("s1"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    # endpoint merge: islands are disjoint intervals; an island continues
    # the previous one iff its start step is exactly prev end + 1
    wm = Window.partitionBy("source").orderBy("s0")
    brk = F.when(
        F.col("s0") == F.lag("s1").over(wm) + 1, F.lit(0)
    ).otherwise(F.lit(1))
    merged = local.withColumn("brk", brk).withColumn(
        "iid", F.sum("brk").over(wm.rowsBetween(Window.unboundedPreceding, 0))
    )
    return merged.groupBy("source", "iid").agg(
        (F.min("s0") * RAW_SECONDS).alias("island_start_es"),
        (F.max("s1") * RAW_SECONDS).alias("island_end_es"),
        F.sum("n").cast("long").alias("n_buckets"),
    ).select("source", "island_start_es", "island_end_es", "n_buckets")


ORACLE_GAPS_ISLANDS = f"""
WITH raw AS ({_oracle_raw()}),
stepped AS (
  SELECT source, bucket_es, bucket_es // {RAW_SECONDS} AS step,
         bucket_es // {RAW_SECONDS}
           - row_number() OVER (PARTITION BY source ORDER BY bucket_es) AS grp
  FROM raw)
SELECT source,
       CAST(min(bucket_es) AS BIGINT) AS island_start_es,
       CAST(max(bucket_es) AS BIGINT) AS island_end_es,
       CAST(count(*) AS BIGINT)       AS n_buckets
FROM stepped GROUP BY source, grp
"""


# ------------------------------------------------------------ interpolation
def q_seq_interp_fill(spark, sf_dir):
    """Linear-interpolation gap fill on the full bucket lattice per source
    (the stateless complement of the Kalman gap-fill: straight-line between
    the bracketing observations, NULL outside them).

    Lattice = sequence(min, max) per source (exploded JVM-side); prev/next
    anchors via IGNORE NULLS window scans; fill value from the two anchors.
    `filled` is rounded to 6 dp — the expression is the same IEEE-double
    formula on both engines, rounding clears representation noise only.

    Scale (SHARD-KEYED, round-3): the lattice is generated per
    (source, time-range shard) — no single sequence() array ever spans
    the whole history — and the unbounded prev/next anchor scans run per
    (source, shard). Cross-shard anchors close over a TINY boundary
    table (one row per (source, shard): its first/last observation) with
    a per-source window, broadcast back. The unbounded-anchor form of
    the halo exchange in operators/shardwin.py."""
    raw = _raw(spark, sf_dir)
    span = F.lit(SHARD_STEPS * RAW_SECONDS).cast("long")
    shards = (
        raw.groupBy("source")
        .agg(F.min("bucket_es").alias("lo"), F.max("bucket_es").alias("hi"))
        .select(
            "source",
            "lo",
            "hi",
            F.explode(
                F.sequence(
                    F.expr(f"lo div {SHARD_STEPS * RAW_SECONDS}"),
                    F.expr(f"hi div {SHARD_STEPS * RAW_SECONDS}"),
                )
            ).alias("shard"),
        )
    )
    lattice = shards.select(
        "source",
        "shard",
        F.explode(
            F.sequence(
                F.greatest(F.col("lo"), F.col("shard") * span),
                F.least(
                    F.col("hi"),
                    (F.col("shard") + 1) * span - F.lit(RAW_SECONDS).cast("long"),
                ),
                F.lit(RAW_SECONDS).cast("long"),
            )
        ).alias("bucket_es"),
    )
    j = lattice.join(raw.select("source", "bucket_es", "sum_tok"),
                     ["source", "bucket_es"], "left")
    wp = (
        Window.partitionBy("source", "shard")
        .orderBy("bucket_es")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("source", "shard")
        .orderBy("bucket_es")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    val = F.col("sum_tok").cast("double")
    es_obs = F.when(F.col("sum_tok").isNotNull(), F.col("bucket_es"))
    j = j.select(
        "source",
        "shard",
        "bucket_es",
        F.col("sum_tok").isNull().alias("was_gap"),
        F.last(val, ignorenulls=True).over(wp).alias("pv"),
        F.last(es_obs, ignorenulls=True).over(wp).alias("pt"),
        F.first(val, ignorenulls=True).over(wn).alias("nv"),
        F.first(es_obs, ignorenulls=True).over(wn).alias("nt"),
    )
    # boundary table: one row per (source, shard) — its first and last
    # observation (struct max/min orders by bucket_es first)
    obs = raw.select(
        "source",
        F.expr(f"CAST(bucket_es div {RAW_SECONDS} AS BIGINT) "
               f"div {SHARD_STEPS}").alias("shard"),
        F.struct(F.col("bucket_es"), F.col("sum_tok").cast("double").alias("v"))
        .alias("o"),
    ).groupBy("source", "shard").agg(
        F.max("o").alias("last_o"), F.min("o").alias("first_o")
    )
    allsh = shards.select("source", "shard").join(obs, ["source", "shard"], "left")
    wb_p = (
        Window.partitionBy("source").orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wb_n = (
        Window.partitionBy("source").orderBy("shard")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    anchors = allsh.select(
        "source",
        "shard",
        F.last("last_o", ignorenulls=True).over(wb_p).alias("prev_o"),
        F.first("first_o", ignorenulls=True).over(wb_n).alias("next_o"),
    )
    j = (
        j.join(F.broadcast(anchors), ["source", "shard"], "left")
        .withColumn("pv", F.coalesce("pv", F.col("prev_o.v")))
        .withColumn("pt", F.coalesce("pt", F.col("prev_o.bucket_es")))
        .withColumn("nv", F.coalesce("nv", F.col("next_o.v")))
        .withColumn("nt", F.coalesce("nt", F.col("next_o.bucket_es")))
    )
    frac = (F.col("bucket_es") - F.col("pt")).cast("double") / (
        F.col("nt") - F.col("pt")
    ).cast("double")
    filled = F.when(~F.col("was_gap"), F.col("pv")).otherwise(
        F.when(
            F.col("pt").isNotNull() & F.col("nt").isNotNull(),
            F.col("pv") + (F.col("nv") - F.col("pv")) * frac,
        )
    )
    return j.select(
        "source", "bucket_es", "was_gap", F.round(filled, 6).alias("filled")
    )


ORACLE_INTERP_FILL = f"""
WITH raw AS ({_oracle_raw()}),
lattice AS (
  SELECT source, CAST(unnest(range(lo, hi + 1, {RAW_SECONDS})) AS BIGINT) AS bucket_es
  FROM (SELECT source, min(bucket_es) AS lo, max(bucket_es) AS hi
        FROM raw GROUP BY source)),
j AS (
  SELECT l.source, l.bucket_es, r.sum_tok,
         r.sum_tok IS NULL AS was_gap,
         last_value(CAST(r.sum_tok AS DOUBLE) IGNORE NULLS) OVER
           (PARTITION BY l.source ORDER BY l.bucket_es
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         last_value(CASE WHEN r.sum_tok IS NOT NULL THEN l.bucket_es END
                    IGNORE NULLS) OVER
           (PARTITION BY l.source ORDER BY l.bucket_es
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
         first_value(CAST(r.sum_tok AS DOUBLE) IGNORE NULLS) OVER
           (PARTITION BY l.source ORDER BY l.bucket_es
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN r.sum_tok IS NOT NULL THEN l.bucket_es END
                     IGNORE NULLS) OVER
           (PARTITION BY l.source ORDER BY l.bucket_es
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
  FROM lattice l LEFT JOIN raw r USING (source, bucket_es))
SELECT source, bucket_es, was_gap,
       round(CASE WHEN NOT was_gap THEN pv
                  WHEN pt IS NOT NULL AND nt IS NOT NULL
                  THEN pv + (nv - pv) * (CAST(bucket_es - pt AS DOUBLE)
                                         / CAST(nt - pt AS DOUBLE))
             END, 6) AS filled
FROM j
"""


# ----------------------------------------------------------- m4 decimation
# deterministic argmax/argmin over (value, bucket): values and steps are
# small integers, so a single packed BIGINT key makes the extreme-point
# choice total-ordered (no engine-dependent tie-break) on both engines
_PACK = 1 << 31


def q_seq_minmax_decimate(spark, sf_dir):
    """Min/max decimation (the core of the M4 rendering downsample): per
    (source, hour) keep the extreme points WITH their timestamps — the
    downsample that preserves the series envelope exactly.

    Ties broken toward the later bucket by packing (value, step) into one
    integer key — max/min of the packed key is a total order, so Spark and
    DuckDB cannot disagree on which point survives.

    All packing arithmetic is EXACT integer (long multiply, `div`
    integral division, pmod) — never `/`-then-cast, whose double round
    trip loses low bits once the packed key exceeds 2^53. The packing is
    valid for 0 <= sum_tok < 2^32 (key stays inside int64); per-300 s
    per-source token sums are orders of magnitude below that bound, and
    the rollup schema caps them structurally (n_tok is int32 per doc).

    Scale: plain algebraic aggregation (partial → final), shard-safe."""
    raw = _raw(spark, sf_dir)
    step = F.expr(f"CAST(bucket_es AS BIGINT) div {RAW_SECONDS}")
    key = F.col("sum_tok").cast("long") * F.lit(_PACK) + step
    hour = ((F.col("bucket_es") / 3600).cast("long") * 3600).alias("hour_es")
    agg = raw.groupBy("source", hour).agg(
        F.max(key).alias("kmax"), F.min(key).alias("kmin")
    )
    return agg.select(
        "source",
        "hour_es",
        F.expr(f"kmin div {_PACK}").alias("min_tok"),
        (F.pmod("kmin", F.lit(_PACK)) * RAW_SECONDS).cast("long").alias("min_es"),
        F.expr(f"kmax div {_PACK}").alias("max_tok"),
        (F.pmod("kmax", F.lit(_PACK)) * RAW_SECONDS).cast("long").alias("max_es"),
    )


ORACLE_MINMAX_DECIMATE = f"""
WITH raw AS ({_oracle_raw()}),
agg AS (
  SELECT source, (bucket_es // 3600) * 3600 AS hour_es,
         max(sum_tok * {_PACK} + bucket_es // {RAW_SECONDS}) AS kmax,
         min(sum_tok * {_PACK} + bucket_es // {RAW_SECONDS}) AS kmin
  FROM raw GROUP BY 1, 2)
SELECT source, CAST(hour_es AS BIGINT) AS hour_es,
       CAST(kmin // {_PACK} AS BIGINT)                  AS min_tok,
       CAST((kmin % {_PACK}) * {RAW_SECONDS} AS BIGINT) AS min_es,
       CAST(kmax // {_PACK} AS BIGINT)                  AS max_tok,
       CAST((kmax % {_PACK}) * {RAW_SECONDS} AS BIGINT) AS max_es
FROM agg
"""


# ------------------------------------------------------------- counter rate
def q_seq_counter_rate(spark, sf_dir):
    """PromQL-style counter increase with reset handling over the running
    cumulative token counter per source: delta to the previous sample when
    the counter moved forward, the raw counter value after a reset (the
    counter restarted from 0 — all of the new value is increase).

    The cumulative counter is derived in-query (running sum of sum_tok) and
    downsampled to every 4th bucket with a modular filter, then RESET at
    each day boundary — producing genuine resets to exercise the branch.

    Scale: running sum + lag are shard-local windows; counter semantics
    never cross shards."""
    raw = _raw(spark, sf_dir)
    day = (F.col("bucket_es") / 86400).cast("long")
    wcum = (
        Window.partitionBy("source", day.alias("day"))
        .orderBy("bucket_es")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ctr = raw.select(
        "source",
        "bucket_es",
        day.alias("day"),
        F.sum("sum_tok").over(wcum).alias("counter"),
    ).filter((F.col("bucket_es") / RAW_SECONDS).cast("long") % 4 == 0)
    # SHARD-KEYED (round-3): the running sum already partitions by
    # (source, day) — high cardinality. Only the lag(1) across sampled
    # rows spanned the whole per-source series; halo depth 1 makes it
    # exact per (source, time-range shard).
    sharded = halo(
        with_shard(
            ctr.withColumn(
                "step", (F.col("bucket_es") / RAW_SECONDS).cast("long")
            ),
            "step",
        ),
        ["source"],
        "shard",
        "bucket_es",
        rows_before=1,
    )
    wlag = Window.partitionBy("source", "shard").orderBy("bucket_es")
    prev = F.lag("counter").over(wlag)
    inc = F.when(prev.isNull(), F.lit(None)).otherwise(
        F.when(F.col("counter") >= prev, F.col("counter") - prev).otherwise(
            F.col("counter")
        )
    )
    return sharded.select(
        "source",
        "bucket_es",
        "_halo",
        F.col("counter").cast("long").alias("counter"),
        inc.cast("long").alias("increase"),
    ).filter(~F.col("_halo")).drop("_halo")


ORACLE_COUNTER_RATE = f"""
WITH raw AS ({_oracle_raw()}),
ctr AS (
  SELECT source, bucket_es,
         sum(sum_tok) OVER (PARTITION BY source, bucket_es // 86400
                            ORDER BY bucket_es
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS counter
  FROM raw),
samp AS (SELECT * FROM ctr WHERE (bucket_es // {RAW_SECONDS}) % 4 = 0),
l AS (
  SELECT source, bucket_es, counter,
         lag(counter) OVER (PARTITION BY source ORDER BY bucket_es) AS prev
  FROM samp)
SELECT source, bucket_es, CAST(counter AS BIGINT) AS counter,
       CAST(CASE WHEN prev IS NULL THEN NULL
                 WHEN counter >= prev THEN counter - prev
                 ELSE counter END AS BIGINT) AS increase
FROM l
"""


# -------------------------------------------------------------- drift score
_DRIFT_BINS = 8


def q_tok_source_drift(spark, sf_dir):
    """Token-length distribution drift per source between the first and
    second half of the ingest window (training-data health check: did a
    source's length profile shift mid-ingest?). Per (source, length-bin):
    doc counts in each half plus the chi-square contribution
    (a−b)²∕(a+b), rounded — emitted per bin, not summed, so no
    engine-dependent float summation order exists.

    Scale: two-level aggregation, all algebraic; the halves split on the
    global midpoint (one tiny broadcast scalar)."""
    seq = _seq(spark, sf_dir)
    b = seq.agg(
        ((F.min("ingest_es") + F.max("ingest_es")) / 2).cast("long").alias("mid")
    )
    binc = F.least(
        F.lit(_DRIFT_BINS - 1), F.floor(F.log2(F.col("n_tok"))).cast("int") - 3
    )
    j = seq.crossJoin(F.broadcast(b)).select(
        "source",
        binc.alias("len_bin"),
        (F.col("ingest_es") <= F.col("mid")).alias("first_half"),
    )
    agg = j.groupBy("source", "len_bin").agg(
        F.sum(F.when(F.col("first_half"), 1).otherwise(0))
        .cast("long")
        .alias("n_first"),
        F.sum(F.when(F.col("first_half"), 0).otherwise(1))
        .cast("long")
        .alias("n_second"),
    )
    a, c = F.col("n_first").cast("double"), F.col("n_second").cast("double")
    chi = F.when(a + c > 0, (a - c) * (a - c) / (a + c)).otherwise(F.lit(0.0))
    return agg.select(
        "source", "len_bin", "n_first", "n_second",
        F.round(chi, 8).alias("chi2_term"),
    )


ORACLE_SOURCE_DRIFT = f"""
WITH seq AS ({sequences_sql(ORACLE_N_DOCS, with_tokens=False)}),
b AS (SELECT (min(ingest_es) + max(ingest_es)) // 2 AS mid FROM seq),
j AS (
  SELECT source,
         least({_DRIFT_BINS - 1}, CAST(floor(log2(n_tok)) AS INT) - 3) AS len_bin,
         ingest_es <= (SELECT mid FROM b) AS first_half
  FROM seq),
agg AS (
  SELECT source, len_bin,
         CAST(sum(CASE WHEN first_half THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
         CAST(sum(CASE WHEN first_half THEN 0 ELSE 1 END) AS BIGINT) AS n_second
  FROM j GROUP BY 1, 2)
SELECT source, len_bin, n_first, n_second,
       round(CASE WHEN n_first + n_second > 0
                  THEN (CAST(n_first AS DOUBLE) - n_second)
                       * (CAST(n_first AS DOUBLE) - n_second)
                       / (CAST(n_first AS DOUBLE) + n_second)
                  ELSE 0.0 END, 8) AS chi2_term
FROM agg
"""


# ------------------------------------------------------------- finite EWMA
_EWMA_K = 8
_EWMA_ALPHA_NUM, _EWMA_ALPHA_DEN = 1, 2  # α = 1/2 — dyadic, double-exact


def q_seq_ewma(spark, sf_dir):
    """Finite-horizon EWMA (window-K exponential smoothing) per source:
    weighted sum of the last K observed buckets with weights αʲ, α = ½.
    Dyadic α makes every product/sum double-exact, so both engines agree
    bit-for-bit with NO rounding.

    The infinite-horizon EWMA is a recursion (the Kalman kernel covers the
    recursive-state family); the K-term truncation is the declarative
    Catalyst form — error bounded by αᴷ = 2⁻⁸ of a weight, here exact
    because the same truncation defines the oracle.

    Scale (SHARD-KEYED, round-3): ROWS-bounded frame (K−1 = 7 lags) →
    exact under the halo exchange: each (source, time-range shard) gets
    the previous shard's last 7 rows replicated in, the identical lag
    expressions run per (source, shard) at cores-many tasks, halo rows'
    outputs are dropped."""
    raw = _raw(spark, sf_dir)
    sharded = halo(
        with_shard(
            raw.withColumn(
                "step", (F.col("bucket_es") / RAW_SECONDS).cast("long")
            ),
            "step",
        ),
        ["source"],
        "shard",
        "bucket_es",
        rows_before=_EWMA_K - 1,
    )
    w = Window.partitionBy("source", "shard").orderBy("bucket_es")
    num = F.lit(0.0)
    den = F.lit(0.0)
    wgt = 1.0
    for jj in range(_EWMA_K):
        v = F.col("sum_tok") if jj == 0 else F.lag("sum_tok", jj).over(w)
        num = num + F.when(v.isNotNull(), v.cast("double") * F.lit(wgt)).otherwise(0.0)
        den = den + F.when(v.isNotNull(), F.lit(wgt)).otherwise(0.0)
        wgt *= _EWMA_ALPHA_NUM / _EWMA_ALPHA_DEN
    return sharded.select(
        "source", "bucket_es", "_halo", (num / den).alias("ewma")
    ).filter(~F.col("_halo")).drop("_halo")


def _ewma_sql_terms() -> tuple[str, str]:
    nums, dens = [], []
    wgt = 1.0
    for jj in range(_EWMA_K):
        v = (
            "CAST(sum_tok AS DOUBLE)"
            if jj == 0
            else f"CAST(lag(sum_tok, {jj}) OVER w AS DOUBLE)"
        )
        nums.append(f"coalesce({v} * {wgt!r}, 0.0)")
        dens.append(f"CASE WHEN {v} IS NULL THEN 0.0 ELSE {wgt!r} END")
        wgt *= _EWMA_ALPHA_NUM / _EWMA_ALPHA_DEN
    return " + ".join(nums), " + ".join(dens)


_EWMA_NUM_SQL, _EWMA_DEN_SQL = _ewma_sql_terms()

ORACLE_EWMA = f"""
WITH raw AS ({_oracle_raw()})
SELECT source, bucket_es,
       ({_EWMA_NUM_SQL}) / ({_EWMA_DEN_SQL}) AS ewma
FROM raw
WINDOW w AS (PARTITION BY source ORDER BY bucket_es)
"""


# ------------------------------------------------------------ hampel filter
_HAMPEL_HALF = 3  # window = 2·3+1 = 7 points


def q_seq_hampel(spark, sf_dir):
    """Hampel outlier filter per source: flag buckets whose token sum sits
    more than 3 scaled-MADs from the rolling median of the surrounding 7
    buckets (the robust despike every TSDB ships; the reference's
    outlier handling is the KF innovation gate, kf/KF_class.py — this is
    its declarative batch sibling).

    Rolling median and MAD over integer inputs are exact dyadic rationals;
    the 3·1.4826·MAD threshold is one double product — same expression both
    engines, compared (not summed), so bit-stable.

    Scale (SHARD-KEYED, round-3): the two ±3 ROWS frames compose to a
    dependency depth of 6 rows (a surviving row's MAD frame needs absdev
    of rows ±3, each of whose median frame needs ±3 more) → halo depth 6
    on BOTH sides makes every surviving row's two-pass result exact per
    (source, time-range shard). Halo rows deeper than 3 carry truncated
    medians, but only other halo rows consume them — all dropped."""
    raw = _raw(spark, sf_dir)
    deep = 2 * _HAMPEL_HALF
    sharded = halo(
        with_shard(
            raw.withColumn(
                "step", (F.col("bucket_es") / RAW_SECONDS).cast("long")
            ),
            "step",
        ),
        ["source"],
        "shard",
        "bucket_es",
        rows_before=deep,
        rows_after=deep,
    )
    wroll = (
        Window.partitionBy("source", "shard")
        .orderBy("bucket_es")
        .rowsBetween(-_HAMPEL_HALF, _HAMPEL_HALF)
    )
    med = F.expr("percentile(sum_tok, 0.5)").over(wroll)
    step1 = sharded.select(
        "source", "shard", "bucket_es", "sum_tok", "_halo", med.alias("roll_med")
    ).withColumn("absdev", F.abs(F.col("sum_tok") - F.col("roll_med")))
    mad = F.expr("percentile(absdev, 0.5)").over(wroll)
    out = step1.withColumn("roll_mad", mad).filter(~F.col("_halo"))
    thresh = F.lit(3.0) * F.lit(1.4826) * F.col("roll_mad")
    return out.select(
        "source",
        "bucket_es",
        "sum_tok",
        F.round("roll_med", 6).alias("roll_med"),
        F.round("roll_mad", 6).alias("roll_mad"),
        (F.abs(F.col("sum_tok") - F.col("roll_med")) > thresh).alias("is_outlier"),
    )


ORACLE_HAMPEL = f"""
WITH raw AS ({_oracle_raw()}),
s1 AS (
  SELECT source, bucket_es, sum_tok,
         median(sum_tok) OVER (PARTITION BY source ORDER BY bucket_es
                               ROWS BETWEEN {_HAMPEL_HALF} PRECEDING
                                        AND {_HAMPEL_HALF} FOLLOWING) AS roll_med
  FROM raw),
s2 AS (
  SELECT source, bucket_es, sum_tok, roll_med,
         abs(sum_tok - roll_med) AS absdev
  FROM s1),
s3 AS (
  SELECT source, bucket_es, sum_tok, roll_med,
         median(absdev) OVER (PARTITION BY source ORDER BY bucket_es
                              ROWS BETWEEN {_HAMPEL_HALF} PRECEDING
                                       AND {_HAMPEL_HALF} FOLLOWING) AS roll_mad
  FROM s2)
SELECT source, bucket_es, sum_tok,
       round(roll_med, 6) AS roll_med,
       round(roll_mad, 6) AS roll_mad,
       abs(sum_tok - roll_med) > 3.0 * 1.4826 * roll_mad AS is_outlier
FROM s3
"""


# --------------------------------------------------------- grouped quantiles
def q_seq_daily_quantiles(spark, sf_dir):
    """Exact grouped percentiles: p50/p90/p99 of the 300 s bucket token
    sums within each (source, day) — the per-cohort latency-style summary
    every TSDB dashboard serves. Spark `percentile` and DuckDB
    `quantile_cont` share linear interpolation on sorted values, and the
    inputs are integers, so the interpolated values are identical doubles.

    Scale: exact percentiles need the group's values together — one
    shuffle on (source, day), group sizes bounded by the bucket grid
    (≤ 288 raw buckets/day), so no group ever exceeds a task."""
    raw = _raw(spark, sf_dir)
    day = ((F.col("bucket_es") / 86400).cast("long") * 86400).alias("day_es")
    return raw.groupBy("source", day).agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.expr("percentile(sum_tok, 0.5)").alias("p50"),
        F.expr("percentile(sum_tok, 0.9)").alias("p90"),
        F.expr("percentile(sum_tok, 0.99)").alias("p99"),
    )


ORACLE_DAILY_QUANTILES = f"""
WITH raw AS ({_oracle_raw()})
SELECT source,
       CAST((bucket_es // 86400) * 86400 AS BIGINT) AS day_es,
       CAST(count(*) AS BIGINT) AS n_buckets,
       quantile_cont(sum_tok, 0.5)  AS p50,
       quantile_cont(sum_tok, 0.9)  AS p90,
       quantile_cont(sum_tok, 0.99) AS p99
FROM raw GROUP BY 1, 2
"""


# -------------------------------------------------- time-weighted average
def q_seq_time_weighted_avg(spark, sf_dir):
    """Time-weighted average token rate per (source, day) over the
    IRREGULAR observed series — the TSDB aggregate a plain avg() gets
    wrong whenever sampling is uneven: each observation is weighted by
    its hold duration (last-observation-carried-forward to the next
    observed bucket, the final one to day end).

    All weights are integer seconds and values integer token sums, so
    numerator/denominator are exact longs; the ratio is one double
    division rounded identically on both engines.

    Scale: the lead() window partitions by (source, day) — date-bounded
    high-cardinality keys (no 5-task source ceiling, no shard pass
    needed); then a plain algebraic aggregation."""
    raw = _raw(spark, sf_dir)
    d = raw.select(
        "source",
        "bucket_es",
        "sum_tok",
        (F.expr(f"CAST(bucket_es AS BIGINT) div 86400")).alias("day"),
    )
    w = Window.partitionBy("source", "day").orderBy("bucket_es")
    nxt = F.lead("bucket_es").over(w)
    dur = (
        F.coalesce(nxt, (F.col("day") + 1) * 86400) - F.col("bucket_es")
    ).cast("long")
    per = d.select(
        "source", "day", "sum_tok", dur.alias("dur")
    )
    agg = per.groupBy("source", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum(F.col("sum_tok") * F.col("dur")).cast("long").alias("wsum"),
        F.sum("dur").cast("long").alias("dursum"),
    )
    return agg.select(
        "source",
        (F.col("day") * 86400).cast("long").alias("day_es"),
        "n_buckets",
        "wsum",
        "dursum",
        F.round(
            F.col("wsum").cast("double") / F.col("dursum").cast("double"), 9
        ).alias("twa"),
    )


ORACLE_TIME_WEIGHTED_AVG = f"""
WITH raw AS ({_oracle_raw()}),
d AS (
  SELECT source, bucket_es, sum_tok, bucket_es // 86400 AS day
  FROM raw),
per AS (
  SELECT source, day, sum_tok,
         coalesce(lead(bucket_es) OVER (PARTITION BY source, day
                                        ORDER BY bucket_es),
                  (day + 1) * 86400) - bucket_es AS dur
  FROM d),
agg AS (
  SELECT source, day,
         CAST(count(*) AS BIGINT)            AS n_buckets,
         CAST(sum(sum_tok * dur) AS BIGINT)  AS wsum,
         CAST(sum(dur) AS BIGINT)            AS dursum
  FROM per GROUP BY 1, 2)
SELECT source, CAST(day * 86400 AS BIGINT) AS day_es, n_buckets, wsum, dursum,
       round(CAST(wsum AS DOUBLE) / CAST(dursum AS DOUBLE), 9) AS twa
FROM agg
"""


# ------------------------------------------------------ cohort enrichment
def q_seq_bucket_zscore(spark, sf_dir):
    """Fact→aggregate enrichment join: each document joins its (source,
    1 h bucket) tier row and reports its token count's deviation from the
    cohort mean — the per-doc normalization a training-data pipeline
    applies before mixing sources. Deviation = n_tok − sum/count is a
    single exact-rational division, identical in both engines.

    Scale: the tier side is bucket-grid-bounded (≪ the doc table) and
    BROADCAST; the doc side never shuffles. The plan is scan → project →
    broadcast hash join — the cheapest possible enrichment shape."""
    seq = _seq(spark, sf_dir)
    tier = rollup_cascade(rollup_raw(seq), 3600).select(
        "source",
        F.col("bucket_es").alias("hour_es"),
        (F.col("sum_tok").cast("double") / F.col("n_docs")).alias("cohort_mean"),
        F.col("n_docs").alias("cohort_n"),
    )
    docs = seq.select(
        "doc_id",
        "source",
        "n_tok",
        ((F.col("ingest_es") / 3600).cast("long") * 3600).alias("hour_es"),
    )
    j = docs.join(F.broadcast(tier), ["source", "hour_es"])
    return j.select(
        "doc_id",
        "source",
        "hour_es",
        "n_tok",
        "cohort_n",
        F.round(F.col("n_tok") - F.col("cohort_mean"), 9).alias("dev_from_mean"),
    )


ORACLE_BUCKET_ZSCORE = f"""
WITH seq AS ({sequences_sql(ORACLE_N_DOCS, with_tokens=False)}),
tier AS (
  SELECT source,
         CAST((ingest_es // 3600) * 3600 AS BIGINT) AS hour_es,
         CAST(sum(n_tok) AS DOUBLE) / count(*) AS cohort_mean,
         CAST(count(*) AS BIGINT) AS cohort_n
  FROM seq GROUP BY 1, 2)
SELECT doc_id, source, hour_es, n_tok, cohort_n,
       round(n_tok - cohort_mean, 9) AS dev_from_mean
FROM (
  SELECT doc_id, source, n_tok,
         CAST((ingest_es // 3600) * 3600 AS BIGINT) AS hour_es
  FROM seq) d
JOIN tier USING (source, hour_es)
"""


QUERIES = {
    "seq_gaps_islands": q_seq_gaps_islands,
    "seq_interp_fill": q_seq_interp_fill,
    "seq_minmax_decimate": q_seq_minmax_decimate,
    "seq_counter_rate": q_seq_counter_rate,
    "tok_source_drift": q_tok_source_drift,
    "seq_ewma": q_seq_ewma,
    "seq_hampel": q_seq_hampel,
    "seq_daily_quantiles": q_seq_daily_quantiles,
    "seq_time_weighted_avg": q_seq_time_weighted_avg,
    "seq_bucket_zscore": q_seq_bucket_zscore,
}

ORACLE_SQL = {
    "seq_gaps_islands": ORACLE_GAPS_ISLANDS,
    "seq_interp_fill": ORACLE_INTERP_FILL,
    "seq_minmax_decimate": ORACLE_MINMAX_DECIMATE,
    "seq_counter_rate": ORACLE_COUNTER_RATE,
    "tok_source_drift": ORACLE_SOURCE_DRIFT,
    "seq_ewma": ORACLE_EWMA,
    "seq_hampel": ORACLE_HAMPEL,
    "seq_daily_quantiles": ORACLE_DAILY_QUANTILES,
    "seq_time_weighted_avg": ORACLE_TIME_WEIGHTED_AVG,
    "seq_bucket_zscore": ORACLE_BUCKET_ZSCORE,
}
