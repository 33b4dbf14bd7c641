"""Relational operator coverage (SURVEY.md §2.2-2.8) over the driver's
TPC-H-ish tables, each with a DuckDB oracle.

Every query maps to operators the reference performs (citations inline) but
is expressed as the Spark plan we'd run at 100 TB: filters/projections pushed
to the scan, small dimensions broadcast, exact decimal aggregation, windows
partitioned by the natural key.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .common import DAVG_SQL, DSUM_SQL, davg, dsum, epoch_us, load


# ---------------------------------------------------------- aggregations
def q_lineitem_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape — grouped multi-agg (reference A1-A4 analog,
    kf2rms.py:143-154). Decimal sums → order-independent exactness."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(38,6)"
                )
            )
            .cast("double")
            .alias("sum_disc_price"),
            davg("l_quantity").alias("avg_qty"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


def q_revenue_by_nation(spark, sf_dir):
    """Broadcast-join chain customer⋈orders⋈nation (reference J4 analog,
    earthquake→pixel assignment via tiny-table broadcast,
    kf/utils/earthquake2step.py:196-204)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            dsum("o_totalprice").alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
    )


def q_events_hourly_rollup(spark, sf_dir):
    """The tier rollup applied to a real table: (event_type, 1 h bucket)."""
    ev = load(spark, sf_dir, "events")
    hour = ((epoch_us() / F.lit(3_600_000_000)).cast("long") * F.lit(3600)).alias(
        "bucket_es"
    )
    return (
        ev.select("event_type", hour, "value")
        .groupBy("event_type", "bucket_es")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            dsum("value").alias("sum_value"),
        )
    )


def q_quantiles_quantity(spark, sf_dir):
    """Exact percentiles (reference A6, np.quantile/nanpercentile,
    kf2rms.py:170,185 & checkinnov.py:99-107)."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.expr("percentile(l_quantity, 0.5)").alias("p50"),
        F.expr("percentile(l_quantity, 0.98)").alias("p98"),
        F.expr("percentile(l_quantity, 0.02)").alias("p02"),
    )


def q_low_data_filter(spark, sf_dir):
    """P1: per-key finite-observation count with threshold
    (kf/readinput.py:376-418) — users with ≥ 70 non-null event values."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count("value").cast("long").alias("n_valid"))
        .filter(F.col("n_valid") >= 70)
    )


def q_reference_region_subtract(spark, sf_dir):
    """A7: partial agg + broadcast subtract (re-referencing,
    prepare_input.py:353-373): value − avg(value) over its event_type.
    Exact: decimal group means, per-row double subtraction."""
    ev = load(spark, sf_dir, "events")
    means = ev.groupBy("event_type").agg(davg("value").alias("m"))
    return (
        ev.join(F.broadcast(means), "event_type")
        .select(
            "event_id",
            "event_type",
            (F.col("value") - F.col("m")).alias("v_ref"),
        )
    )


# ----------------------------------------------------------- windows/sorts
def q_events_lag_delta(spark, sf_dir):
    """W4: lagged differences over ordered series per key
    (kf/utils/createinput.py:170-182) — per-row doubles, exact."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
        F.row_number().over(w).cast("int").alias("step_idx"),
    )


def q_topk_orders_per_segment(spark, sf_dir):
    """O3 top-k per group: 3 priciest orders per market segment."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    w = W.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        j.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 3)
        .select("c_mktsegment", "rk", "o_orderkey", "o_totalprice")
    )


def q_events_sessionize(spark, sf_dir):
    """Sessionization: 30-min-gap cumsum per user (ordered stateful window,
    the relational cousin of the KF scan W1)."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (
        (epoch_us() - F.lag(epoch_us()).over(w)) > F.lit(1_800_000_000)
    ).cast("int")
    new_sess = F.when(F.lag("event_id").over(w).isNull(), F.lit(1)).otherwise(gap)
    sess = F.sum(new_sess).over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id", "user_id", sess.cast("long").alias("session_id")
    )


def q_events_asof_last_click(spark, sf_dir):
    """As-of join via ignore-nulls carry-forward (reference W3 gap-fill
    analog): for each 'purchase', the most recent prior 'click' value."""
    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    click_val = F.when(F.col("event_type") == "click", F.col("value"))
    carried = F.last(click_val, ignorenulls=True).over(w)
    return (
        ev.withColumn("last_click_value", carried)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "last_click_value")
    )


# --------------------------------------------------------------- set ops
def q_nation_setops(spark, sf_dir):
    """U1/U2: customer nations ∩ supplier nations, and ∖ (kfts.py:279-297
    date-set reconciliation)."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk")
    )
    both = c.intersect(s).withColumn("set_op", F.lit("both"))
    only_c = c.distinct().exceptAll(s.distinct()).withColumn(
        "set_op", F.lit("customer_only")
    )
    return both.unionByName(only_c).select("set_op", F.col("nk").cast("int").alias("nk"))


# ------------------------------------------------------- scalar projections
def q_zeros_as_missing(spark, sf_dir):
    """P8 zeros→NaN + P5 NaN predicate (prepare_input.py:665,
    KF_class.py:204-206): treat value==0 as missing, count + exact mean of
    the survivors per type."""
    ev = load(spark, sf_dir, "events")
    cleaned = ev.select(
        "event_type",
        F.when(F.col("value") == 0.0, None).otherwise(F.col("value")).alias("v"),
    )
    return cleaned.groupBy("event_type").agg(
        F.count("v").cast("long").alias("n_valid"),
        F.sum(F.col("v").isNull().cast("int")).cast("long").alias("n_missing"),
        dsum("v").alias("sum_v"),
    )


def q_decimal_year(spark, sf_dir):
    """F2 ordinal→decimal-year (kf/readinput.py:113-118): exact same
    integer/double arithmetic both engines."""
    ev = load(spark, sf_dir, "events")
    year = F.year("ts")
    leap = ((year % 4 == 0) & ((year % 100 != 0) | (year % 400 == 0))).cast("int")
    ylen = (F.lit(365) + leap).cast("double")
    dy = year.cast("double") + (F.dayofyear("ts") - 1).cast("double") / ylen
    return ev.select("event_id", dy.alias("dec_year"))


def q_amp_phase(spark, sf_dir):
    """F6 amplitude/phase from quadrature components
    (kf/timefunction.py:667-745): sqrt is correctly-rounded IEEE → exact;
    atan2 rounded to 9 dp for cross-engine tolerance."""
    ev = load(spark, sf_dir, "events")
    a = F.col("value")
    b = (F.col("user_id") % 17).cast("double")
    return ev.select(
        "event_id",
        F.sqrt(a * a + b * b).alias("amp"),
        F.round(F.atan2(a, b), 9).alias("phs"),
    )


def q_orders_monthly(spark, sf_dir):
    """Date bucketing via formatting (TZ-free on NTZ) — month rollup."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            dsum("o_totalprice").alias("sum_price"),
        )
    )


def q_geometric_band_filter(spark, sf_dir):
    """Geometric band filter (P4 — keep pixels between two parallel lines
    X = slope·Y + off, /root/reference/kf/readinput.py:420-453): events kept
    where value lies in the band (slope·user_id + o1, slope·user_id + o2].
    Dyadic slope → slope·user_id exact; comparisons identical cross-engine.
    Both band predicates are plain column inequalities the scan can
    evaluate before any shuffle (pushed residual filter)."""
    ev = load(spark, sf_dir, "events")
    line = F.lit(1.5) * F.col("user_id").cast("double")
    band = (F.col("value") > line + F.lit(10.0)) & (
        F.col("value") <= line + F.lit(250.0)
    )
    return ev.filter(band).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_in_band"),
        dsum("value").alias("sum_value"),
    )


def q_mask_fraction(spark, sf_dir):
    """Mask fraction summary (A8 — sum(mask)/(Nx·Ny) i.e. avg of an
    indicator, /root/reference/kf/readinput.py:413-416): per event_type,
    the fraction of rows passing a coherence-style mask. The 0/1 sum is an
    integer-valued double and count is exact → the division is a single
    correctly-rounded op on identical operands in both engines."""
    ev = load(spark, sf_dir, "events")
    mask = (F.col("value") > F.lit(100.0)) & (F.col("user_id") % 7 != 0)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum(mask.cast("long")).alias("n_masked"),
        F.avg(mask.cast("double")).alias("mask_frac"),
    )


QUERIES = {
    "lineitem_pricing_summary": q_lineitem_pricing_summary,
    "geometric_band_filter": q_geometric_band_filter,
    "mask_fraction": q_mask_fraction,
    "revenue_by_nation": q_revenue_by_nation,
    "events_hourly_rollup": q_events_hourly_rollup,
    "quantiles_quantity": q_quantiles_quantity,
    "low_data_filter": q_low_data_filter,
    "reference_region_subtract": q_reference_region_subtract,
    "events_lag_delta": q_events_lag_delta,
    "topk_orders_per_segment": q_topk_orders_per_segment,
    "events_sessionize": q_events_sessionize,
    "events_asof_last_click": q_events_asof_last_click,
    "nation_setops": q_nation_setops,
    "zeros_as_missing": q_zeros_as_missing,
    "decimal_year": q_decimal_year,
    "amp_phase": q_amp_phase,
    "orders_monthly": q_orders_monthly,
}

_S = DSUM_SQL
_A = DAVG_SQL

ORACLE_SQL = {
    "geometric_band_filter": f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_in_band,
       {_S.format(c='value')} AS sum_value
FROM events
WHERE value > 1.5 * CAST(user_id AS DOUBLE) + 10.0
  AND value <= 1.5 * CAST(user_id AS DOUBLE) + 250.0
GROUP BY 1
""",
    "mask_fraction": """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN value > 100.0 AND user_id % 7 != 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
       AVG(CASE WHEN value > 100.0 AND user_id % 7 != 0 THEN 1.0 ELSE 0.0 END) AS mask_frac
FROM events GROUP BY 1
""",
    "lineitem_pricing_summary": f"""
SELECT l_returnflag, l_linestatus,
       {_S.format(c='l_quantity')} AS sum_qty,
       {_S.format(c='l_extendedprice')} AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
       {_A.format(c='l_quantity')} AS avg_qty,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY 1, 2
""",
    "revenue_by_nation": f"""
SELECT n_name,
       {_S.format(c='o_totalprice')} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1
""",
    "events_hourly_rollup": f"""
SELECT event_type,
       CAST((epoch_us(ts) // 3600000000) * 3600 AS BIGINT) AS bucket_es,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {_S.format(c='value')} AS sum_value
FROM events GROUP BY 1, 2
""",
    "quantiles_quantity": """
SELECT quantile_cont(l_quantity, 0.5) AS p50,
       quantile_cont(l_quantity, 0.98) AS p98,
       quantile_cont(l_quantity, 0.02) AS p02
FROM lineitem
""",
    "low_data_filter": """
SELECT user_id, CAST(COUNT(value) AS BIGINT) AS n_valid
FROM events GROUP BY 1 HAVING COUNT(value) >= 70
""",
    "reference_region_subtract": f"""
WITH m AS (
  SELECT event_type, {_A.format(c='value')} AS m FROM events GROUP BY 1
)
SELECT event_id, e.event_type, e.value - m.m AS v_ref
FROM events e JOIN m ON e.event_type = m.event_type
""",
    "events_lag_delta": """
SELECT event_id, user_id,
       value - lag(value) OVER w AS delta,
       CAST(row_number() OVER w AS INT) AS step_idx
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    "topk_orders_per_segment": """
SELECT c_mktsegment, rk, o_orderkey, o_totalprice FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY c_mktsegment
              ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rk
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rk <= 3
""",
    "events_sessionize": """
SELECT event_id, user_id,
       CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS session_id
FROM (
  SELECT event_id, user_id, ts,
         CASE WHEN lag(event_id) OVER w IS NULL THEN 1
              WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1
              ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
""",
    "events_asof_last_click": """
SELECT event_id, user_id, last_click_value FROM (
  SELECT event_id, user_id, event_type,
         last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS last_click_value
  FROM events
) WHERE event_type = 'purchase'
""",
    "nation_setops": """
SELECT 'both' AS set_op, CAST(nk AS INT) AS nk FROM (
  SELECT c_nationkey AS nk FROM customer
  INTERSECT
  SELECT s_nationkey AS nk FROM supplier
)
UNION ALL
SELECT 'customer_only' AS set_op, CAST(nk AS INT) AS nk FROM (
  SELECT DISTINCT c_nationkey AS nk FROM customer
  EXCEPT
  SELECT DISTINCT s_nationkey AS nk FROM supplier
)
""",
    "zeros_as_missing": f"""
SELECT event_type,
       CAST(COUNT(v) AS BIGINT) AS n_valid,
       CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
       {_S.format(c='v')} AS sum_v
FROM (SELECT event_type, CASE WHEN value = 0.0 THEN NULL ELSE value END AS v
      FROM events)
GROUP BY 1
""",
    "decimal_year": """
SELECT event_id,
       CAST(year(ts) AS DOUBLE)
       + CAST(dayofyear(ts) - 1 AS DOUBLE)
         / CAST(365 + CASE WHEN year(ts) % 4 = 0
                            AND (year(ts) % 100 != 0 OR year(ts) % 400 = 0)
                      THEN 1 ELSE 0 END AS DOUBLE) AS dec_year
FROM events
""",
    "amp_phase": """
SELECT event_id,
       sqrt(value * value + CAST(user_id % 17 AS DOUBLE) * CAST(user_id % 17 AS DOUBLE)) AS amp,
       round(atan2(value, CAST(user_id % 17 AS DOUBLE)), 9) AS phs
FROM events
""",
    "orders_monthly": f"""
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {_S.format(c='o_totalprice')} AS sum_price
FROM orders GROUP BY 1
""",
}
