"""Second-wave operator coverage: reconstruction joins, theta joins, model
DSL evaluation, pivot/cube shapes, and a self-checking pipeline-resume gate.

Exactness trick used throughout: synthetic per-doc phase series built from
integer hash chains scaled by POWERS OF TWO (1/16, 1/128 …) — every value is
a dyadic rational representable exactly in float64, so differences, squares
and sums are bit-identical across engines and even sqrt() is correctly
rounded from identical operands.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..synth import MINSTD_A, MINSTD_M
from .common import DSUM_SQL, dsum, load

N_RECON_DOCS = 40
N_STEPS = 64
T_SEP = 4


# ------------------------------------------------- synthetic phases (exact)
def _phases(spark, n_docs: int = N_RECON_DOCS):
    """phase(doc, step) = ((h*31 + step²·7) % 4096) / 16  — dyadic-exact."""
    df = (
        spark.range(n_docs * N_STEPS)
        .select(
            (F.col("id") / N_STEPS).cast("long").alias("doc"),
            (F.col("id") % N_STEPS).cast("int").alias("step"),
        )
    )
    h = ((df.doc + 1) * F.lit(MINSTD_A)) % F.lit(MINSTD_M)
    val = ((h * 31 + df.step * df.step * 7) % F.lit(4096)).cast("double") / F.lit(16.0)
    return df.select("doc", "step", val.alias("phase"))


_PHASES_SQL = f"""
SELECT CAST(i // {N_STEPS} AS BIGINT) AS doc,
       CAST(i % {N_STEPS} AS INT) AS step,
       CAST((((i // {N_STEPS} + 1) * {MINSTD_A}) % {MINSTD_M} * 31
             + (i % {N_STEPS}) * (i % {N_STEPS}) * 7) % 4096 AS DOUBLE) / 16.0
         AS phase
FROM range(0, {N_RECON_DOCS * N_STEPS}) t(i)
"""


def q_pair_reconstruction_rms(spark, sf_dir):
    """Interferogram reconstruction + misfit stats — the kf2rms verification
    job (J2 self-join, /root/reference/kf2rms.py:128-132; A2/A3 per-doc RMS
    and signed mean, :143-150). obs = phase diff + deterministic dyadic
    'noise'; recon = self-join of the phase series on (t_plus, t_minus)."""
    ph = _phases(spark)
    # pair edge list: (doc, t_minus=k−d, t_plus=k) for d ≤ T_SEP
    steps = ph.select("doc", "step")
    pairs = (
        steps.alias("p")
        .join(
            spark.range(1, T_SEP + 1).select(F.col("id").cast("int").alias("d")),
            how="cross",
        )
        .filter(F.col("step") >= F.col("d"))
        .select(
            "doc",
            (F.col("step") - F.col("d")).alias("t_minus"),
            F.col("step").alias("t_plus"),
        )
    )
    a = ph.select("doc", F.col("step").alias("t_plus"), F.col("phase").alias("pp"))
    b = ph.select("doc", F.col("step").alias("t_minus"), F.col("phase").alias("pm"))
    noise = (
        ((F.col("doc") * 131 + F.col("t_plus") * 17 + F.col("t_minus")) % 64)
        .cast("double")
        / F.lit(128.0)
    )
    obs = (
        pairs.join(a, ["doc", "t_plus"])
        .join(b, ["doc", "t_minus"])
        .select(
            "doc",
            "t_minus",
            "t_plus",
            (F.col("pp") - F.col("pm") + noise).alias("obs"),
            (F.col("pp") - F.col("pm")).alias("recon"),
        )
    )
    d = F.col("obs") - F.col("recon")
    return obs.groupBy("doc").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sqrt(F.sum(d * d) / F.count(F.lit(1))).alias("rms"),
        (F.sum(d) / F.count(F.lit(1))).alias("mean_diff"),
    )


def q_per_obs_rms(spark, sf_dir):
    """Per-interferogram (per-obs-id) misfit stats (A4 — nanmean(|d−r|) and
    RMS grouped by observation id ACROSS pixels, /root/reference/
    kf2rms.py:152-154 — the transpose of A2/A3's per-pixel grouping). Same
    dyadic obs/recon construction as q_pair_reconstruction_rms; the misfit
    d = k/128 (k < 64) so sums of d, |d| and d² are exact in any order."""
    ph = _phases(spark)
    steps = ph.select("doc", "step")
    pairs = (
        steps.alias("p")
        .join(
            spark.range(1, T_SEP + 1).select(F.col("id").cast("int").alias("d")),
            how="cross",
        )
        .filter(F.col("step") >= F.col("d"))
        .select(
            "doc",
            (F.col("step") - F.col("d")).alias("t_minus"),
            F.col("step").alias("t_plus"),
        )
    )
    a = ph.select("doc", F.col("step").alias("t_plus"), F.col("phase").alias("pp"))
    b = ph.select("doc", F.col("step").alias("t_minus"), F.col("phase").alias("pm"))
    noise = (
        ((F.col("doc") * 131 + F.col("t_plus") * 17 + F.col("t_minus")) % 64)
        .cast("double")
        / F.lit(128.0)
    )
    obs = (
        pairs.join(a, ["doc", "t_plus"])
        .join(b, ["doc", "t_minus"])
        .select(
            "doc",
            "t_minus",
            "t_plus",
            (F.col("pp") - F.col("pm") + noise).alias("obs"),
            (F.col("pp") - F.col("pm")).alias("recon"),
        )
    )
    d = F.col("obs") - F.col("recon")
    return obs.groupBy("t_minus", "t_plus").agg(
        F.count(F.lit(1)).cast("long").alias("n_px"),
        (F.sum(F.abs(d)) / F.count(F.lit(1))).alias("mean_abs"),
        F.sqrt(F.sum(d * d) / F.count(F.lit(1))).alias("rms"),
    )


def q_close_events_dedup(spark, sf_dir):
    """Theta self-join dedup (J5 — closeby-quake dedup with inequality
    predicates, /root/reference/kf/utils/earthquake2step.py:243-269):
    purchase events within 300 s of a LARGER purchase by the same user are
    shadowed; return the survivors' count and value sum per user."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    e = ev.select("event_id", "user_id", "ts", "value")
    from .common import epoch_us

    a = e.select(
        "user_id",
        F.col("event_id").alias("id_a"),
        epoch_us("ts").alias("us_a"),
        F.col("value").alias("v_a"),
    )
    b = e.select(
        "user_id",
        F.col("event_id").alias("id_b"),
        epoch_us("ts").alias("us_b"),
        F.col("value").alias("v_b"),
    )
    shadowed = (
        a.join(b, "user_id")
        .filter(
            (F.col("id_a") != F.col("id_b"))
            & (F.abs(F.col("us_a") - F.col("us_b")) <= F.lit(300_000_000))
            & (
                (F.col("v_b") > F.col("v_a"))
                | ((F.col("v_b") == F.col("v_a")) & (F.col("id_b") < F.col("id_a")))
            )
        )
        .select("user_id", F.col("id_a").alias("event_id"))
        .distinct()
    )
    survivors = e.join(shadowed, ["user_id", "event_id"], "left_anti")
    return survivors.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        dsum("value").alias("sum_kept"),
    )


def q_model_eval_shift(spark, sf_dir):
    """Functional-model evaluation + time-origin shift (F4 draw_model
    kf/timefunction.py:274-297; F7 shift_t0 :320-401, POLY part): evaluate
    f(t) = c0 + c1·t on a dyadic grid and re-express with origin t0 = 2:
    c0' = c0 + 2·c1 must satisfy f'(t−2) == f(t) exactly."""
    docs = spark.range(200).select(F.col("id").alias("doc"))
    h = ((F.col("doc") + 1) * F.lit(MINSTD_A)) % F.lit(MINSTD_M)
    c0 = (h % 256).cast("double") / F.lit(16.0)
    c1 = ((h % 128) - 64).cast("double") / F.lit(32.0)
    grid = spark.range(16).select((F.col("id").cast("double") / 4.0).alias("t"))
    j = docs.select("doc", c0.alias("c0"), c1.alias("c1")).crossJoin(grid)
    f_t = F.col("c0") + F.col("c1") * F.col("t")
    c0s = F.col("c0") + F.lit(2.0) * F.col("c1")  # shift_t0 for POLY(1)
    f_shift = c0s + F.col("c1") * (F.col("t") - F.lit(2.0))
    return j.select(
        "doc",
        "t",
        f_t.alias("f"),
        (f_t - f_shift).alias("shift_resid"),  # exactly 0.0 (dyadic)
    )


TRIG_T0 = 0.75  # dyadic origin shift for the rotation query
TRIG_FREQ = 6.283185307179586  # 2π (annual signal on decimal-year axis)


def q_amp_phase_errprop(spark, sf_dir):
    """Amplitude/phase-shift with first-order error propagation (F6,
    reference comp_phase_shift kf/timefunction.py:667-745): per-doc dyadic
    sin/cos amplitudes AND variances → amp, phase, amp_var, phase_var.
    Rational arithmetic is identical cross-engine; sqrt/atan2 operate on
    identical operands."""
    from ..functions.basis import amp_phase_errprop

    docs = spark.range(2000).select(F.col("id").alias("doc"))
    h1 = ((F.col("doc") + 1) * F.lit(MINSTD_A)) % F.lit(MINSTD_M)
    h2 = (h1 * F.lit(MINSTD_A)) % F.lit(MINSTD_M)
    h3 = (h2 * F.lit(MINSTD_A)) % F.lit(MINSTD_M)
    a = (h1 % 496 + 16).cast("double") / F.lit(16.0)  # cos amp > 0
    b = ((h2 % 1024) - 512).cast("double") / F.lit(16.0)  # sin amp
    sa = (h3 % 256 + 16).cast("double") / F.lit(64.0)  # var(cos)
    sb = ((h3 * 31) % 256 + 16).cast("double") / F.lit(64.0)  # var(sin)
    d = docs.select("doc", a.alias("a"), b.alias("b"), sa.alias("sa"), sb.alias("sb"))
    cols = amp_phase_errprop(F.col("b"), F.col("a"), F.col("sb"), F.col("sa"))
    return d.select(
        "doc",
        cols["amp"].alias("amp"),
        # atan2 is not correctly-rounded IEEE → 9 dp for cross-engine parity
        F.round(cols["phase"], 9).alias("phase"),
        cols["amp_var"].alias("amp_var"),
        cols["phase_var"].alias("phase_var"),
    )


_AMP_PHASE_ERRPROP_SQL = f"""
WITH d AS (
  SELECT doc,
         CAST(h1 % 496 + 16 AS DOUBLE) / 16.0 AS a,
         CAST((h2 % 1024) - 512 AS DOUBLE) / 16.0 AS b,
         CAST(h3 % 256 + 16 AS DOUBLE) / 64.0 AS sa,
         CAST((h3 * 31) % 256 + 16 AS DOUBLE) / 64.0 AS sb
  FROM (
    SELECT doc, h1, h2, (h2 * {MINSTD_A}) % {MINSTD_M} AS h3
    FROM (
      SELECT doc, h1, (h1 * {MINSTD_A}) % {MINSTD_M} AS h2
      FROM (SELECT i AS doc, ((i + 1) * {MINSTD_A}) % {MINSTD_M} AS h1
            FROM range(0, 2000) t(i))
    )
  )
)
SELECT doc,
       sqrt((a * a) + (b * b)) AS amp,
       round(atan2(a, b), 9) AS phase,
       ((a * a) * sa + (b * b) * sb) / ((a * a) + (b * b)) AS amp_var,
       ((a * a) * sb + (b * b) * sa)
         / (((a * a) + (b * b)) * ((a * a) + (b * b))) AS phase_var
FROM d
"""


EQ_EVENTS = [
    {"x": 8.0, "y": 8.0, "amp": 12.0, "width": 2.0},
    {"x": 2.0, "y": 14.0, "amp": 20.0, "width": 4.0},
]
EQ_MODEL = [("POLY", 1), ("STEP", 1.0, 2.0)]


def q_earthquake_p0_patch(spark, sf_dir):
    """Per-doc earthquake prior P0 patch (reference earthquakeIntegration,
    kfts.py:172-220): the thresholded Gaussian of the event amplitude around
    each epicentre, per doc coordinate — the array that overrides the
    kernel's a-priori variances. Dyadic coordinates; exp() rounded to 9 dp
    for cross-engine parity."""
    from ..operators.kalman import earthquake_prior_columns

    docs = spark.range(2000).select(F.col("id").alias("doc"))
    h1 = ((F.col("doc") + 1) * F.lit(MINSTD_A)) % F.lit(MINSTD_M)
    h2 = (h1 * F.lit(MINSTD_A)) % F.lit(MINSTD_M)
    x = (h1 % 64).cast("double") / F.lit(4.0)
    y = (h2 % 64).cast("double") / F.lit(4.0)
    d = docs.select("doc", x.alias("x"), y.alias("y"))
    p0 = earthquake_prior_columns(
        EQ_MODEL, F.col("x"), F.col("y"), EQ_EVENTS, sig_a=30.0
    )
    return d.select(
        "doc",
        "x",
        "y",
        F.element_at(p0, 1).alias("p0_c0"),
        F.element_at(p0, 2).alias("p0_c1"),
        # exp() is not correctly-rounded IEEE; a 1-ULP cross-engine diff
        # can straddle any rounding boundary — 4 dp makes that ~4e-11/value
        F.round(F.element_at(p0, 3), 4).alias("p0_eq1"),
        F.round(F.element_at(p0, 4), 4).alias("p0_eq2"),
    )


def _eq_p0_sql() -> str:
    def gauss(e):
        return (
            f"{e['amp'] ** 2!r} * exp(-((({e['x']!r} - x) * ({e['x']!r} - x)"
            f" + ({e['y']!r} - y) * ({e['y']!r} - y)) / {2.0 * e['width'] ** 2!r}))"
        )

    g1, g2 = gauss(EQ_EVENTS[0]), gauss(EQ_EVENTS[1])
    return f"""
WITH d AS (
  SELECT doc,
         CAST(h1 % 64 AS DOUBLE) / 4.0 AS x,
         CAST(h2 % 64 AS DOUBLE) / 4.0 AS y
  FROM (
    SELECT doc, h1, (h1 * {MINSTD_A}) % {MINSTD_M} AS h2
    FROM (SELECT i AS doc, ((i + 1) * {MINSTD_A}) % {MINSTD_M} AS h1
          FROM range(0, 2000) t(i))
  )
)
SELECT doc, x, y,
       900.0 AS p0_c0,
       900.0 AS p0_c1,
       round(CASE WHEN {g1} < 1.0 THEN 0.0 ELSE {g1} END, 4) AS p0_eq1,
       round(CASE WHEN {g2} < 1.0 THEN 0.0 ELSE {g2} END, 4) AS p0_eq2
FROM d
"""


LISEG_MODEL = [("POLY", 0), ("LISEG", 1.0, 4.0, 7.0)]


def q_liseg_p0_patch(spark, sf_dir):
    """Per-doc LISEG a-priori P0 vector (reference per-param sig_a wiring,
    kfts.py:117-129,211 — the liseg_prior_columns builder): model =
    POLY(0) + LISEG with 3 segment slopes; slope j's sigma derives from
    the doc id deterministically, with (doc + j) % 3 == 0 segments PINNED
    (zero a-priori variance → the kernel never optimizes them). Pure
    integer/dyadic arithmetic — value-exact in both engines."""
    from ..operators.kalman import liseg_prior_columns

    docs = spark.range(2000).select(F.col("id").alias("doc"))
    seg = [
        F.when((F.col("doc") + j) % 3 == 0, F.lit(0.0)).otherwise(
            F.lit(20.0 + j)
        )
        for j in range(3)
    ]
    p0 = liseg_prior_columns(LISEG_MODEL, sig_a=30.0, seg_sigmas=seg)
    return docs.select(
        "doc",
        F.element_at(p0, 1).alias("p0_poly"),
        F.element_at(p0, 2).alias("p0_a0"),
        F.element_at(p0, 3).alias("p0_s1"),
        F.element_at(p0, 4).alias("p0_s2"),
        F.element_at(p0, 5).alias("p0_s3"),
    )


def _liseg_p0_sql() -> str:
    segs = ", ".join(
        f"CAST(CASE WHEN (doc + {j}) % 3 = 0 THEN 0.0"
        f" ELSE {(20.0 + j)!r} * {(20.0 + j)!r} END AS DOUBLE) AS p0_s{j + 1}"
        for j in range(3)
    )
    return f"""
SELECT doc, CAST(900.0 AS DOUBLE) AS p0_poly, CAST(900.0 AS DOUBLE) AS p0_a0,
       {segs}
FROM (SELECT i AS doc FROM range(0, 2000) t(i))
"""


def q_trig_shift_rotation(spark, sf_dir):
    """SIN/COS time-origin rotation (F7, reference shift_t0
    kf/timefunction.py:320-401): per-doc dyadic coefficients rotated to a
    new origin t0 — the trig factors cos(ω·t0)/sin(ω·t0) are plan-time
    Python literals, identical in the DuckDB oracle, so the rotation
    arithmetic is value-exact cross-engine. Invariance g(t+t0) == f(t) is
    covered by pytest (floating-point trig on data is engine-specific)."""
    import math

    cf = math.cos(TRIG_FREQ * TRIG_T0)
    sf = math.sin(TRIG_FREQ * TRIG_T0)
    docs = spark.range(2000).select(F.col("id").alias("doc"))
    h1 = ((F.col("doc") + 1) * F.lit(MINSTD_A)) % F.lit(MINSTD_M)
    h2 = (h1 * F.lit(MINSTD_A)) % F.lit(MINSTD_M)
    c0 = (h1 % 256).cast("double") / F.lit(16.0)
    c1 = ((h1 % 128) - 64).cast("double") / F.lit(32.0)
    b = ((h2 % 1024) - 512).cast("double") / F.lit(16.0)  # sin amp
    a = (((h2 * 31) % 1024) - 512).cast("double") / F.lit(16.0)  # cos amp
    d = docs.select(
        "doc", c0.alias("c0"), c1.alias("c1"), b.alias("b"), a.alias("a")
    )
    return d.select(
        "doc",
        (F.col("c0") + F.col("c1") * F.lit(-TRIG_T0)).alias("c0_new"),
        F.col("c1").alias("c1_new"),
        (F.col("b") * F.lit(cf) + F.col("a") * F.lit(sf)).alias("sin_new"),
        (F.col("a") * F.lit(cf) - F.col("b") * F.lit(sf)).alias("cos_new"),
    )


def _trig_shift_sql() -> str:
    import math

    cf = repr(math.cos(TRIG_FREQ * TRIG_T0))
    sf = repr(math.sin(TRIG_FREQ * TRIG_T0))
    return f"""
WITH d AS (
  SELECT doc,
         CAST(h1 % 256 AS DOUBLE) / 16.0 AS c0,
         CAST((h1 % 128) - 64 AS DOUBLE) / 32.0 AS c1,
         CAST((h2 % 1024) - 512 AS DOUBLE) / 16.0 AS b,
         CAST(((h2 * 31) % 1024) - 512 AS DOUBLE) / 16.0 AS a
  FROM (
    SELECT doc, h1, (h1 * {MINSTD_A}) % {MINSTD_M} AS h2
    FROM (SELECT i AS doc, ((i + 1) * {MINSTD_A}) % {MINSTD_M} AS h1
          FROM range(0, 2000) t(i))
  )
)
SELECT doc,
       c0 + c1 * {-TRIG_T0!r} AS c0_new,
       c1 AS c1_new,
       b * {cf} + a * {sf} AS sin_new,
       a * {cf} - b * {sf} AS cos_new
FROM d
"""


# Full-DSL spline model on a dyadic grid: every basis element the reference
# supports (kf/timefunction.py:36-49), exact cross-engine (POLY/STEP/LISEG/
# B-/I-splines are piecewise polynomials of dyadic rationals; the spline
# norm constants are identical double literals on both sides).
SPLINE_MODEL = [
    ("POLY", 1),
    ("ISPLINE", 2, 6.0, 2.0),
    ("BSPLINE", 3, 10.0, 2.0),
    ("STEP", 8.0),
    ("LISEG", 4.0, 12.0),
]
SPLINE_COEFFS = [1.0, 0.5, 100.0, 50.0, 25.0, 2.0, 0.25, 0.125]
SPLINE_GRID_N = 257  # t = j/16, j in [0, 256] — dyadic


def _spline_t_grid():
    import numpy as np

    return np.arange(SPLINE_GRID_N) / 16.0


def q_model_basis_spline(spark, sf_dir):
    """F3 full basis DSL (BSPLINE/ISPLINE/LISEG + STEP + POLY) evaluated
    JVM-side on a dyadic grid, plus the model value f = c·basis — value-
    exact vs the DuckDB oracle built by basis_sql term-for-term
    (reference transition_vect kf/timefunction.py:146-241, splines
    :865-940)."""
    from ..functions.basis import basis_columns

    grid = spark.range(SPLINE_GRID_N).select(
        (F.col("id").cast("double") / F.lit(16.0)).alias("t")
    )
    cols = basis_columns(SPLINE_MODEL, F.col("t"), _spline_t_grid())
    sel = [F.col("t")]
    f = F.lit(0.0)
    for i, (c, col) in enumerate(zip(SPLINE_COEFFS, cols)):
        sel.append(col.alias(f"b{i}"))
        f = f + F.lit(c) * col
    sel.append(f.alias("f"))
    return grid.select(*sel)


def _spline_oracle_sql() -> str:
    from ..functions.basis import basis_sql

    exprs = basis_sql(SPLINE_MODEL, "t", _spline_t_grid())
    parts = []
    f = "0.0"
    for i, (c, e) in enumerate(zip(SPLINE_COEFFS, exprs)):
        parts.append(f"{e} AS b{i}")
        f = f"({f} + {c!r} * {e})"
    cols = ",\n       ".join(parts)
    return f"""
WITH grid AS (SELECT CAST(i AS DOUBLE) / 16.0 AS t
              FROM range(0, {SPLINE_GRID_N}) g(i))
SELECT t,
       {cols},
       {f} AS f
FROM grid
"""


def q_pivot_user_event_types(spark, sf_dir):
    """Long→wide pivot (F12, kf/utils/createinput.py:175-185 reshape): event
    counts per user pivoted to one column per type (portable form:
    conditional aggregation, identical in both engines)."""
    ev = load(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    aggs = [
        F.sum((F.col("event_type") == t).cast("long")).cast("long").alias(f"n_{t}")
        for t in types
    ]
    return ev.groupBy("user_id").agg(*aggs)


def q_cube_pricing(spark, sf_dir):
    """CUBE over (returnflag, linestatus) — grouping-set aggregates the
    reference lacks but a rollup engine needs (SURVEY.md §2.4 note)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            dsum("l_extendedprice").alias("sum_price"),
        )
    )


def q_distinct_parts_per_supplier(spark, sf_dir):
    """Exact distinct aggregation (two-level shuffle at scale)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").cast("long").alias("n_parts"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join, filtered scan, top-10 by revenue with
    deterministic tie-break — join-reordering + pushdown showcase."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15")
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
    )
    rev = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
    ).cast("double")
    return (
        j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rev.alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            "o_orderpriority",
            "revenue",
        )
    )


def q_pipeline_resume_consistency(spark, sf_dir):
    """Self-checking M4 gate: one-shot TierPipeline == split-run + resume,
    across every tier, as a single mismatch count (oracle: the constant 0).
    Exercises snapshot commits, watermark resume, and partition overwrites
    end-to-end inside the graded query surface."""
    import tempfile

    from ..pipeline import TierPipeline
    from ..synth import sequences

    seq = sequences(spark, 1500)
    with tempfile.TemporaryDirectory() as td:
        one = TierPipeline(td + "/one")
        one.run(spark, seq)
        two = TierPipeline(td + "/two")
        cut = seq.approxQuantile("ingest_es", [0.5], 0)[0]
        two.run(spark, seq.filter(F.col("ingest_es") <= cut))
        two.run(spark, seq)
        total = 0
        tier_cols = {
            "raw": ["source", "bucket_es", "n_docs", "sum_tok", "min_tok", "max_tok"],
            "1h": ["source", "bucket_es", "n_docs", "sum_tok", "min_tok", "max_tok"],
            "1d": ["source", "bucket_es", "n_docs", "sum_tok", "min_tok", "max_tok"],
            "gapfilled": [
                "source", "shard", "bucket_es", "phase", "std", "innov", "gap_filled",
            ],
        }
        for tier, cols in tier_cols.items():
            va = one.read_tier(spark, tier).select(*cols)
            vb = two.read_tier(spark, tier).select(*cols)
            total += va.exceptAll(vb).count() + vb.exceptAll(va).count()
    return spark.createDataFrame([(total,)], "n_mismatch bigint")


# ------------------------------------------------ network island diagnostic
N_NET_EPOCHS = 48
NET_BREAKS = (17, 33)  # acquisition-segment starts → 3 islands


def _net_pairs(spark):
    """Deterministic gappy interferogram pair network WITH disconnected
    islands: candidate edges (k−d, k) for d ≤ T_SEP, kept only when both
    epochs fall in the same acquisition segment ([0,17), [17,33),
    [33,48)) — no pair spans a segment break, exactly the disconnected
    network the reference warns about — plus a hash thinning of the
    d > 1 edges so island interiors are irregular but stay connected
    through the d = 1 chain."""
    eps = spark.range(N_NET_EPOCHS).select(F.col("id").cast("int").alias("k"))
    ds = spark.range(1, T_SEP + 1).select(F.col("id").cast("int").alias("d"))
    edges = (
        eps.join(ds, how="cross")
        .filter(F.col("k") >= F.col("d"))
        .select(
            (F.col("k") - F.col("d")).alias("t_minus"),
            F.col("k").alias("t_plus"),
            "d",
        )
    )

    def seg(c):
        return (
            F.when(c < NET_BREAKS[0], 0)
            .when(c < NET_BREAKS[1], 1)
            .otherwise(2)
        )

    return (
        edges.filter(seg(F.col("t_minus")) == seg(F.col("t_plus")))
        .filter(
            (F.col("d") == 1)
            | (((F.col("t_plus") * 7 + F.col("d")) % 5) != 0)
        )
        .select("t_minus", "t_plus")
    )


def q_pairs_islands(spark, sf_dir):
    """Network connectivity / island diagnostic — the reference's
    ingest-time sanity gate (/root/reference/prepare_input.py:568-576:
    ``nIslands = min(Jmat.shape) − rank(Jmat)``, warning when the pair
    network is disconnected). For the epoch-incidence matrix of a pair
    graph with c connected components over n epochs, rank = n − c, so
    nIslands ≡ the component count — computed here WITHOUT any matrix
    rank: distributed connected components (alternating large-star/
    small-star, operators/concomp.py) over the (t_minus, t_plus) edge
    list. Per epoch: its island id (smallest reachable epoch), the
    island size, and the global island count.

    Scale: epochs are metadata-scale (one per acquisition — thousands at
    most), but the SAME plan runs unchanged on a per-pixel edge list;
    concomp is shuffle-bounded O(log n) rounds."""
    from ..operators.concomp import connected_components

    edges = _net_pairs(spark).select(
        F.col("t_minus").cast("bigint").alias("a"),
        F.col("t_plus").cast("bigint").alias("b"),
    )
    comp = connected_components(edges, "a", "b")
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("island_size")
    )
    n = comp.agg(
        F.countDistinct("component").cast("long").alias("n_islands")
    )
    return (
        comp.join(sizes, "component")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("node").cast("long").alias("epoch"),
            F.col("component").cast("long").alias("island_id"),
            "island_size",
            "n_islands",
        )
    )


QUERIES = {
    "pair_reconstruction_rms": q_pair_reconstruction_rms,
    "pairs_islands": q_pairs_islands,
    "per_obs_rms": q_per_obs_rms,
    "close_events_dedup": q_close_events_dedup,
    "model_eval_shift": q_model_eval_shift,
    "model_basis_spline": q_model_basis_spline,
    "amp_phase_errprop": q_amp_phase_errprop,
    "trig_shift_rotation": q_trig_shift_rotation,
    "earthquake_p0_patch": q_earthquake_p0_patch,
    "liseg_p0_patch": q_liseg_p0_patch,
    "pivot_user_event_types": q_pivot_user_event_types,
    "cube_pricing": q_cube_pricing,
    "distinct_parts_per_supplier": q_distinct_parts_per_supplier,
    "shipping_priority": q_shipping_priority,
    "pipeline_resume_consistency": q_pipeline_resume_consistency,
}

_S = DSUM_SQL

ORACLE_SQL = {
    "pairs_islands": f"""
WITH RECURSIVE raw_edges AS (
  SELECT k - d AS t_minus, k AS t_plus, d
  FROM (SELECT CAST(i AS INT) AS k FROM range(0, {N_NET_EPOCHS}) t(i))
  CROSS JOIN (SELECT CAST(i AS INT) AS d FROM range(1, {T_SEP + 1}) t(i))
  WHERE k >= d
),
kept AS (
  SELECT t_minus, t_plus FROM raw_edges
  WHERE (CASE WHEN t_minus < {NET_BREAKS[0]} THEN 0
              WHEN t_minus < {NET_BREAKS[1]} THEN 1 ELSE 2 END)
      = (CASE WHEN t_plus < {NET_BREAKS[0]} THEN 0
              WHEN t_plus < {NET_BREAKS[1]} THEN 1 ELSE 2 END)
    AND (d = 1 OR (t_plus * 7 + d) % 5 != 0)
),
edges AS (
  SELECT CAST(t_minus AS BIGINT) AS u, CAST(t_plus AS BIGINT) AS v FROM kept
  UNION
  SELECT CAST(t_plus AS BIGINT), CAST(t_minus AS BIGINT) FROM kept
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v != r.u
),
lab AS (
  SELECT u AS epoch, least(u, min(v)) AS island_id FROM reach GROUP BY u
),
sizes AS (
  SELECT island_id, CAST(count(*) AS BIGINT) AS island_size FROM lab GROUP BY 1
),
n AS (SELECT CAST(count(DISTINCT island_id) AS BIGINT) AS n_islands FROM lab)
SELECT lab.epoch, lab.island_id, sizes.island_size, n.n_islands
FROM lab JOIN sizes USING (island_id) CROSS JOIN n
""",
    "pair_reconstruction_rms": f"""
WITH ph AS ({_PHASES_SQL}),
pairs AS (
  SELECT p.doc, p.step - d.d AS t_minus, p.step AS t_plus
  FROM ph p CROSS JOIN (SELECT CAST(i AS INT) AS d FROM range(1, {T_SEP + 1}) t(i)) d
  WHERE p.step >= d.d
),
obs AS (
  SELECT pr.doc, pr.t_minus, pr.t_plus,
         a.phase - b.phase
           + CAST((pr.doc * 131 + pr.t_plus * 17 + pr.t_minus) % 64 AS DOUBLE) / 128.0
           AS obs,
         a.phase - b.phase AS recon
  FROM pairs pr
  JOIN ph a ON a.doc = pr.doc AND a.step = pr.t_plus
  JOIN ph b ON b.doc = pr.doc AND b.step = pr.t_minus
)
SELECT doc, CAST(count(*) AS BIGINT) AS n_pairs,
       sqrt(sum((obs - recon) * (obs - recon)) / count(*)) AS rms,
       sum(obs - recon) / count(*) AS mean_diff
FROM obs GROUP BY doc
""",
    "per_obs_rms": f"""
WITH ph AS ({_PHASES_SQL}),
pairs AS (
  SELECT p.doc, p.step - d.d AS t_minus, p.step AS t_plus
  FROM ph p CROSS JOIN (SELECT CAST(i AS INT) AS d FROM range(1, {T_SEP + 1}) t(i)) d
  WHERE p.step >= d.d
),
obs AS (
  SELECT pr.doc, pr.t_minus, pr.t_plus,
         a.phase - b.phase
           + CAST((pr.doc * 131 + pr.t_plus * 17 + pr.t_minus) % 64 AS DOUBLE) / 128.0
           AS obs,
         a.phase - b.phase AS recon
  FROM pairs pr
  JOIN ph a ON a.doc = pr.doc AND a.step = pr.t_plus
  JOIN ph b ON b.doc = pr.doc AND b.step = pr.t_minus
)
SELECT t_minus, t_plus, CAST(count(*) AS BIGINT) AS n_px,
       sum(abs(obs - recon)) / count(*) AS mean_abs,
       sqrt(sum((obs - recon) * (obs - recon)) / count(*)) AS rms
FROM obs GROUP BY t_minus, t_plus
""",
    "close_events_dedup": f"""
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS us, value FROM events
  WHERE event_type = 'purchase'
),
shadowed AS (
  SELECT DISTINCT a.user_id, a.event_id
  FROM p a JOIN p b ON a.user_id = b.user_id AND a.event_id != b.event_id
   AND abs(a.us - b.us) <= 300000000
   AND (b.value > a.value OR (b.value = a.value AND b.event_id < a.event_id))
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_kept,
       {_S.format(c='value')} AS sum_kept
FROM p
WHERE NOT EXISTS (
  SELECT 1 FROM shadowed s
  WHERE s.user_id = p.user_id AND s.event_id = p.event_id
)
GROUP BY user_id
""",
    "model_eval_shift": f"""
WITH docs AS (
  SELECT i AS doc,
         CAST(((i + 1) * {MINSTD_A}) % {MINSTD_M} % 256 AS DOUBLE) / 16.0 AS c0,
         CAST(((i + 1) * {MINSTD_A}) % {MINSTD_M} % 128 - 64 AS DOUBLE) / 32.0 AS c1
  FROM range(0, 200) t(i)
),
grid AS (SELECT CAST(i AS DOUBLE) / 4.0 AS t FROM range(0, 16) g(i))
SELECT doc, t,
       c0 + c1 * t AS f,
       (c0 + c1 * t) - ((c0 + 2.0 * c1) + c1 * (t - 2.0)) AS shift_resid
FROM docs CROSS JOIN grid
""",
    "model_basis_spline": _spline_oracle_sql(),
    "amp_phase_errprop": _AMP_PHASE_ERRPROP_SQL,
    "trig_shift_rotation": _trig_shift_sql(),
    "earthquake_p0_patch": _eq_p0_sql(),
    "liseg_p0_patch": _liseg_p0_sql(),
    "pivot_user_event_types": """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
FROM events GROUP BY user_id
""",
    "cube_pricing": f"""
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n,
       {_S.format(c='l_extendedprice')} AS sum_price
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    "distinct_parts_per_supplier": """
SELECT l_suppkey,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem GROUP BY 1
""",
    "shipping_priority": """
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
    "pipeline_resume_consistency": """
SELECT CAST(0 AS BIGINT) AS n_mismatch
""",
}
