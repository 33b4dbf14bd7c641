"""Spline basis elements (BSPLINE/ISPLINE/LISEG, kf/timefunction.py:199-241,
privates :865-940) and the paper-repro golden model: the reference's own
synthetic test (/root/reference/synthetic_data.py:35-36) is
``[('POLY',1),('SIN',f),('COS',f),('ISPLINE',2,210,100),('STEP',500)]`` with
``m_r = [0.0, 40/365, 6., 4., 150., 100.]`` — the engine must recover m_r
through the Spark Kalman kernel."""

import numpy as np
import pandas as pd
import pytest

from kfts_insar_spark.functions.basis import (
    basis_matrix,
    basis_row,
    n_params,
    resolve_model,
    weighted_lsq,
)
from kfts_insar_spark.operators.kalman import (
    KFConfig,
    kalman_direct_batch,
    kalman_direct_oracle,
)

# the reference's acquisition grid: 3 years @ 12 days (synthetic_data.py:19-22)
T_DAYS = np.arange(0.0, 3 * 365.0, 12.0)
FREQ = 2.0 * np.pi / 365.0
GOLD_MODEL = [
    ("POLY", 1),
    ("SIN", FREQ),
    ("COS", FREQ),
    ("ISPLINE", 2, 210, 100),
    ("STEP", 500),
]
M_R = np.array([0.0, 40.0 / 365.0, 6.0, 4.0, 150.0, 100.0])


def test_n_params_multi_event_forms():
    assert n_params(GOLD_MODEL) == 6
    assert n_params([("STEP", 100, 200, 300)]) == 3
    assert n_params([("HTAN", 100, 10, 200, 20)]) == 2
    assert n_params([("BSPLINE", 3, 100, 10, 200, 20)]) == 2
    assert n_params([("LISEG", 100, 200, 300)]) == 4


def test_ispline_shape_and_normalization():
    model = resolve_model([("ISPLINE", 2, 210, 100)], T_DAYS)
    vals = np.array([basis_row(model, float(ti))[0] for ti in T_DAYS])
    # monotone non-decreasing ramp, normalized max exactly 1 on the grid
    assert np.all(np.diff(vals) >= -1e-12)
    assert vals.max() == pytest.approx(1.0)
    assert vals[0] == pytest.approx(0.0, abs=1e-12)
    # saturates after the event
    assert vals[-1] == pytest.approx(1.0)


def test_bspline_shape_and_normalization():
    model = resolve_model([("BSPLINE", 2, 210, 100)], T_DAYS)
    vals = np.array([basis_row(model, float(ti))[0] for ti in T_DAYS])
    assert vals.max() == pytest.approx(1.0)  # normalized peak
    # even orders peak at c + w/2 in the reference's formulation (the 0.5
    # parity shift, kf/timefunction.py:884-885, halves but does not remove
    # the truncated-power offset); odd orders are centred exactly
    peak = T_DAYS[np.argmax(vals)]
    assert abs(peak - (210 + 50)) <= 12
    model3 = resolve_model([("BSPLINE", 3, 210, 100)], T_DAYS)
    vals3 = np.array([basis_row(model3, float(ti))[0] for ti in T_DAYS])
    assert abs(T_DAYS[np.argmax(vals3)] - 210) <= 12
    assert vals[0] == pytest.approx(0.0, abs=1e-9)
    assert vals[-1] == pytest.approx(0.0, abs=1e-9)


def test_liseg_segments_and_saturation():
    # reference semantics (kf/timefunction.py:227-241): constant + per-
    # breakpoint slope that saturates at t_{i+1} past its segment
    row = basis_row([("LISEG", 100.0, 200.0)], 150.0)
    assert row.tolist() == [1.0, 50.0, 0.0]
    row = basis_row([("LISEG", 100.0, 200.0)], 250.0)
    assert row.tolist() == [1.0, 200.0, 50.0]  # seg1 saturated at t2(=200)
    row = basis_row([("LISEG", 100.0, 200.0)], 50.0)
    assert row.tolist() == [1.0, 0.0, 0.0]


def test_htan_is_smoothed_step():
    # 0.5 + 0.5·tanh (kf/timefunction.py:847-863), not a bare tanh
    row = basis_row([("HTAN", 100.0, 10.0)], 100.0)
    assert row[0] == pytest.approx(0.5)
    assert basis_row([("HTAN", 100.0, 10.0)], 1000.0)[0] == pytest.approx(1.0)


def _golden_series(n_docs: int, seed: int = 46, gap_frac: float = 0.15):
    rng = np.random.default_rng(seed)
    bas = basis_matrix(GOLD_MODEL, T_DAYS)  # (M, 6)
    truth = np.tile(M_R @ bas.T, (n_docs, 1))
    truth -= truth[:, :1]  # datum: phase at t0 exactly 0
    y = truth + rng.normal(0, 1.0, truth.shape)
    y[:, 0] = 0.0
    gaps = rng.random(truth.shape) < gap_frac
    gaps[:, 0] = False
    y[gaps] = np.nan
    return truth, y


GOLD_CFG = KFConfig(
    model=GOLD_MODEL, sig_y=10.0, sig_i=1.0, sig_a=100.0, t_sep=6
)


def test_golden_batch_kernel_matches_dense_oracle():
    _, y = _golden_series(5)
    res = kalman_direct_batch(y, T_DAYS, GOLD_CFG)
    for b in range(5):
        ora = kalman_direct_oracle(y[b], T_DAYS, GOLD_CFG)
        np.testing.assert_allclose(res["phase"][b], ora["phase"], rtol=1e-8)
        np.testing.assert_allclose(res["std"][b], ora["std"], rtol=1e-6)


def test_golden_model_recovers_m_r_through_spark_kernel(spark):
    """The paper-repro test: gap-filled phases from the Spark kernel,
    then the reference's LSQ step recovers the known parameters."""
    from kfts_insar_spark.operators.kalman import kalman_gapfill_wide

    truth, y = _golden_series(12)
    B, M = y.shape
    wide = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [f"d{b:03d}" for b in range(B)],
             "values": [ [None if np.isnan(v) else float(v) for v in y[b]]
                         for b in range(B) ]}
        )
    )
    out = (
        kalman_gapfill_wide(wide, T_DAYS, GOLD_CFG, min_batch_docs=4)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    phases = np.vstack(out["phase"].to_numpy())
    stds = np.vstack(out["std"].to_numpy())
    # gap-filled series tracks the truth
    rms = np.sqrt(np.nanmean((phases - truth) ** 2))
    assert rms < 2.0, rms
    # LSQ on the filtered phases recovers the generating parameters
    # (reference find_coeff_lsq over KF output, kf/timefunction.py:248-272)
    m_hat, _ = weighted_lsq(
        GOLD_MODEL, T_DAYS, phases, np.maximum(stds.mean(axis=0), 0.5)
    )
    m_hat = np.atleast_2d(m_hat)
    expect = M_R.copy()
    expect[0] -= (M_R @ basis_matrix(GOLD_MODEL, T_DAYS)[0])  # datum shift
    got = m_hat.mean(axis=0)
    assert abs(got[1] - expect[1]) < 0.02  # velocity 40/365 ≈ 0.1096 /day
    assert abs(got[2] - expect[2]) < 1.0  # sin amp 6
    assert abs(got[3] - expect[3]) < 1.0  # cos amp 4
    assert abs(got[4] - expect[4]) < 15.0  # ispline amp 150
    assert abs(got[5] - expect[5]) < 15.0  # step amp 100


def test_shift_t0_invariance():
    """Origin shift (reference shift_t0, kf/timefunction.py:320-401, its
    sign convention g(t+t0)==f(t)): rotated coefficients + shifted event
    times reproduce the original model values everywhere."""
    from kfts_insar_spark.functions.basis import (
        shift_model_times,
        shift_t0_coeffs,
    )

    model = [("POLY", 1), ("SIN", FREQ), ("COS", FREQ), ("STEP", 500.0)]
    rng = np.random.default_rng(3)
    m = rng.normal(0, 5, (8, 5))
    t0 = 37.5
    m2 = shift_t0_coeffs(model, m, t0)
    model2 = shift_model_times(model, t0)
    f = m @ basis_matrix(model, T_DAYS).T
    g = m2 @ basis_matrix(model2, T_DAYS + t0).T
    np.testing.assert_allclose(g, f, rtol=1e-10, atol=1e-10)
    # t0 = 0 is the identity
    np.testing.assert_array_equal(shift_t0_coeffs(model, m, 0.0), m)
