"""Deramp golden (reference findramp/removeramp, prepare_input.py:384-435):
exact plane recovery on noise-free groups; deramped residual ≈ noise."""

import numpy as np
import pandas as pd
import pytest

from kfts_insar_spark.operators.deramp import (
    fit_ramps,
    network_consistent_ramps,
    remove_ramp,
)


@pytest.fixture(scope="module")
def grid(spark):
    rng = np.random.default_rng(11)
    rows = []
    truth = {}
    for gid in range(12):
        a, b, c = rng.uniform(-2, 2, 3)
        truth[gid] = (a, b, c)
        for _ in range(200):
            x, y = rng.uniform(0, 50, 2)
            v = a * x + b * y + c + rng.normal(0, 0.01)
            rows.append((gid, x, y, v))
    pdf = pd.DataFrame(rows, columns=["group_id", "x", "y", "v"])
    return spark.createDataFrame(pdf), truth


def test_fit_recovers_planes(spark, grid):
    df, truth = grid
    got = fit_ramps(df).toPandas().set_index("group_id").sort_index()
    for gid, (a, b, c) in truth.items():
        np.testing.assert_allclose(
            got.loc[gid, ["a", "b", "c"]].to_numpy(), [a, b, c], atol=0.01
        )
    assert (got["rms"] < 0.05).all()


def test_remove_ramp_kills_trend(spark, grid):
    df, _ = grid
    ramps = fit_ramps(df)
    out = remove_ramp(df, ramps).toPandas()
    assert abs(out["v_deramped"].mean()) < 0.01
    assert out["v_deramped"].std() < 0.05


def test_network_consistency_projection():
    """Ramps already in the incidence row space are unchanged; components
    outside it are removed (rank-truncated SVD pinv, prepare_input.py:491-506)."""
    # simple 4-epoch chain network: obs i = epoch_{i+1} − epoch_i
    links = np.array(
        [[-1, 1, 0, 0], [0, -1, 1, 0], [0, 0, -1, 1], [-1, 0, 1, 0]], float
    )
    epochs = np.array([0.0, 2.0, 3.0, 7.0])
    consistent = links @ epochs  # in row space by construction
    ramps = pd.DataFrame(
        {"group_id": range(4), "a": consistent, "b": consistent, "c": consistent}
    )
    out = network_consistent_ramps(ramps, links)
    np.testing.assert_allclose(out["a"].to_numpy(), consistent, atol=1e-10)
    # an inconsistent perturbation in the left null space gets projected out
    rng = np.random.default_rng(3)
    rand = rng.normal(0, 1, 4)
    r1 = network_consistent_ramps(
        pd.DataFrame({"group_id": range(4), "a": rand, "b": rand, "c": rand}),
        links,
    )["a"].to_numpy()
    r2 = network_consistent_ramps(
        pd.DataFrame({"group_id": range(4), "a": r1, "b": r1, "c": r1}), links
    )["a"].to_numpy()
    np.testing.assert_allclose(r1, r2, atol=1e-10)
