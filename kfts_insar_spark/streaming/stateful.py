"""Custom stateful streaming: the Kalman gap-fill as an
``applyInPandasWithState`` operator — the continuous form of the batch
resume path (reference update mode, SURVEY.md §2.9 T1).

Each doc's state is (k_done, idx0, m, P) — exactly the KF_STATE snapshot the
batch pipeline commits — kept in the streaming state store; every micro-batch
extends each doc's recursion over its newly-arrived steps and emits the
newly-archived phases. Batch and streaming therefore share one kernel and
one state layout: a job can hand over from streaming to batch resume (or
back) at any micro-batch boundary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.kalman import KFConfig, kalman_direct_batch

OUTPUT_SCHEMA = (
    "doc_id string, step int, t double, phase double, std double, "
    "innov double, gap_filled boolean"
)
STATE_SCHEMA = "k_done int, idx0 int, m array<double>, p array<double>"


def make_stateful_kf(t_grid: np.ndarray, cfg: KFConfig):
    """Build the (key, pdf_iter, state) → pdf_iter function for
    ``groupBy("doc_id").applyInPandasWithState(...)``."""
    t_grid = np.asarray(t_grid, dtype=np.float64)
    M = len(t_grid)
    L = cfg.L

    def fn(key, pdf_iter, state: GroupState):
        (doc_id,) = key
        rows = pd.concat(list(pdf_iter), ignore_index=True)
        values = np.full((1, M), np.nan)
        steps = rows["step"].to_numpy(np.int64)
        values[0, steps] = rows["value"].to_numpy(np.float64, na_value=np.nan)

        if state.exists:
            k_done, idx0, m_list, p_list = state.get
            n = len(m_list)
            init = {
                "X": np.asarray(m_list, dtype=np.float64).reshape(1, n),
                "P": np.asarray(p_list, dtype=np.float64).reshape(1, n, n),
                "idx0": idx0,
                "k_done": k_done,
            }
        else:
            init = None

        # run only through the last observed step this batch (later steps
        # stay unprocessed so their data can still arrive)
        hi = int(steps.max()) + 1 if len(steps) else (init["k_done"] if init else 1)
        res = kalman_direct_batch(values[:, :hi], t_grid[:hi], cfg, init=init)

        state.update(
            (
                int(res["k_done"]),
                int(res["idx0"]),
                [float(v) for v in res["m"][0]],
                [float(v) for v in res["P"][0].ravel()],
            )
        )

        emitted = np.flatnonzero(np.isfinite(res["phase"][0]))
        out = pd.DataFrame(
            {
                "doc_id": doc_id,
                "step": emitted.astype(np.int32),
                "t": t_grid[emitted],
                "phase": res["phase"][0][emitted],
                "std": res["std"][0][emitted],
                "innov": res["innov"][0][emitted],
                "gap_filled": res["gap"][0][emitted],
            }
        )
        yield out

    return fn


def stream_kalman(
    series_stream,
    t_grid: np.ndarray,
    cfg: KFConfig | None = None,
):
    """streaming series(doc_id, step, t, value) → per-micro-batch KF output
    with persistent per-doc state."""
    cfg = cfg or KFConfig()
    return series_stream.groupBy("doc_id").applyInPandasWithState(
        make_stateful_kf(t_grid, cfg),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
