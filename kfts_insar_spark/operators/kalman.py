"""Per-doc Kalman smoother with bounded state, gap-fill, and retention —
the analytics kernel (SURVEY.md §2.5 W1-W3, §2.10).

Re-expresses the reference's per-pixel recursion
(/root/reference/kf/KF_class.py: predict :251-267, update :269-307,
state compaction ``reduce_sizes_m_P`` :337-378, main loop ``kf`` :468-580)
as a **batch-vectorized numpy kernel inside applyInPandas**: docs are grouped
into hash buckets (whole groups guaranteed by applyInPandas), pivoted to a
(B docs × M steps) matrix, and the recursion runs once per *step* with all
B docs advanced simultaneously via batched linear algebra. This works because
the state-size evolution (grow by one phase per step, compact to the last
``t_sep`` phases once ``k >= t_sep``) depends only on k, never on the data —
so every doc in the batch shares matrix shapes at every step.

Semantics preserved from the reference:
- state = [L model params | trailing phases], first phase pinned to 0
  (``start_new``, kf/KF_class.py:129-137);
- predict appends the *model forecast* as the new phase: A = [[I],[basis(t_k)]]
  (``create_A``, kf/timefunction.py:299-312);
- process noise Q = diag(m_err·I_L, phi_err·I_phases, add_err on the newest
  phase) (``create_Q``, kf/KF_class.py:154-180);
- a step with no usable observation returns the forecast with inflated
  variance — the gap-fill (kf/KF_class.py:280-283);
- compaction archives phases older than ``t_sep`` with std = sqrt(|diag P|),
  dropping covariance cross-terms (kf/KF_class.py:337-378). The reference's
  ``(k%5==0) or (k_end-1)`` condition is always truthy (SURVEY.md §4) — i.e.
  compaction runs EVERY step; we implement that actual behavior.

Two kernels:
- :func:`kalman_direct_batch` — scalar observation per (doc, step): the hot
  path for gap-filling the rolled-up token-count series. Fully vectorized
  across docs; a gap is a masked update (K := 0), which is *algebraically
  identical* to the reference's skip-update branch.
- :func:`kalman_pairs_doc` — observations are differences over an incidence
  edge list (the interferogram case, ``create_H_R_and_D``
  kf/KF_class.py:182-248): exact reference semantics per doc, used by the
  reconstruction golden tests.

Scale notes: one shuffle on the doc-hash bucket; state is O((L+t_sep)²) per
doc (reference bound: kfts.py:413, t_sep ≤ 10) → ~2 KB/doc; Arrow batches of
~10⁴ docs × 10² steps keep the Python-side work per task in vectorized numpy.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.basis import Model, basis_matrix, basis_row, n_params
from ..schema import KF_OUTPUT, KF_STATE


@dataclass(frozen=True)
class KFConfig:
    """Noise/model config — mirrors the INI [KALMAN FILTER SETUP] section
    (reference kfts.py:48-130)."""

    model: Model = field(default_factory=lambda: [("POLY", 1)])
    sig_y: float = 10.0  # mismodeling std (kfts.py sig_y)
    sig_i: float = 0.1  # observation std
    sig_a: float = 25.0  # a-priori param std (P0 = sig_a² I)
    m_err: float = 0.0  # process noise on params
    phi_err: float = 0.0  # process noise on archived phases
    t_sep: int = 4  # phases kept in state (reference default 6, cap 10)

    @property
    def L(self) -> int:
        return n_params(self.model)

    @property
    def add_err(self) -> float:
        # variance inflation on the newest (forecast) phase = sig_y²
        # (reference kfts.py:344: add_err = sig_y**2)
        return self.sig_y**2


def kalman_direct_batch(
    values: np.ndarray,
    t: np.ndarray,
    cfg: KFConfig,
    init: dict | None = None,
) -> dict[str, np.ndarray]:
    """Run the bounded-state KF over a (B, M) batch of series with NaN gaps.

    ``init`` resumes from a committed state snapshot (the reference's update
    mode, ``restart_from_file`` kf/KF_class.py:70-116): dict with keys
    X (B,n), P (B,n,n), idx0, k_done. Steps < idx0 were archived by the
    previous run and are not re-emitted; steps idx0..k_done−1 (the overlap
    still in state, reference ``tshift`` kf/readinput.py:539-541) are
    re-emitted with their refined values.

    Returns dict with phase (B,M), std (B,M), innov (B,M), gap (B,M bool),
    m (B, n) final state, P (B, n, n) final covariance, idx0, k_done.
    """
    values = np.asarray(values, dtype=np.float64)
    B, M = values.shape
    L, ts = cfg.L, cfg.t_sep
    R = cfg.sig_i**2

    phase = np.full((B, M), np.nan)
    std = np.full((B, M), np.nan)
    innov = np.full((B, M), np.nan)
    gap = np.zeros((B, M), dtype=bool)

    if init is not None:
        X = np.array(init["X"], dtype=np.float64)
        P = np.array(init["P"], dtype=np.float64)
        idx0 = int(init["idx0"])
        k_start = int(init["k_done"])
        n = X.shape[1]
    else:
        # init: params 0 with variance sig_a², phase_0 pinned to 0 (variance 0)
        n = L + 1
        X = np.zeros((B, n))
        P = np.zeros((B, n, n))
        P[:, np.arange(L), np.arange(L)] = cfg.sig_a**2
        # observation at step 0 defines the datum: phase_0 ≡ 0 exactly
        phase[:, 0] = 0.0
        std[:, 0] = 0.0
        idx0 = 0  # step index of the first phase currently in state
        k_start = 1

    bas = basis_matrix(cfg.model, t)  # (M, L)

    for k in range(k_start, M):
        b = bas[k]  # (L,)
        # ---- predict: append model-forecast phase (blocked A = [[I],[b,0…]])
        phi_f = X[:, :L] @ b  # (B,)
        C = np.einsum("l,bln->bn", b, P[:, :L, :])  # cov(new phase, state)
        v_new = np.einsum("l,blm,m->b", b, P[:, :L, :L], b) + cfg.add_err

        Xf = np.concatenate([X, phi_f[:, None]], axis=1)
        Pf = np.empty((B, n + 1, n + 1))
        Pf[:, :n, :n] = P
        Pf[:, np.arange(L), np.arange(L)] += cfg.m_err
        Pf[:, np.arange(L, n), np.arange(L, n)] += cfg.phi_err
        Pf[:, n, :n] = C
        Pf[:, :n, n] = C
        Pf[:, n, n] = v_new
        n += 1

        # ---- update: scalar obs y_k on the newest phase (H = e_last)
        y = values[:, k]
        obs = np.isfinite(y)
        nu = np.where(obs, y - Xf[:, -1], np.nan)
        S = Pf[:, -1, -1] + R  # (B,)
        K = Pf[:, :, -1] / S[:, None]  # (B, n)
        K[~obs] = 0.0  # gap → no update (== reference forecast-only branch)
        X = Xf + K * np.where(obs, nu, 0.0)[:, None]
        P = Pf - np.einsum("bi,bj->bij", K, Pf[:, -1, :])
        innov[:, k] = nu
        gap[:, k] = ~obs

        # ---- compaction every step (reference's always-true condition)
        if k >= ts:
            n_phases = n - L
            n_drop = n_phases - ts
            if n_drop > 0:
                dropped = X[:, L : L + n_drop]
                dvar = P[:, np.arange(L, L + n_drop), np.arange(L, L + n_drop)]
                steps = np.arange(idx0, idx0 + n_drop)
                phase[:, steps] = dropped
                std[:, steps] = np.sqrt(np.abs(dvar))
                keep = np.r_[np.arange(L), np.arange(L + n_drop, n)]
                X = X[:, keep]
                P = P[:, keep[:, None], keep[None, :]]
                idx0 += n_drop
                n -= n_drop

    # ---- flush remaining phases (reference kf() epilogue, KF_class.py:561-565)
    # state (X, P) is NOT modified by the flush — it remains resumable
    rem = n - L
    steps = np.arange(idx0, idx0 + rem)
    phase[:, steps] = X[:, L:]
    pv = P[:, np.arange(L, n), np.arange(L, n)]
    std[:, steps] = np.sqrt(np.abs(pv))

    return {
        "phase": phase,
        "std": std,
        "innov": innov,
        "gap": gap,
        "m": X,
        "P": P,
        "idx0": idx0,
        "k_done": M,
    }


# --------------------------------------------------------------------------
# Independent dense oracle — deliberately written with explicit A/Q/H
# matrices and np.linalg, mirroring the reference line-by-line, to validate
# the blocked batch kernel above. Test-only; never in the hot path.
# --------------------------------------------------------------------------
def kalman_direct_oracle(
    y: np.ndarray, t: np.ndarray, cfg: KFConfig
) -> dict[str, np.ndarray]:
    y = np.asarray(y, dtype=np.float64)
    M = len(y)
    L, ts = cfg.L, cfg.t_sep
    phase = np.full(M, np.nan)
    std = np.full(M, np.nan)
    innov = np.full(M, np.nan)

    m = np.zeros(L + 1)  # params + phase0 (pinned 0)
    P = np.diag([cfg.sig_a**2] * L + [0.0])
    idx0 = 0
    phase[0], std[0] = 0.0, 0.0

    for k in range(1, M):
        n = len(m)
        A = np.vstack([np.eye(n), np.zeros(n)])
        A[n, :L] = basis_row(cfg.model, float(t[k]))
        Q = np.diag([cfg.m_err] * L + [cfg.phi_err] * (n + 1 - L))
        Q[-1, -1] = cfg.add_err
        mf = A @ m
        Pf = A @ P @ A.T + Q

        if np.isfinite(y[k]):
            H = np.zeros((1, n + 1))
            H[0, -1] = 1.0
            nu = y[k] - (H @ mf)[0]
            S = np.array([[cfg.sig_i**2]]) + H @ Pf @ H.T
            K = Pf @ H.T @ np.linalg.inv(S)
            m = mf + (K @ [[nu]]).ravel()
            P = Pf - K @ H @ Pf
            innov[k] = nu
        else:
            m, P = mf, Pf

        if k >= ts:
            n_drop = (len(m) - L) - ts
            if n_drop > 0:
                for d in range(n_drop):
                    phase[idx0 + d] = m[L + d]
                    std[idx0 + d] = np.sqrt(abs(P[L + d, L + d]))
                keep = list(range(L)) + list(range(L + n_drop, len(m)))
                m = m[keep]
                P = P[np.ix_(keep, keep)]
                idx0 += n_drop

    for d in range(len(m) - L):
        phase[idx0 + d] = m[L + d]
        std[idx0 + d] = np.sqrt(abs(P[L + d, L + d]))
    return {"phase": phase, "std": std, "innov": innov, "m": m, "P": P}


# --------------------------------------------------------------------------
# Pairs mode — exact reference semantics (interferogram differences).
# Per doc; observation i at step t_plus is y_i = φ(t_plus) − φ(t_minus) + ε.
# --------------------------------------------------------------------------
def kalman_pairs_doc(
    pairs: np.ndarray,  # (N, 3): t_minus, t_plus, obs_value (NaN allowed)
    t: np.ndarray,
    cfg: KFConfig,
) -> dict[str, np.ndarray]:
    """Reference-faithful filter over an incidence edge list
    (``create_H_R_and_D`` kf/KF_class.py:182-248 with the constraint
    t_plus − t_minus ≤ t_sep, which the generators guarantee)."""
    M = len(t)
    L, ts = cfg.L, cfg.t_sep
    tm = pairs[:, 0].astype(int)
    tp = pairs[:, 1].astype(int)
    obs = pairs[:, 2].astype(np.float64)
    assert (tp - tm).max(initial=0) <= ts, "pair span exceeds t_sep"

    phase = np.full(M, np.nan)
    std = np.full(M, np.nan)
    innov = np.full(M, np.nan)

    m = np.zeros(L + 1)
    P = np.diag([cfg.sig_a**2] * L + [0.0])
    idx0 = 0
    phase[0], std[0] = 0.0, 0.0

    for k in range(1, M):
        n = len(m)
        A = np.vstack([np.eye(n), np.zeros(n)])
        A[n, :L] = basis_row(cfg.model, float(t[k]))
        Q = np.diag([cfg.m_err] * L + [cfg.phi_err] * (n + 1 - L))
        Q[-1, -1] = cfg.add_err
        mf = A @ m
        Pf = A @ P @ A.T + Q
        n += 1

        # measurement selection: pairs whose later epoch is exactly k and
        # whose value is finite (P5/P6 predicates, KF_class.py:201-206)
        sel = np.where((tp == k) & np.isfinite(obs))[0]
        if len(sel) > 0:
            nobs = len(sel)
            H = np.zeros((nobs, n))
            state_of = lambda s: L + (s - idx0)  # noqa: E731
            for r, i in enumerate(sel):
                H[r, state_of(tp[i])] = 1.0
                H[r, state_of(tm[i])] = -1.0
            D = obs[sel]
            Rm = np.eye(nobs) * cfg.sig_i**2
            nu = D - H @ mf
            S = Rm + H @ Pf @ H.T
            K = Pf @ H.T @ np.linalg.inv(S)
            m = mf + K @ nu
            P = Pf - K @ H @ Pf
            innov[k] = float(np.mean(nu))
        else:
            m, P = mf, Pf

        if k >= ts:
            n_drop = (len(m) - L) - ts
            if n_drop > 0:
                for d in range(n_drop):
                    phase[idx0 + d] = m[L + d]
                    std[idx0 + d] = np.sqrt(abs(P[L + d, L + d]))
                keep = list(range(L)) + list(range(L + n_drop, len(m)))
                m = m[keep]
                P = P[np.ix_(keep, keep)]
                idx0 += n_drop

    for d in range(len(m) - L):
        phase[idx0 + d] = m[L + d]
        std[idx0 + d] = np.sqrt(abs(P[L + d, L + d]))
    return {"phase": phase, "std": std, "innov": innov, "m": m, "P": P}


# --------------------------------------------------------------------------
# Spark operator: groupBy(doc-hash bucket).applyInPandas, kernel vectorized
# across all docs in the bucket. No per-row Python anywhere.
# --------------------------------------------------------------------------
def kalman_gapfill(
    series: DataFrame,
    t_grid: np.ndarray,
    cfg: KFConfig | None = None,
    num_buckets: int = 128,
    emit_state: bool = False,
) -> DataFrame:
    """series(doc_id, step, t, value) → KF_OUTPUT rows (+ optionally state).

    ``num_buckets`` sizes the shuffle groups: each applyInPandas call gets
    ~n_docs/num_buckets whole docs and runs the batch kernel once. On a
    cluster, set num_buckets ≈ 2-4× total cores (same rule the reference's
    MPI split uses for rank count, kf/readinput.py:166-212).
    """
    cfg = cfg or KFConfig()
    t_grid = np.asarray(t_grid, dtype=np.float64)
    M = len(t_grid)
    out_schema = KF_STATE if emit_state else KF_OUTPUT

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        wide = (
            pdf.pivot_table(
                index="doc_id", columns="step", values="value", dropna=False
            )
            .reindex(columns=range(M))
        )
        docs = wide.index.to_numpy()
        res = kalman_direct_batch(wide.to_numpy(), t_grid, cfg)
        B = len(docs)
        if emit_state:
            return pd.DataFrame(
                {
                    "doc_id": docs,
                    "k_done": np.full(B, res["k_done"], dtype=np.int32),
                    "idx0": np.full(B, res["idx0"], dtype=np.int32),
                    "m": list(res["m"]),
                    "P": list(res["P"].reshape(B, -1)),
                }
            )
        return pd.DataFrame(
            {
                "doc_id": np.repeat(docs, M),
                "step": np.tile(np.arange(M, dtype=np.int32), B),
                "t": np.tile(t_grid, B),
                "phase": res["phase"].ravel(),
                "std": res["std"].ravel(),
                "innov": res["innov"].ravel(),
                "gap_filled": res["gap"].ravel(),
            }
        )

    bucketed = series.withColumn(
        "_b", F.pmod(F.xxhash64("doc_id"), F.lit(num_buckets))
    )
    return bucketed.groupBy("_b").applyInPandas(run, schema=out_schema)


def kalman_resume(
    series: DataFrame,
    state: DataFrame,
    t_grid: np.ndarray,
    cfg: KFConfig | None = None,
    num_buckets: int = 128,
    emit_state: bool = False,
) -> DataFrame:
    """Update mode: continue each doc's recursion from a committed state
    snapshot over an extended time grid (reference entry point 2,
    SURVEY.md §3.2; kfts.py:252-330 + restart_from_file).

    ``series`` must cover the full grid's NEW steps (earlier steps may be
    absent); ``state`` is the KF_STATE output of the previous run. Cogrouped
    by the same doc-hash bucket so whole docs meet their state in one
    Arrow batch.
    """
    cfg = cfg or KFConfig()
    t_grid = np.asarray(t_grid, dtype=np.float64)
    M = len(t_grid)
    out_schema = KF_STATE if emit_state else KF_OUTPUT

    def run(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if right.empty:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        right = right.sort_values("doc_id")
        docs = right["doc_id"].to_numpy()
        k_done = int(right["k_done"].iloc[0])
        idx0 = int(right["idx0"].iloc[0])
        Bm = np.vstack(right["m"].to_numpy())
        n = Bm.shape[1]
        Pm = np.vstack(right["P"].to_numpy()).reshape(len(docs), n, n)
        wide = (
            left.pivot_table(index="doc_id", columns="step", values="value", dropna=False)
            .reindex(index=docs, columns=range(M))
        )
        res = kalman_direct_batch(
            wide.to_numpy(),
            t_grid,
            cfg,
            init={"X": Bm, "P": Pm, "idx0": idx0, "k_done": k_done},
        )
        B = len(docs)
        if emit_state:
            return pd.DataFrame(
                {
                    "doc_id": docs,
                    "k_done": np.full(B, res["k_done"], dtype=np.int32),
                    "idx0": np.full(B, res["idx0"], dtype=np.int32),
                    "m": list(res["m"]),
                    "P": list(res["P"].reshape(B, -1)),
                }
            )
        out = pd.DataFrame(
            {
                "doc_id": np.repeat(docs, M),
                "step": np.tile(np.arange(M, dtype=np.int32), B),
                "t": np.tile(t_grid, B),
                "phase": res["phase"].ravel(),
                "std": res["std"].ravel(),
                "innov": res["innov"].ravel(),
                "gap_filled": res["gap"].ravel(),
            }
        )
        # drop steps archived by the PREVIOUS run (they carry NaN here)
        return out[np.isfinite(out["phase"].to_numpy())]

    sb = series.withColumn("_b", F.pmod(F.xxhash64("doc_id"), F.lit(num_buckets)))
    st = state.withColumn("_b", F.pmod(F.xxhash64("doc_id"), F.lit(num_buckets)))
    return sb.groupBy("_b").cogroup(st.groupBy("_b")).applyInPandas(
        run, schema=out_schema
    )
