"""Functional-model DSL: basis functions of time.

Re-expresses the reference's model mini-language (tuples like
``[('POLY',1), ('SIN',f), ('COS',f), ('STEP',t0)]``; syntax table at
/root/reference/kf/timefunction.py:36-49, evaluation :146-246) in two forms:

- :func:`basis_matrix` — numpy (M, L) design matrix used inside the Kalman
  kernel and the weighted-LSQ fit (reference ``transition_vect`` /
  ``find_coeff_lsq``, kf/timefunction.py:248-272);
- :func:`basis_columns` — Spark Column expressions, so model *evaluation*
  (reference ``draw_model``, kf/timefunction.py:274-297) stays JVM-side.

Supported forms (superset used by the reference's synthetic golden test,
synthetic_data.py:35): POLY(deg), SIN(f), COS(f), STEP(t0), EXP(t0,tau),
LOG(t0,tau), HTAN(t0,width).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

Model = list[tuple]


def n_params(model: Model) -> int:
    """Number of coefficients L implied by the model (kf/timefunction.py:68-143)."""
    L = 0
    for mod in model:
        kind = mod[0]
        if kind == "POLY":
            L += mod[1] + 1
        elif kind in ("SIN", "COS", "STEP", "EXP", "LOG", "HTAN"):
            L += 1
        else:
            raise ValueError(f"unknown model element {kind!r}")
    return L


def basis_row(model: Model, t: float) -> np.ndarray:
    """One row of the design matrix — reference ``transition_vect`` semantics."""
    out: list[float] = []
    for mod in model:
        kind = mod[0]
        if kind == "POLY":
            out.extend(t**i for i in range(mod[1] + 1))
        elif kind == "SIN":
            out.append(math.sin(mod[1] * t))
        elif kind == "COS":
            out.append(math.cos(mod[1] * t))
        elif kind == "STEP":
            out.append(1.0 if t >= mod[1] else 0.0)
        elif kind == "EXP":
            t0, tau = mod[1], mod[2]
            out.append((1.0 - math.exp(-(t - t0) / tau)) if t >= t0 else 0.0)
        elif kind == "LOG":
            t0, tau = mod[1], mod[2]
            out.append(math.log(1.0 + (t - t0) / tau) if t >= t0 else 0.0)
        elif kind == "HTAN":
            t0, w = mod[1], mod[2]
            out.append(math.tanh((t - t0) / w))
        else:
            raise ValueError(f"unknown model element {kind!r}")
    return np.asarray(out, dtype=np.float64)


def basis_matrix(model: Model, t: np.ndarray) -> np.ndarray:
    """(M, L) design matrix over a time vector."""
    return np.vstack([basis_row(model, float(ti)) for ti in np.asarray(t)])


def basis_columns(model: Model, t: Column) -> list[Column]:
    """The same basis as Spark Column expressions (JVM-side, codegen'd)."""
    cols: list[Column] = []
    for mod in model:
        kind = mod[0]
        if kind == "POLY":
            cols.extend(F.pow(t, F.lit(i)) for i in range(mod[1] + 1))
        elif kind == "SIN":
            cols.append(F.sin(t * F.lit(mod[1])))
        elif kind == "COS":
            cols.append(F.cos(t * F.lit(mod[1])))
        elif kind == "STEP":
            cols.append(F.when(t >= F.lit(mod[1]), 1.0).otherwise(0.0))
        elif kind == "EXP":
            t0, tau = mod[1], mod[2]
            cols.append(
                F.when(t >= F.lit(t0), 1.0 - F.exp(-(t - F.lit(t0)) / F.lit(tau)))
                .otherwise(0.0)
            )
        elif kind == "LOG":
            t0, tau = mod[1], mod[2]
            cols.append(
                F.when(t >= F.lit(t0), F.log(1.0 + (t - F.lit(t0)) / F.lit(tau)))
                .otherwise(0.0)
            )
        elif kind == "HTAN":
            t0, w = mod[1], mod[2]
            cols.append(F.tanh((t - F.lit(t0)) / F.lit(w)))
        else:
            raise ValueError(f"unknown model element {kind!r}")
    return cols


def eval_model_column(model: Model, t: Column, coeffs: Column) -> Column:
    """f(t) = coeffs · basis(t) as a Column over array<double> coeffs —
    the Spark recast of ``draw_model`` (kf/timefunction.py:274-297)."""
    terms = basis_columns(model, t)
    expr = F.lit(0.0)
    for i, term in enumerate(terms):
        expr = expr + F.element_at(coeffs, i + 1) * term
    return expr


def weighted_lsq(
    model: Model, t: np.ndarray, y: np.ndarray, err: np.ndarray | float
) -> tuple[np.ndarray, np.ndarray]:
    """Weighted least squares per the reference's ``find_coeff_lsq``
    (kf/timefunction.py:248-272): Cm = (Aᵀ Cd⁻¹ A)⁻¹, m = Cm Aᵀ Cd⁻¹ y.

    ``y`` may be (M,) or (B, M) — vectorized across docs exactly like the
    reference vectorizes across pixels (kf/timefunction.py:263-265).
    """
    A = basis_matrix(model, t)
    w = np.broadcast_to(np.asarray(err, dtype=np.float64), t.shape) ** (-1)
    Aw = A * w[:, None]
    Cm = np.linalg.inv(A.T @ Aw)
    m = np.atleast_2d(y) @ (Aw @ Cm.T)
    merr = np.sqrt(np.diag(Cm))
    return (m[0] if np.ndim(y) == 1 else m), merr
