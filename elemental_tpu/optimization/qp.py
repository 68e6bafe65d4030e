"""Interior-point quadratic programming (reference MISSING ``optimization/``
QP solvers, spec from ``examples/interface/QP*.py`` callers):

  direct form:  min ½ xᵀQx + cᵀx  s.t.  A·x = b,  x ≥ 0
  box form:     min ½ xᵀQx + cᵀx  s.t.  l ≤ x ≤ u

Mehrotra predictor-corrector on the augmented quasi-definite KKT
[[Q + Θ, −Aᵀ], [A, δI]] (LU + refinement, as in :mod:`.lp`)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import scipy.linalg as sla

from ..sparse.csr import SparseMatrix
from .lp import LPCtrl, LPResult, _steplen


def qp_direct(Q, A, b: np.ndarray, c: np.ndarray,
              ctrl: Optional[LPCtrl] = None) -> LPResult:
    """min ½xᵀQx + cᵀx s.t. Ax = b, x ≥ 0 (reference ``QPDirect``)."""
    ctrl = ctrl or LPCtrl()
    Qd = Q.to_dense() if isinstance(Q, SparseMatrix) else np.asarray(Q)
    Ad = A.to_dense() if isinstance(A, SparseMatrix) else np.asarray(A)
    m, n = Ad.shape

    x = np.ones(n)
    y = np.zeros(m)
    z = np.ones(n)
    bnorm, cnorm = np.linalg.norm(b) + 1, np.linalg.norm(c) + 1

    it = 0
    converged = False
    for it in range(1, ctrl.max_iters + 1):
        rb = b - Ad @ x
        rc = c + Qd @ x - Ad.T @ y - z
        mu = x @ z / n
        obj = 0.5 * x @ Qd @ x + c @ x
        if (np.linalg.norm(rb) / bnorm < ctrl.tol
                and np.linalg.norm(rc) / cnorm < ctrl.tol
                and mu < ctrl.tol):
            converged = True
            break
        theta = z / x
        K = np.zeros((n + m, n + m))
        K[:n, :n] = Qd + np.diag(theta)
        K[:n, n:] = -Ad.T
        K[n:, :n] = Ad
        K[n:, n:] = -ctrl.reg * np.eye(m)
        lu_piv = sla.lu_factor(K)

        def directions(rmu):
            # (Q+Θ)dx − Aᵀdy = −rc + rmu/x ; A dx = rb
            rhs = np.concatenate([-rc + rmu / x, rb])
            sol = sla.lu_solve(lu_piv, rhs)
            r2 = rhs - np.concatenate([
                (Qd + np.diag(theta)) @ sol[:n] - Ad.T @ sol[n:],
                Ad @ sol[:n]])
            sol = sol + sla.lu_solve(lu_piv, r2)
            dx, dy = sol[:n], sol[n:]
            dz = (rmu - z * dx) / x
            return dx, dy, dz

        dxa, dya, dza = directions(-x * z)
        ap = _steplen(x, dxa, 1.0)
        ad = _steplen(z, dza, 1.0)
        mu_aff = ((x + ap * dxa) @ (z + ad * dza)) / n
        sigma = (mu_aff / mu) ** 3 if mu > 0 else 0.0
        dx, dy, dz = directions(sigma * mu - x * z - dxa * dza)
        ap = _steplen(x, dx, ctrl.tau)
        ad = _steplen(z, dz, ctrl.tau)
        alpha = min(ap, ad)
        x = x + alpha * dx
        y = y + alpha * dy
        z = z + alpha * dz
        if ctrl.verbose:
            print(f"  it {it}: mu={mu:.3e} obj={obj:.8g}")

    obj = float(0.5 * x @ Qd @ x + c @ x)
    return LPResult(x, y, z, obj, it, converged)


def qp_box(Q, c: np.ndarray, lower: np.ndarray, upper: np.ndarray,
           ctrl: Optional[LPCtrl] = None) -> np.ndarray:
    """min ½xᵀQx + cᵀx s.t. l ≤ x ≤ u (reference box-constrained QP), via
    the shift x = l + s, s + t = u − l, s,t ≥ 0 in direct form."""
    ctrl = ctrl or LPCtrl()
    n = c.shape[0]
    lower = np.asarray(lower, float)
    upper = np.asarray(upper, float)
    span = upper - lower
    # variables v = [s; t]; Q̂ acts on s only; constraint s + t = span
    Qh = np.zeros((2 * n, 2 * n))
    Qh[:n, :n] = Q.to_dense() if isinstance(Q, SparseMatrix) else np.asarray(Q)
    ch = np.concatenate([c + Qh[:n, :n] @ lower, np.zeros(n)])
    Ah = np.concatenate([np.eye(n), np.eye(n)], axis=1)
    res = qp_direct(Qh, Ah, span, ch, ctrl)
    return lower + res.x[:n]
