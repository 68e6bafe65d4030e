"""Interior-point linear programming (reference MISSING tier: spec from
``examples/interface/LPDirect.py:70-115`` — ``LPDirectCtrl`` with approach ∈
{LP_MEHROTRA, LP_IPF} — and the netlib MPS data it ships).

Forms (reference naming):
  * direct:  min cᵀx  s.t.  A·x = b,  x ≥ 0
  * affine:  min cᵀx  s.t.  A·x = b,  G·x + s = h,  s ≥ 0

Per-iteration pipeline mirrors SURVEY §3.6: equilibrate → KKT solve
(normal equations A·D²·Aᵀ via the fixed-structure Galerkin plan + sparse
multifrontal Cholesky with ``ChangeNonzeroValues`` reuse, or dense Cholesky
for small instances; affine form uses the regularized quasi-definite
augmented KKT through the multifrontal LDL) → Mehrotra predictor-corrector
(or fixed-σ IPF) → fraction-to-boundary step."""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from ..sparse.csr import SparseMatrix
from ..sparse.matmul import galerkin_plan
from ..sparse_direct import SparseLDLFactorization
from ..sparse.io import MPSData


class Approach:
    MEHROTRA = "mehrotra"
    IPF = "ipf"


@dataclasses.dataclass
class LPCtrl:
    """Reference ``LPDirectCtrl`` analog."""
    approach: str = Approach.MEHROTRA
    max_iters: int = 100
    tol: float = 1e-8
    tau: float = 0.995          # fraction-to-boundary
    sigma_ipf: float = 0.3      # centering for IPF
    backend: str = "auto"       # dense | sparse | auto
    reg: float = 1e-9
    verbose: bool = False


@dataclasses.dataclass
class LPResult:
    x: np.ndarray
    y: np.ndarray
    z: np.ndarray
    objective: float
    iterations: int
    converged: bool
    s: Optional[np.ndarray] = None  # affine-form slack


def _normal_solver(A: SparseMatrix, ctrl: LPCtrl):
    """Factory: d ↦ solver for (A·diag(d)·Aᵀ + δI)·u = r."""
    m, n = A.shape
    dense = ctrl.backend == "dense" or (ctrl.backend == "auto" and m <= 300)
    if dense:
        Ad = A.to_dense()

        def solve(d, rhs_list):
            M = (Ad * d[None, :]) @ Ad.T
            # small static regularization (rank-deficient netlib rows) + LU
            # + one refinement step to recover accuracy near convergence
            delta = ctrl.reg * max(1.0, float(np.diag(M).max()))
            Mr = M + delta * np.eye(m)
            outs = []
            for r in rhs_list:
                u = np.linalg.solve(Mr, r)
                for _ in range(4):  # refine away the δ-regularization error
                    u = u + np.linalg.solve(Mr, r - M @ u)
                outs.append(u)
            return outs

        return solve

    plan = galerkin_plan(A)
    fact = SparseLDLFactorization()
    struct = plan.c_struct.update_diagonal(np.zeros(m))  # ensure diagonal
    fact.initialize(struct)
    a_dev = jnp.asarray(A.vals)

    def solve(d, rhs_list):
        vals = np.asarray(plan.numeric(a_dev, jnp.asarray(d)))
        M = plan.c_struct.change_nonzero_values(vals)
        M = M.update_diagonal(np.full(m, ctrl.reg))
        fact.A = fact.A.change_nonzero_values(
            _match_values(fact.A, M))
        fact.factor()
        return [np.asarray(fact.solve(jnp.asarray(r))) for r in rhs_list]

    return solve


def _match_values(target: SparseMatrix, src: SparseMatrix) -> np.ndarray:
    """Values of ``src`` aligned to ``target``'s (superset) pattern."""
    tr = np.repeat(np.arange(target.height), target.row_nnz())
    sr = np.repeat(np.arange(src.height), src.row_nnz())
    tkey = tr * target.width + target.colind
    skey = sr * src.width + src.colind
    out = np.zeros(target.nnz, src.vals.dtype)
    pos = np.searchsorted(tkey, skey)
    out[pos] = src.vals
    return out


def _steplen(v: np.ndarray, dv: np.ndarray, tau: float) -> float:
    neg = dv < 0
    if not neg.any():
        return 1.0
    return float(min(1.0, tau * np.min(-v[neg] / dv[neg])))


def lp_direct(A: SparseMatrix, b: np.ndarray, c: np.ndarray,
              ctrl: Optional[LPCtrl] = None) -> LPResult:
    """Solve min cᵀx s.t. Ax = b, x ≥ 0 (reference ``LPDirect``)."""
    ctrl = ctrl or LPCtrl()
    m, n = A.shape
    # Ruiz equilibration (reference: equilibrate → KKT, SURVEY §3.6):
    # Â = R·A·S, x̂ = S⁻¹x, ŷ = R⁻¹y, ẑ = S·z
    Ad0 = A.to_dense()
    r = np.ones(m)
    s = np.ones(n)
    Asc = Ad0.copy()
    for _ in range(10):
        rr = np.sqrt(np.maximum(np.abs(Asc).max(axis=1), 1e-300))
        Asc /= rr[:, None]
        r *= rr
        ss = np.sqrt(np.maximum(np.abs(Asc).max(axis=0), 1e-300))
        Asc /= ss[None, :]
        s *= ss
    b = b / r
    c = c / s
    A = SparseMatrix.from_dense(Asc, tol=0.0)
    Ad = Asc
    solve_ne = _normal_solver(A, ctrl)

    # Mehrotra's starting point: min-norm primal/dual least-squares iterates
    # shifted into the positive orthant
    ones_d = np.ones(n)
    (u1, u2) = solve_ne(ones_d, [b, Ad @ c])
    x_t = Ad.T @ u1
    y = u2
    z_t = c - Ad.T @ y
    dx = max(-1.5 * x_t.min(), 0.0)
    dz = max(-1.5 * z_t.min(), 0.0)
    x_h, z_h = x_t + dx + 1e-10, z_t + dz + 1e-10
    xs = x_h @ z_h
    x = x_h + 0.5 * xs / max(z_h.sum(), 1e-10)
    z = z_h + 0.5 * xs / max(x_h.sum(), 1e-10)
    x = np.maximum(x, 1e-8)
    z = np.maximum(z, 1e-8)

    bnorm, cnorm = np.linalg.norm(b) + 1, np.linalg.norm(c) + 1
    it = 0
    converged = False
    for it in range(1, ctrl.max_iters + 1):
        rb = b - Ad @ x
        rc = c - Ad.T @ y - z
        mu = x @ z / n
        gap = abs(c @ x - b @ y) / (1 + abs(c @ x))
        if (np.linalg.norm(rb) / bnorm < ctrl.tol
                and np.linalg.norm(rc) / cnorm < ctrl.tol
                and gap < ctrl.tol):
            converged = True
            break
        # augmented quasi-definite KKT (the reference's RegularizedLDL route;
        # numerically far better conditioned than the normal equations):
        # [[Θ, −Aᵀ],[A, δI]]·[dx; dy] = [rmu/x − rc_neg; rb], Θ = z/x
        theta = z / x
        K = np.zeros((n + m, n + m))
        K[:n, :n] = np.diag(theta)
        K[:n, n:] = -Ad.T
        K[n:, :n] = Ad
        # absolute δ (A is Ruiz-equilibrated, so |A| ≈ 1): LU with partial
        # pivoting handles the quasi-definite system; refinement removes δ
        K[n:, n:] = -ctrl.reg * np.eye(m)
        import scipy.linalg as sla
        lu_piv = sla.lu_factor(K)

        def directions(rmu):
            rhs = np.concatenate([rmu / x - rc, rb])
            sol = sla.lu_solve(lu_piv, rhs)
            for _ in range(2):  # refine against the unregularized KKT
                r2 = rhs - np.concatenate([
                    theta * sol[:n] - Ad.T @ sol[n:], Ad @ sol[:n]])
                sol = sol + sla.lu_solve(lu_piv, r2)
            dx, dy = sol[:n], sol[n:]
            dz = rc - Ad.T @ dy
            return dx, dy, dz

        if ctrl.approach == Approach.MEHROTRA:
            dx_a, dy_a, dz_a = directions(-x * z)
            ap = _steplen(x, dx_a, 1.0)
            ad = _steplen(z, dz_a, 1.0)
            mu_aff = ((x + ap * dx_a) @ (z + ad * dz_a)) / n
            sigma = (mu_aff / mu) ** 3 if mu > 0 else 0.0
            rmu = sigma * mu - x * z - dx_a * dz_a
            dx, dy, dz = directions(rmu)
        else:  # IPF
            rmu = ctrl.sigma_ipf * mu - x * z
            dx, dy, dz = directions(rmu)

        ap = _steplen(x, dx, ctrl.tau)
        ad = _steplen(z, dz, ctrl.tau)
        # infeasible-IPM neighborhood safeguard: do not let complementarity
        # collapse while the primal residual is still large — back the steps
        # off until μ₊ stays coupled to ‖rb₊‖ (N_{−∞}-style condition)
        rbn = np.linalg.norm(rb) / bnorm
        if rbn > 10 * ctrl.tol:
            for _ in range(40):
                xn, zn = x + ap * dx, z + ad * dz
                mun = xn @ zn / n
                rbn_new = np.linalg.norm(b - Ad @ xn) / bnorm
                if mun >= 1e-5 * rbn_new or rbn_new <= 10 * ctrl.tol:
                    break
                ap *= 0.7
                ad *= 0.7
        x = x + ap * dx
        y = y + ad * dy
        z = z + ad * dz
        if ctrl.verbose:
            print(f"  it {it}: mu={mu:.3e} rb={np.linalg.norm(rb):.2e} "
                  f"rc={np.linalg.norm(rc):.2e} obj={c @ x:.8g} "
                  f"ap={ap:.2f} ad={ad:.2f}")

    # unscale: x = S·x̂, y = R·ŷ? (ŷ solves scaled dual: y = r∘ŷ), z = ẑ/s
    x_out = x / s
    y_out = y / r
    z_out = z * s
    return LPResult(x_out, y_out, z_out, float(c @ x), it, converged)


def lp_affine(A: SparseMatrix, b: np.ndarray, G: SparseMatrix,
              h: np.ndarray, c: np.ndarray,
              ctrl: Optional[LPCtrl] = None) -> LPResult:
    """Solve min cᵀx s.t. Ax = b, Gx + s = h, s ≥ 0 (reference ``LPAffine``)
    via the regularized quasi-definite augmented KKT
    [[γI, Aᵀ, Gᵀ], [A, −δI, 0], [G, 0, −(S/Z+δ)I]] factored with the
    multifrontal LDL (pattern fixed across iterations)."""
    ctrl = ctrl or LPCtrl()
    m, n = A.shape
    k = G.shape[0]
    Ad, Gd = A.to_dense(), G.to_dense()

    x = np.zeros(n)
    y = np.zeros(m)
    s = np.maximum(h - Gd @ x, 1.0)
    z = np.ones(k)

    # KKT pattern (dense fallback for small; sparse LDL otherwise)
    use_sparse = ctrl.backend == "sparse" or (
        ctrl.backend == "auto" and n + m + k > 400)
    kkt_fact = SparseLDLFactorization() if use_sparse else None
    kkt_pat: Optional[SparseMatrix] = None

    def kkt_solve(w, r1, r2, r3):
        gamma, delta = ctrl.reg, ctrl.reg
        nonlocal kkt_pat
        K = np.zeros((n + m + k, n + m + k))
        K[:n, :n] = gamma * np.eye(n)
        K[:n, n:n + m] = Ad.T
        K[:n, n + m:] = Gd.T
        K[n:n + m, :n] = Ad
        K[n:n + m, n:n + m] = -delta * np.eye(m)
        K[n + m:, :n] = Gd
        K[n + m:, n + m:] = -np.diag(w + delta)
        rhs = np.concatenate([r1, r2, r3])
        if kkt_fact is not None:
            Ks = SparseMatrix.from_dense(K)
            if kkt_pat is None or Ks.nnz != kkt_pat.nnz:
                kkt_pat = Ks
                kkt_fact.initialize(Ks)
                kkt_fact.factor()
            else:
                kkt_fact.change_nonzero_values(Ks.vals)
            sol = np.asarray(kkt_fact.solve(jnp.asarray(rhs)))
        else:
            sol = np.linalg.solve(K, rhs)
        return sol[:n], sol[n:n + m], sol[n + m:]

    it = 0
    converged = False
    for it in range(1, ctrl.max_iters + 1):
        rb = b - Ad @ x
        rh = h - Gd @ x - s
        rc = -(c + Ad.T @ y + Gd.T @ z)
        mu = s @ z / k
        pobj = c @ x
        dobj = -(b @ y + h @ z)
        gap = abs(pobj - dobj) / (1 + abs(pobj))
        if (np.linalg.norm(rb) < ctrl.tol * (1 + np.linalg.norm(b))
                and np.linalg.norm(rh) < ctrl.tol * (1 + np.linalg.norm(h))
                and np.linalg.norm(rc) < ctrl.tol * (1 + np.linalg.norm(c))
                and (gap < ctrl.tol or mu < ctrl.tol)):
            converged = True
            break

        w = s / z

        def directions(rmu):
            # symmetric quasi-definite KKT rows:
            #   Aᵀdy + Gᵀdz = rc ; A dx = rb ; G dx − W dz = rh − rmu/z
            r3 = rh - rmu / z
            dx, dy, dz = kkt_solve(w, rc, rb, r3)
            ds = (rmu - s * dz) / z
            return dx, dy, dz, ds

        if ctrl.approach == Approach.MEHROTRA:
            dxa, dya, dza, dsa = directions(-s * z)
            ap = _steplen(s, dsa, 1.0)
            ad = _steplen(z, dza, 1.0)
            mu_aff = ((s + ap * dsa) @ (z + ad * dza)) / k
            sigma = (mu_aff / mu) ** 3 if mu > 0 else 0.0
            dx, dy, dz, ds = directions(sigma * mu - s * z - dsa * dza)
        else:
            dx, dy, dz, ds = directions(ctrl.sigma_ipf * mu - s * z)

        ap = _steplen(s, ds, ctrl.tau)
        ad = _steplen(z, dz, ctrl.tau)
        alpha = min(ap, ad)
        x = x + alpha * dx
        y = y + alpha * dy
        s = s + alpha * ds
        z = z + alpha * dz
        if ctrl.verbose:
            print(f"  it {it}: mu={mu:.3e} obj={c @ x:.8g}")

    return LPResult(x, y, z, float(c @ x), it, converged, s=s)


# --------------------------------------------------------------------------
# General-form (MPS) front end
# --------------------------------------------------------------------------

def mps_to_standard(lp: MPSData
                    ) -> Tuple[SparseMatrix, np.ndarray, np.ndarray, float,
                               Callable[[np.ndarray], np.ndarray]]:
    """General form → standard form (Ax=b, x≥0): shift finite lower bounds,
    split free variables, slack the ≤ rows, row-ify finite upper bounds.
    Returns (A, b, c, obj_shift, recover(x_std) → x_orig)."""
    import scipy.sparse as sp

    n = lp.c.shape[0]
    Aeq = lp.A_eq.to_scipy()
    Ale = lp.A_le.to_scipy()
    lower, upper = lp.lower.copy(), lp.upper.copy()

    # x = xs + l for finite l; free vars (l = −inf) → xp − xm
    finite_l = ~np.isneginf(lower)
    shift = np.where(finite_l, lower, 0.0)
    b_eq = lp.b_eq - Aeq @ shift
    b_le = lp.b_le - Ale @ shift
    ub = np.where(np.isposinf(upper), np.inf, upper - shift)

    free = ~finite_l
    nfree = int(free.sum())
    cols = [sp.eye(n, format="csc")]
    if nfree:
        neg = sp.csc_matrix((-np.ones(nfree), (np.nonzero(free)[0],
                                               np.arange(nfree))),
                            shape=(n, nfree))
        cols.append(neg)
    X = sp.hstack(cols, format="csc")  # x_orig−shift = X @ [xs; xm]

    nvar = X.shape[1]
    c_std = X.T @ lp.c

    # upper bounds become rows: xs_j + u_slack = ub_j
    ub_rows = np.nonzero(np.isfinite(ub))[0]
    nub = len(ub_rows)

    m_eq, m_le = Aeq.shape[0], Ale.shape[0]
    A_top = Aeq @ X
    A_mid = Ale @ X
    blocks = []
    # [Aeq·X   0      0   ]
    # [Ale·X   I_le   0   ]
    # [E_ub    0      I_ub]
    blocks.append(sp.hstack([A_top,
                             sp.csr_matrix((m_eq, m_le)),
                             sp.csr_matrix((m_eq, nub))]))
    if m_le:
        blocks.append(sp.hstack([A_mid, sp.eye(m_le),
                                 sp.csr_matrix((m_le, nub))]))
    if nub:
        E = sp.csr_matrix((np.ones(nub), (np.arange(nub), ub_rows)),
                          shape=(nub, nvar))
        blocks.append(sp.hstack([E, sp.csr_matrix((nub, m_le)),
                                 sp.eye(nub)]))
    A_std = sp.vstack(blocks).tocsr()
    b_std = np.concatenate([b_eq, b_le, ub[ub_rows]])
    c_full = np.concatenate([c_std, np.zeros(m_le + nub)])
    obj_shift = float(lp.c @ shift) + lp.c0

    def recover(x_std: np.ndarray) -> np.ndarray:
        return np.asarray(X @ x_std[:nvar]) + shift

    return (SparseMatrix.from_scipy(A_std), b_std, c_full, obj_shift,
            recover)


def solve_mps(lp: MPSData, ctrl: Optional[LPCtrl] = None
              ) -> Tuple[LPResult, np.ndarray]:
    """End-to-end: general-form MPS → standard form → IPM → recovered x."""
    A, b, c, shift, recover = mps_to_standard(lp)
    res = lp_direct(A, b, c, ctrl)
    res = dataclasses.replace(res, objective=res.objective + shift)
    return res, recover(res.x)
