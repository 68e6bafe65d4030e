"""Second-order-cone programming (reference MISSING tier; API spec from
``examples/interface/SOCP_trivial.py`` / ``SOCAtom.py`` — Jordan-algebra
atoms over a product of Lorentz cones given by ``orders``/``firstInds``).

  affine form:  min cᵀx  s.t.  A·x = b,  G·x + s = h,  s ∈ K
  K = K₁ × ... × K_r, each K_i = {(s₀, s̄) : s₀ ≥ ‖s̄‖}

Solver: infeasible primal-dual path following on the self-scaled barrier
F(s) = −Σ log(s₀² − ‖s̄‖²), Newton steps on the perturbed KKT with the exact
barrier Hessian μ∇²F(s) (quasi-definite augmented system, LU + refinement).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np
import scipy.linalg as sla

from ..sparse.csr import SparseMatrix
from .lp import LPCtrl, LPResult


# --------------------------------------------------------------------------
# Jordan-algebra / SOC atoms (reference SOCAtom.py surface)
# --------------------------------------------------------------------------

class Cones:
    """Product of Lorentz cones described by member orders (reference
    ``orders``/``firstInds`` vectors)."""

    def __init__(self, orders: Sequence[int]):
        self.orders = tuple(int(o) for o in orders)
        self.first = np.cumsum([0] + list(self.orders[:-1]))
        self.dim = int(sum(self.orders))

    def blocks(self, s: np.ndarray) -> List[np.ndarray]:
        return [s[f:f + o] for f, o in zip(self.first, self.orders)]


def soc_dets(s: np.ndarray, cones: Cones) -> np.ndarray:
    """det(s_i) = s₀² − ‖s̄‖² per cone (reference ``SOCDets``)."""
    return np.array([b[0] ** 2 - b[1:] @ b[1:] for b in cones.blocks(s)])


def soc_identity(cones: Cones) -> np.ndarray:
    e = np.zeros(cones.dim)
    e[cones.first] = 1.0
    return e


def soc_apply(x: np.ndarray, y: np.ndarray, cones: Cones) -> np.ndarray:
    """Jordan product x∘y per cone (reference ``SOCApply``)."""
    out = np.zeros(cones.dim)
    for f, o in zip(cones.first, cones.orders):
        xb, yb = x[f:f + o], y[f:f + o]
        out[f] = xb @ yb
        out[f + 1:f + o] = xb[0] * yb[1:] + yb[0] * xb[1:]
    return out


def soc_inverse(x: np.ndarray, cones: Cones) -> np.ndarray:
    """Jordan inverse per cone."""
    out = np.zeros(cones.dim)
    for f, o in zip(cones.first, cones.orders):
        xb = x[f:f + o]
        det = xb[0] ** 2 - xb[1:] @ xb[1:]
        out[f] = xb[0] / det
        out[f + 1:f + o] = -xb[1:] / det
    return out


def soc_min_eig(s: np.ndarray, cones: Cones) -> float:
    """min over cones of λ_min(s_i) = s₀ − ‖s̄‖ (reference ``SOCMinEig``)."""
    return min(b[0] - np.linalg.norm(b[1:]) for b in cones.blocks(s))


def in_cone(s: np.ndarray, cones: Cones, margin: float = 0.0) -> bool:
    return soc_min_eig(s, cones) > margin


def max_step(s: np.ndarray, ds: np.ndarray, cones: Cones,
             tau: float = 0.995) -> float:
    """Largest α ≤ 1 with s + α·ds ∈ K (fraction-to-boundary)."""
    lo, hi = 0.0, 1.0
    if in_cone(s + ds, cones):
        return 1.0
    for _ in range(50):
        mid = (lo + hi) / 2
        if in_cone(s + mid * ds, cones):
            lo = mid
        else:
            hi = mid
    return tau * lo


def _barrier_hessian(s: np.ndarray, cones: Cones) -> np.ndarray:
    """∇²F(s) for F = −Σ log det(s_i): block-diagonal with blocks
    (2/det²)(J s)(J s)ᵀ − (... ) standard: H = (2/det) * (2/det (Js)(Js)ᵀ·det − J)…
    Exact: ∇F = −2 Js/det;  ∇²F = (4/det²)(Js)(Js)ᵀ − (2/det)J."""
    H = np.zeros((cones.dim, cones.dim))
    for f, o in zip(cones.first, cones.orders):
        sb = s[f:f + o]
        det = sb[0] ** 2 - sb[1:] @ sb[1:]
        J = -np.eye(o)
        J[0, 0] = 1.0
        Js = J @ sb
        H[f:f + o, f:f + o] = (4.0 / det ** 2) * np.outer(Js, Js) \
            - (2.0 / det) * J
    return H


def _barrier_grad(s: np.ndarray, cones: Cones) -> np.ndarray:
    g = np.zeros(cones.dim)
    for f, o in zip(cones.first, cones.orders):
        sb = s[f:f + o]
        det = sb[0] ** 2 - sb[1:] @ sb[1:]
        g[f] = -2.0 * sb[0] / det
        g[f + 1:f + o] = 2.0 * sb[1:] / det
    return g


@dataclasses.dataclass
class SOCPResult:
    x: np.ndarray
    y: np.ndarray
    z: np.ndarray
    s: np.ndarray
    objective: float
    iterations: int
    converged: bool


def socp_affine(A, b: np.ndarray, G, h: np.ndarray, c: np.ndarray,
                cones: Cones, ctrl: Optional[LPCtrl] = None) -> SOCPResult:
    """min cᵀx s.t. Ax = b, Gx + s = h, s ∈ K (reference ``SOCPAffine``)."""
    ctrl = ctrl or LPCtrl()
    Ad = A.to_dense() if isinstance(A, SparseMatrix) else np.asarray(A)
    Gd = G.to_dense() if isinstance(G, SparseMatrix) else np.asarray(G)
    m, n = Ad.shape if Ad.size else (0, c.shape[0])
    k = cones.dim
    e = soc_identity(cones)
    r_cones = len(cones.orders)

    x = np.zeros(n)
    s = e.copy()
    z = e.copy()
    y = np.zeros(m)

    it = 0
    converged = False
    for it in range(1, ctrl.max_iters + 1):
        rb = b - Ad @ x if m else np.zeros(0)
        rh = h - Gd @ x - s
        rc = -(c + (Ad.T @ y if m else 0) + Gd.T @ z)
        mu = (s @ z) / r_cones
        gap = s @ z
        pobj = c @ x
        if (np.linalg.norm(rb) < ctrl.tol * (1 + np.linalg.norm(b))
                and np.linalg.norm(rh) < ctrl.tol * (1 + np.linalg.norm(h))
                and np.linalg.norm(rc) < ctrl.tol * (1 + np.linalg.norm(c))
                and gap < ctrl.tol * (1 + abs(pobj))):
            converged = True
            break

        sigma = 0.25
        H = _barrier_hessian(s, cones)
        gF = _barrier_grad(s, cones)
        # central-path Newton: z + σμ∇F(s) ≈ 0 linearized:
        #   dz − σμ H ds = −(z + σμ gF)
        # with A dx = rb, G dx + ds = rh, Aᵀdy + Gᵀdz = rc
        # eliminate ds = rh − G dx, dz = −(z + σμ gF) + σμ H (rh − G dx):
        #   Aᵀ dy − σμ GᵀH G dx = rc + Gᵀ(z + σμ gF) − σμ GᵀH rh
        muH = sigma * mu * H
        K = np.zeros((n + m, n + m))
        K[:n, :n] = Gd.T @ muH @ Gd + ctrl.reg * np.eye(n)
        if m:
            K[:n, n:] = Ad.T
            K[n:, :n] = Ad
            K[n:, n:] = -ctrl.reg * np.eye(m)
        rmu = z + sigma * mu * gF
        rhs1 = rc + Gd.T @ rmu + Gd.T @ (muH @ rh)
        rhs = np.concatenate([rhs1, rb]) if m else rhs1
        sol = np.linalg.solve(K, rhs) if m else np.linalg.solve(K[:n, :n],
                                                                rhs)
        dx = sol[:n]
        dy = sol[n:] if m else np.zeros(0)
        ds = rh - Gd @ dx
        dz = -rmu - muH @ ds

        ap = max_step(s, ds, cones, ctrl.tau)
        ad = max_step(z, dz, cones, ctrl.tau)
        alpha = min(ap, ad, 1.0)
        x = x + alpha * dx
        y = y + alpha * dy
        s = s + alpha * ds
        z = z + alpha * dz
        if ctrl.verbose:
            print(f"  it {it}: mu={mu:.3e} gap={gap:.3e} obj={pobj:.8g} "
                  f"alpha={alpha:.3f}")

    return SOCPResult(x, y, z, s, float(c @ x), it, converged)
