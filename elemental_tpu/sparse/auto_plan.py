"""Automatic SpMV planning: pick the fastest TPU execution form for a CSR
matrix (the dispatch tier of the reference's sparse ``Multiply``,
``tests/blas_like/Multiply.cpp:19-46``, re-designed around TPU constraints).

TPU gather speeds are wildly layout-dependent: a FLAT 1-D gather
``x[colind]`` + sorted-rows ``segment_sum`` compiles to HBM-bandwidth code
(measured 132 Gnnz/s on a power-law graph, n=2^20, on v5e ≈ speed of light
for 8 B/nnz), while the 2-D-indexed ELL gather ``x[cols_2d]`` drops to a
~0.1 Gnnz/s scalar loop.  The banded/stencil Pallas kernel remains the top
tier (fewer index bytes: ~4 B/nnz, measured 168 Gnnz/s), with RCM
reordering to reach it for scrambled banded matrices (138.7 Gnnz/s); the
flat-CSR form is the fallback that now covers EVERYTHING ELSE at ~SoL.

Dispatch order (``plan_spmv``):

1. ``stencil``      — matrix is already DIA-profitable: halo-panel kernel.
2. ``stencil_rcm``  — square matrix whose RCM reordering is DIA-profitable.
3. ``csr``          — flat gather + segment-sum: unstructured SoL path.

Profitability: the stencil kernel streams one weight plane of ``n`` values
per distinct offset, so its bytes/SpMV ≈ (S+2)·n·itemsize; the CSR path
streams (4 + itemsize) B/nnz.  The stencil tier is taken only when its
stream volume undercuts the CSR fallback (``max_stream_ratio`` bounds the
padding waste).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax.numpy as jnp

from .csr import CSRDevice, SparseMatrix
from .dia import to_dia


@dataclasses.dataclass
class SpMVPlan:
    """Executable SpMV plan.  ``matvec`` operates in *plan space*: when
    ``perm`` is set, the operator computed is P·A·Pᵀ; use
    ``to_plan_space``/``from_plan_space`` at the boundary (host-side
    gathers — one-off per solve, never in the hot loop)."""

    kind: str                      # 'stencil' | 'stencil_rcm' | 'csr'
    height: int
    width: int
    nnz: int
    stencil: Optional[object] = None       # kernels.spmv.StencilPlan
    csr: Optional[CSRDevice] = None
    perm: Optional[np.ndarray] = None      # plan index -> original index
    iperm: Optional[np.ndarray] = None

    def device(self, device=None, dtype=None) -> "SpMVPlan":
        if self.stencil is not None:
            return dataclasses.replace(
                self, stencil=self.stencil.device(device, dtype))
        csr = self.csr
        if device is not None or dtype is not None:
            import jax
            vals = csr.vals if dtype is None else csr.vals.astype(dtype)
            csr = CSRDevice(csr.height, csr.width,
                            jax.device_put(csr.rows, device),
                            jax.device_put(csr.colind, device),
                            jax.device_put(vals, device))
        return dataclasses.replace(self, csr=csr)

    # -- permutation boundary (host numpy; one-off per solve) ------------
    def to_plan_space(self, x: np.ndarray) -> np.ndarray:
        return x if self.perm is None else np.asarray(x)[self.perm]

    def from_plan_space(self, y: np.ndarray) -> np.ndarray:
        return y if self.perm is None else np.asarray(y)[self.iperm]

    # -- execution (jit-safe) ---------------------------------------------
    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.stencil is not None:
            from ..kernels.spmv import stencil_spmv
            return stencil_spmv(self.stencil, x)
        return self.csr.matvec(x)

    def jitted_matvec(self):
        """Compiled y = A·x with the plan data passed as jit ARGUMENTS.
        Closing over the index arrays would embed them as jaxpr constants,
        which drops XLA's TPU gather to a ~0.06 Gnnz/s scalar path (vs ~136
        as arguments; measured on v5e) — always prefer this to
        ``jax.jit(plan.matvec)``."""
        import jax
        if self.stencil is not None:
            from ..kernels.spmv import stencil_spmv
            f = jax.jit(stencil_spmv)
            st = self.stencil
            return lambda x: f(st, x)
        f = jax.jit(lambda csr, x: csr.matvec(x))
        csr = self.csr
        return lambda x: f(csr, x)

    @property
    def stream_bytes(self) -> int:
        """Approximate HBM bytes per SpMV (roofline accounting)."""
        if self.stencil is not None:
            s = len(self.stencil.shifts)
            item = np.asarray(self.stencil.weights).dtype.itemsize
            return (s + 2) * self.stencil.rows * self.stencil.cols * item
        item = np.asarray(self.csr.vals).dtype.itemsize
        return self.nnz * (8 + item) + 2 * self.height * item


# pytree: plans pass through jit as ARGUMENTS (see core/statics.py)
from ..core.statics import register_plan_pytree  # noqa: E402

register_plan_pytree(SpMVPlan, ("stencil", "csr"))


def _permuted(A: SparseMatrix, p: np.ndarray) -> SparseMatrix:
    sp = A.to_scipy().tocsr()
    return SparseMatrix.from_scipy(sp[p][:, p])


def plan_spmv(A: SparseMatrix, cols: int = 1024, try_rcm: bool = True,
              max_stream_ratio: float = 16.0,
              max_halo: int = 256) -> SpMVPlan:
    """Plan y = A·x for TPU execution (see module docstring)."""
    from ..kernels.spmv import plan_stencil_spmv

    n = A.height
    max_diags = max(8, int(max_stream_ratio * A.nnz / max(n, 1)))

    def try_stencil(M: SparseMatrix):
        dia = to_dia(M, max_diags=max_diags)
        if dia is None:
            return None
        return plan_stencil_spmv(dia.offsets, np.asarray(dia.diags),
                                 M.height, cols=cols, max_halo=max_halo)

    st = try_stencil(A)
    if st is not None:
        return SpMVPlan("stencil", A.height, A.width, A.nnz, stencil=st)

    if try_rcm and A.height == A.width and n > 1:
        from ..sparse_direct.ordering import reverse_cuthill_mckee
        p = reverse_cuthill_mckee(A)
        Ap = _permuted(A, p)
        st = try_stencil(Ap)
        if st is not None:
            ip = np.empty_like(p)
            ip[p] = np.arange(n)
            return SpMVPlan("stencil_rcm", A.height, A.width, A.nnz,
                            stencil=st, perm=p, iperm=ip)

    return SpMVPlan("csr", A.height, A.width, A.nnz, csr=A.device_csr())
