"""Automatic SpMV planning: pick the fastest TPU execution form for a CSR
matrix (the dispatch tier of the reference's sparse ``Multiply``,
``tests/blas_like/Multiply.cpp:19-46``, re-designed around TPU constraints).

TPU has no vector gather: XLA lowers ``x[cols]`` to a scalar loop, measured
at ~0.05 Gnnz/s on v5e — a ~2400x cliff below the halo-panel stencil kernel
(121 Gnnz/s, ~82% HBM speed-of-light).  The TPU-native route for a matrix
that is not stencil-shaped as given is the classical banded-solver one:
reduce bandwidth with a symmetric RCM reordering, then run the banded
(DIA/stencil) kernel in the permuted space.  The plan carries the
permutation; solves (CG etc.) run entirely in plan space with one
permutation each way at the boundary.

Measured on v5e (n=2^20, 9-diagonal banded scrambled by a random symmetric
permutation): ``stencil_rcm`` runs at 138.7 Gnnz/s (678 GB/s streamed ≈ 83%
HBM SoL) vs 0.05 Gnnz/s for the same matrix on the ELL gather path.

Dispatch order (``plan_spmv``):

1. ``stencil``      — matrix is already DIA-profitable: halo-panel kernel.
2. ``stencil_rcm``  — square matrix whose RCM reordering is DIA-profitable.
3. ``ell``          — fallback (gather path; correct everywhere, slow on
                      TPU — the plan records this in ``kind`` so callers
                      can warn or reroute to CPU).

Profitability: the stencil kernel streams one weight plane of ``n`` values
per distinct offset, so its bytes/SpMV ≈ (S+2)·n·itemsize.  Even a 16x
stream overhead beats the gather cliff by two orders of magnitude, hence
the generous default ``max_stream_ratio``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax.numpy as jnp

from .csr import SparseMatrix, ELLMatrix
from .dia import to_dia


@dataclasses.dataclass
class SpMVPlan:
    """Executable SpMV plan.  ``matvec`` operates in *plan space*: when
    ``perm`` is set, the operator computed is P·A·Pᵀ; use
    ``to_plan_space``/``from_plan_space`` at the boundary (host-side
    gathers — one-off per solve, never in the hot loop)."""

    kind: str                      # 'stencil' | 'stencil_rcm' | 'ell'
    height: int
    width: int
    nnz: int
    stencil: Optional[object] = None       # kernels.spmv.StencilPlan
    ell: Optional[ELLMatrix] = None
    perm: Optional[np.ndarray] = None      # plan index -> original index
    iperm: Optional[np.ndarray] = None

    def device(self, device=None, dtype=None) -> "SpMVPlan":
        if self.stencil is not None:
            return dataclasses.replace(
                self, stencil=self.stencil.device(device, dtype))
        ell = self.ell
        if device is not None or dtype is not None:
            import jax
            vals = ell.vals if dtype is None else ell.vals.astype(dtype)
            ell = ELLMatrix(ell.height, ell.width,
                            jax.device_put(ell.cols, device),
                            jax.device_put(vals, device), ell.dropped)
        return dataclasses.replace(self, ell=ell)

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
        return self.ell.matvec(x)

    @property
    def stream_bytes(self) -> int:
        """Approximate HBM bytes per SpMV (roofline accounting)."""
        if self.stencil is not None:
            s = len(self.stencil.shifts)
            item = np.asarray(self.stencil.weights).dtype.itemsize
            return (s + 2) * self.stencil.rows * self.stencil.cols * item
        item = np.asarray(self.ell.vals).dtype.itemsize
        return self.ell.cols.size * (4 + item) + 2 * self.height * item


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

    return SpMVPlan("ell", A.height, A.width, A.nnz, ell=A.device_ell())
