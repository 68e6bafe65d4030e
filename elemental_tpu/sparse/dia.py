"""DIA (diagonal) sparse format — the TPU-native layout for banded/stencil
matrices (PDE Laplacians/Helmholtz, the BASELINE SpMV configs).

Rationale: XLA's gather lowers to a scalar loop on TPU, capping ELL/CSR SpMV
at ~0.1% of HBM speed-of-light.  A DIA SpMV is Σ_d diag_d ∘ shift(x, off_d):
pure contiguous streams + static slices, which XLA fuses into one
HBM-bandwidth-bound pass — the ~SoL path.  ``best_device_format`` picks DIA
when a small number of diagonals covers the matrix, ELL otherwise.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .csr import SparseMatrix


@dataclasses.dataclass
class DIAMatrix:
    """diags[d, i] holds A[i, i + offsets[d]] (row-aligned storage)."""

    height: int
    width: int
    offsets: Tuple[int, ...]
    diags: np.ndarray           # (ndiag, height) — host or device array
    nnz: int

    def device(self, device=None, dtype=None) -> "DIAMatrix":
        d = np.asarray(self.diags)
        if dtype is not None:
            d = d.astype(dtype)
        return dataclasses.replace(self, diags=jax.device_put(d, device))

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        n = self.height
        offs = self.offsets
        lo = -min(0, min(offs))
        hi = max(0, max(offs)) + max(0, self.width - n)
        xp = jnp.pad(x, (lo, max(hi, 0)))
        y = jnp.zeros((n,), x.dtype)
        for d, off in enumerate(offs):
            y = y + self.diags[d] * jax.lax.dynamic_slice_in_dim(
                xp, lo + off, n, 0)
        return y

    def matmat(self, X: jnp.ndarray) -> jnp.ndarray:
        n = self.height
        offs = self.offsets
        lo = -min(0, min(offs))
        hi = max(0, max(offs)) + max(0, self.width - n)
        xp = jnp.pad(X, ((lo, max(hi, 0)), (0, 0)))
        y = jnp.zeros((n, X.shape[1]), X.dtype)
        for d, off in enumerate(offs):
            y = y + self.diags[d][:, None] * jax.lax.dynamic_slice_in_dim(
                xp, lo + off, n, 0)
        return y


def to_dia(A: SparseMatrix, max_diags: Optional[int] = None
           ) -> Optional[DIAMatrix]:
    """Convert CSR → DIA; returns None when the diagonal count is too high
    for DIA to be profitable (fill would exceed ~4× nnz)."""
    rows = np.repeat(np.arange(A.height), A.row_nnz())
    offsets = A.colind - rows
    uniq = np.unique(offsets)
    if max_diags is None:
        max_diags = max(8, int(4 * A.nnz / max(A.height, 1)))
    if uniq.shape[0] > max_diags:
        return None
    diags = np.zeros((uniq.shape[0], A.height), A.vals.dtype)
    dmap = {int(o): i for i, o in enumerate(uniq)}
    didx = np.array([dmap[int(o)] for o in offsets])
    diags[didx, rows] = A.vals
    # keep diags on host: device placement is explicit (``.device()``) so
    # symbolic conversions never bounce through a (possibly remote) default
    # accelerator.
    return DIAMatrix(A.height, A.width, tuple(int(o) for o in uniq),
                     diags, A.nnz)


def best_device_format(A: SparseMatrix):
    """Format heuristic: DIA for stencil-like structure, ELL otherwise
    (the analog of the reference's per-kernel algorithm heuristics)."""
    dia = to_dia(A)
    if dia is not None:
        return dia
    return A.device_ell()
