"""PDE matrix generators (reference ``src/matrices/deterministic/pde``:
Laplacian / Helmholtz / HelmholtzPML in 1/2/3-D — dense overloads in-tree at
``Laplacian.cpp:17-56``; the sparse overloads are the MISSING tier required by
``examples/lapack_like/Helmholtz.cpp`` and ``tests/lapack_like/SparseLDL.cpp``
(the analytic 3D-Laplacian solver scenario)).

Convention matches the reference: the (negative) Laplacian is discretized
with the standard 2nd-order stencil on a uniform grid over (0,1)^d with
Dirichlet boundaries, scaled by 1/h² so the operator is positive definite;
Helmholtz subtracts the shift ω² (``Helmholtz(A, n, shift)`` builds
−Δ − ω²)."""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

from ..sparse.csr import SparseMatrix


def _grid_indices(dims: Tuple[int, ...]) -> np.ndarray:
    return np.arange(int(np.prod(dims))).reshape(dims)


def _sparse_stencil(dims: Tuple[int, ...], diag_val, off_val) -> SparseMatrix:
    n = int(np.prod(dims))
    idx = _grid_indices(dims)
    rows = [np.arange(n)]
    cols = [np.arange(n)]
    vals = [np.full(n, diag_val)]
    for axis in range(len(dims)):
        sl_lo = [slice(None)] * len(dims)
        sl_hi = [slice(None)] * len(dims)
        sl_lo[axis] = slice(0, -1)
        sl_hi[axis] = slice(1, None)
        a = idx[tuple(sl_lo)].ravel()
        b = idx[tuple(sl_hi)].ravel()
        rows.extend([a, b])
        cols.extend([b, a])
        vals.extend([np.full(a.shape[0], off_val)] * 2)
    return SparseMatrix.from_coo(n, n, np.concatenate(rows),
                                 np.concatenate(cols), np.concatenate(vals),
                                 sum_duplicates=True)


def _laplacian_sparse(dims: Tuple[int, ...], shift: float = 0.0,
                      scaled: bool = True) -> SparseMatrix:
    d = len(dims)
    h2inv = float((dims[0] + 1) ** 2) if scaled else 1.0
    diag = 2.0 * d * h2inv - shift
    off = -1.0 * h2inv
    return _sparse_stencil(dims, diag, off)


# ---- sparse overloads (the MISSING reference tier) ----

def sparse_laplacian_1d(n1: int, scaled: bool = True) -> SparseMatrix:
    return _laplacian_sparse((n1,), scaled=scaled)


def sparse_laplacian_2d(n1: int, n2: int, scaled: bool = True) -> SparseMatrix:
    return _laplacian_sparse((n1, n2), scaled=scaled)


def sparse_laplacian_3d(n1: int, n2: int, n3: int,
                        scaled: bool = True) -> SparseMatrix:
    return _laplacian_sparse((n1, n2, n3), scaled=scaled)


def sparse_helmholtz_2d(n1: int, n2: int, shift: float) -> SparseMatrix:
    return _laplacian_sparse((n1, n2), shift=shift)


def sparse_helmholtz_3d(n1: int, n2: int, n3: int,
                        shift: float) -> SparseMatrix:
    return _laplacian_sparse((n1, n2, n3), shift=shift)


# ---- dense overloads (reference in-tree tier) ----

def laplacian_1d(n1: int, scaled: bool = True):
    return jnp.asarray(sparse_laplacian_1d(n1, scaled).to_dense())


def laplacian_2d(n1: int, n2: int, scaled: bool = True):
    return jnp.asarray(sparse_laplacian_2d(n1, n2, scaled).to_dense())


def laplacian_3d(n1: int, n2: int, n3: int, scaled: bool = True):
    return jnp.asarray(sparse_laplacian_3d(n1, n2, n3, scaled).to_dense())


def helmholtz_1d(n1: int, shift: float):
    return jnp.asarray(_laplacian_sparse((n1,), shift).to_dense())


def helmholtz_2d(n1: int, n2: int, shift: float):
    return jnp.asarray(sparse_helmholtz_2d(n1, n2, shift).to_dense())


def helmholtz_3d(n1: int, n2: int, n3: int, shift: float):
    return jnp.asarray(sparse_helmholtz_3d(n1, n2, n3, shift).to_dense())


def helmholtz_pml_2d(n1: int, n2: int, omega: float, pml_width: int = 5,
                     sigma: float = 1.5):
    """2-D Helmholtz with a simple PML absorbing layer (reference
    ``HelmholtzPML``): complex stretched-coordinate stencil."""
    nx, ny = n1, n2
    n = nx * ny
    h = 1.0 / (nx + 1)

    def stretch(i, m):
        # complex coordinate stretching inside the PML band
        d_lo = np.maximum(0, pml_width - i)
        d_hi = np.maximum(0, i - (m - 1 - pml_width))
        depth = np.maximum(d_lo, d_hi) / max(pml_width, 1)
        return 1.0 + 1j * sigma * depth ** 2

    sx = stretch(np.arange(nx), nx)
    sy = stretch(np.arange(ny), ny)
    idx = _grid_indices((nx, ny))
    rows, cols, vals = [], [], []

    def add(r, c, v):
        rows.append(r)
        cols.append(c)
        vals.append(v)

    for axis, s in ((0, sx), (1, sy)):
        for i in range(nx):
            for j in range(ny):
                r = idx[i, j]
                si = s[i] if axis == 0 else s[j]
                coef = 1.0 / (si * h * h)
                add(r, r, 2.0 * coef)
                if axis == 0 and i > 0:
                    add(r, idx[i - 1, j], -coef)
                if axis == 0 and i < nx - 1:
                    add(r, idx[i + 1, j], -coef)
                if axis == 1 and j > 0:
                    add(r, idx[i, j - 1], -coef)
                if axis == 1 and j < ny - 1:
                    add(r, idx[i, j + 1], -coef)
    for i in range(n):
        add(i, i, -omega ** 2)
    A = SparseMatrix.from_coo(n, n, np.array(rows), np.array(cols),
                              np.array(vals, np.complex128))
    return A
