"""DIA + halo-panel stencil SpMV tests (the SoL kernel path), CPU-run with
interpret-mode Pallas where needed."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from elemental_tpu.matrices import sparse_laplacian_2d, sparse_laplacian_3d
from elemental_tpu.sparse import SparseMatrix, to_dia
from elemental_tpu.kernels.spmv import (build_halo_panel, plan_stencil_spmv,
                                        stencil_spmv)

RNG = np.random.default_rng(31)


def _xla_panel_spmv(plan, x):
    """Reference implementation of the halo-panel math in plain XLA."""
    xp, pt = build_halo_panel(plan, x)
    R, C, H = plan.rows, plan.cols, plan.halo
    w = jnp.asarray(plan.weights)
    y = jnp.zeros((R, C), x.dtype)
    for s, (di, dj) in enumerate(plan.shifts):
        xs = jax.lax.slice(xp, (pt + di, H + dj), (pt + di + R, H + dj + C))
        y = y + w[s] * xs
    return y.reshape(-1)[:plan.n]


def test_to_dia_roundtrip():
    A = sparse_laplacian_2d(6, 6, scaled=False)
    dia = to_dia(A)
    assert dia is not None and len(dia.offsets) == 5
    x = RNG.standard_normal(36)
    y = np.asarray(dia.device().matvec(jnp.asarray(x)))
    np.testing.assert_allclose(y, A.to_dense() @ x, rtol=1e-12)


def test_to_dia_rejects_unstructured():
    nnz = 500
    A = SparseMatrix.from_coo(100, 100, RNG.integers(0, 100, nnz),
                              RNG.integers(0, 100, nnz),
                              RNG.standard_normal(nnz))
    assert to_dia(A) is None  # too many distinct diagonals


@pytest.mark.parametrize("dims", [(12, 12), (8, 16)])
def test_stencil_plan_xla_math(dims):
    A = sparse_laplacian_2d(*dims, scaled=False)
    dia = to_dia(A)
    plan = plan_stencil_spmv(dia.offsets, dia.diags, A.height, cols=16)
    x = RNG.standard_normal(A.width)
    y = np.asarray(_xla_panel_spmv(plan, jnp.asarray(x)))
    np.testing.assert_allclose(y, A.to_dense() @ x, rtol=1e-10)


def test_stencil_plan_3d():
    A = sparse_laplacian_3d(5, 5, 5, scaled=False)
    dia = to_dia(A)
    plan = plan_stencil_spmv(dia.offsets, dia.diags, A.height, cols=32)
    x = RNG.standard_normal(125)
    y = np.asarray(_xla_panel_spmv(plan, jnp.asarray(x)))
    np.testing.assert_allclose(y, A.to_dense() @ x, rtol=1e-10)


def test_stencil_banded_random():
    """General banded matrix (not a PDE stencil)."""
    n = 200
    offs = [-13, -1, 0, 2, 17]
    rows, cols, vals = [], [], []
    for off in offs:
        lo, hi = max(0, -off), min(n, n - off)
        r = np.arange(lo, hi)
        rows.append(r)
        cols.append(r + off)
        vals.append(RNG.standard_normal(hi - lo))
    A = SparseMatrix.from_coo(n, n, np.concatenate(rows),
                              np.concatenate(cols), np.concatenate(vals))
    dia = to_dia(A)
    plan = plan_stencil_spmv(dia.offsets, dia.diags, n, cols=32)
    x = RNG.standard_normal(n)
    y = np.asarray(_xla_panel_spmv(plan, jnp.asarray(x)))
    np.testing.assert_allclose(y, A.to_dense() @ x, rtol=1e-10)


def test_stencil_pallas_interpret():
    """Pallas kernel in interpreter mode (no TPU needed)."""
    from jax.experimental.pallas import tpu as pltpu
    A = sparse_laplacian_2d(16, 16, scaled=False)
    dia = to_dia(A)
    plan = plan_stencil_spmv(dia.offsets, dia.diags, A.height, cols=16)
    x = RNG.standard_normal(256)
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(stencil_spmv(plan, jnp.asarray(x), tile_rows=8))
    np.testing.assert_allclose(y, A.to_dense() @ x, rtol=1e-10)
