"""auto_plan.plan_spmv dispatch + correctness (reference analog:
tests/blas_like/Multiply.cpp cross-implementation agreement)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
from jax.experimental.pallas import tpu as pltpu

from elemental_tpu.matrices import sparse_laplacian_2d
from elemental_tpu.sparse import SparseMatrix, plan_spmv


def _check(plan, A, rng, atol=1e-5):
    x = rng.standard_normal(A.width).astype(np.float32)
    xp = jax.numpy.asarray(plan.to_plan_space(x))
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(plan.matvec(xp))
    y = plan.from_plan_space(y)
    expect = A.to_scipy() @ x
    assert np.allclose(y, expect, atol=atol * max(1.0, np.abs(expect).max()))


def test_laplacian_direct_stencil():
    A = sparse_laplacian_2d(24, 24, scaled=False)
    A = SparseMatrix.from_scipy(A.to_scipy().astype(np.float32))
    plan = plan_spmv(A, cols=128)
    assert plan.kind == "stencil"
    _check(plan, A, np.random.default_rng(0))


def test_scrambled_banded_recovers_via_rcm():
    rng = np.random.default_rng(1)
    n, bw = 512, 6
    offs = range(-bw, bw + 1)
    diags = [rng.standard_normal(n) for _ in offs]
    S = sp.diags(diags, list(offs), shape=(n, n), format="csr")
    S = (S + S.T).astype(np.float32)  # symmetric banded
    p = rng.permutation(n)            # scramble
    Ssc = S[p][:, p].tocsr()
    A = SparseMatrix.from_scipy(Ssc)
    plan = plan_spmv(A, cols=128)
    assert plan.kind == "stencil_rcm"
    assert plan.perm is not None
    _check(plan, A, rng)


def test_unstructured_falls_back_to_csr():
    rng = np.random.default_rng(2)
    n, k = 256, 4
    rows = np.repeat(np.arange(n), k)
    cols = rng.integers(0, n, n * k)
    vals = rng.standard_normal(n * k).astype(np.float32)
    S = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
    A = SparseMatrix.from_scipy(S)
    plan = plan_spmv(A, cols=128)
    assert plan.kind == "gather_csr" and plan.slow
    _check(plan, A, rng)
    # the honest XLA-only fallback still dispatches and is marked slow
    plan2 = plan_spmv(A, cols=128, pallas_gather=False)
    assert plan2.kind == "csr" and plan2.slow
    _check(plan2, A, rng)


def test_rectangular_uses_ell_or_stencil():
    rng = np.random.default_rng(3)
    S = sp.random(96, 128, density=0.05, format="csr",
                  random_state=4, dtype=np.float32)
    A = SparseMatrix.from_scipy(S)
    plan = plan_spmv(A, cols=128)
    _check(plan, A, rng)


def test_stream_bytes_accounting():
    A = sparse_laplacian_2d(16, 16, scaled=False)
    A = SparseMatrix.from_scipy(A.to_scipy().astype(np.float32))
    plan = plan_spmv(A, cols=128)
    assert plan.stream_bytes > 0
