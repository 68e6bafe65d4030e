"""Pallas windowed-gather SpMV (interpret mode — the kernel-language path
is exercised on CPU; on-chip perf is covered by bench.py)."""

import numpy as np
import jax.numpy as jnp

from elemental_tpu.sparse import SparseMatrix
from elemental_tpu.kernels.unstructured import plan_gather_spmv

RNG = np.random.default_rng(0)


def _rand_csr(n, nnzr, seed=0):
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n), nnzr)
    cols = rng.integers(0, n, n * nnzr)
    vals = rng.standard_normal(n * nnzr)
    return SparseMatrix.from_coo(n, n, rows, cols, vals)


def test_gather_spmv_uniform_random():
    A = _rand_csr(1536, 6)
    plan = plan_gather_spmv(A)
    x = RNG.standard_normal(1536)
    y = np.asarray(plan.matvec(jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(y, A.to_scipy() @ x, rtol=1e-12, atol=1e-12)


def test_gather_spmv_skewed_and_rect():
    # power-law-ish columns + rectangular
    rng = np.random.default_rng(3)
    m, n, nnz = 700, 900, 5000
    cols = (n * rng.random(nnz) ** 3).astype(np.int64)
    rows = rng.integers(0, m, nnz)
    A = SparseMatrix.from_coo(m, n, rows, cols, rng.standard_normal(nnz))
    plan = plan_gather_spmv(A)
    x = rng.standard_normal(n)
    y = np.asarray(plan.matvec(jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(y, A.to_scipy() @ x, rtol=1e-11, atol=1e-11)
    # padding waste stays bounded
    assert plan.ntiles * 1024 < 3 * plan.nnz + 8192
