"""Bridged unstructured SpMV tier (r5): gather → route → one-hot combine
(kernels/unstructured.plan_bridged_spmv; EXPERIMENTS.md §E5.6)."""

import numpy as np

import jax
import jax.numpy as jnp

from elemental_tpu.sparse import SparseMatrix, plan_spmv

RNG = np.random.default_rng(11)


def _random_csr(n, d):
    rows = np.repeat(np.arange(n), d)
    cols = RNG.integers(0, n, d * n)
    vals = RNG.standard_normal(d * n)
    return SparseMatrix.from_coo(n, n, rows, cols, vals)


def test_bridged_matvec_matches_scipy():
    A = _random_csr(1 << 13, 7)
    plan = plan_spmv(A, kind="bridged")
    assert plan.kind == "bridged"
    x = RNG.standard_normal(A.width).astype(np.float32)
    y = np.asarray(plan.gather.matvec(jnp.asarray(x), interpret=True))
    expect = A.to_scipy().astype(np.float32) @ x
    rel = np.abs(y - expect).max() / np.abs(expect).max()
    assert rel < 1e-5, rel


def test_bridged_rectangular_and_ragged():
    # non-multiple-of-bucket height and ragged row counts
    n, m = 5000, 9000
    nnz = 30000
    rows = RNG.integers(0, n, nnz)
    cols = RNG.integers(0, m, nnz)
    vals = RNG.standard_normal(nnz)
    A = SparseMatrix.from_coo(n, m, rows, cols, vals)
    plan = plan_spmv(A, kind="bridged")
    x = RNG.standard_normal(m).astype(np.float32)
    y = np.asarray(plan.gather.matvec(jnp.asarray(x), interpret=True))
    expect = A.to_scipy().astype(np.float32) @ x
    assert np.abs(y - expect).max() / np.abs(expect).max() < 1e-5
