"""Level-1/2/3 coverage (model: reference ``tests/blas_like``): each op checked
against a NumPy oracle over real/complex dtypes, local and distributed."""

import numpy as np
import pytest

import jax.numpy as jnp

from elemental_tpu.core import MC, MR, distribute
from elemental_tpu import ops

RNG = np.random.default_rng(11)


def _rand(shape, dtype=np.float64):
    a = RNG.standard_normal(shape)
    if np.issubdtype(np.dtype(dtype), np.complexfloating):
        a = a + 1j * RNG.standard_normal(shape)
    return a.astype(dtype)


# -- level 1 ---------------------------------------------------------------

def test_axpy_dot_nrm2(dtype):
    x, y = _rand((8, 8), dtype), _rand((8, 8), dtype)
    out = ops.axpy(2.0, jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(out), y + 2.0 * x, rtol=1e-5)
    np.testing.assert_allclose(complex(ops.dot(x, y)),
                               np.vdot(x, y), rtol=1e-5)
    np.testing.assert_allclose(float(ops.nrm2(x)),
                               np.linalg.norm(x), rtol=1e-5)


def test_level1_distributed(grid8):
    a = _rand((16, 16), np.float32)
    A = distribute(a, MC, MR, grid8)
    B = ops.scale(3.0, A)
    assert B.dist() == (MC, MR)
    np.testing.assert_allclose(B.to_numpy(), 3.0 * a, rtol=1e-6)


def test_diagonal_ops():
    a = _rand((6, 6))
    d = np.arange(1.0, 7.0)
    out = ops.diagonal_scale("L", d, jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(out), np.diag(d) @ a)
    out = ops.diagonal_solve("R", d, jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(out), a @ np.diag(1 / d))
    dd = ops.get_diagonal(a, 1)
    np.testing.assert_allclose(np.asarray(dd), np.diagonal(a, 1))
    a2 = ops.set_diagonal(jnp.asarray(a), np.zeros(6), 0)
    assert np.all(np.diagonal(np.asarray(a2)) == 0)


def test_index_dependent_map():
    a = np.zeros((4, 5))
    out = ops.index_dependent_map(jnp.asarray(a), lambda i, j, v: v + i * 10 + j)
    expect = np.add.outer(np.arange(4) * 10, np.arange(5))
    np.testing.assert_array_equal(np.asarray(out), expect)


def test_make_hermitian():
    a = _rand((5, 5), np.complex128)
    H = np.asarray(ops.make_hermitian(jnp.asarray(a), "L"))
    np.testing.assert_allclose(H, H.conj().T)
    np.testing.assert_allclose(np.tril(H, -1), np.tril(a, -1))


def test_max_abs_loc():
    a = np.array([[1.0, -5.0], [3.0, 2.0]])
    val, (i, j) = ops.max_abs_loc(jnp.asarray(a))
    assert float(val) == 5.0 and (int(i), int(j)) == (0, 1)


def test_norms_rows_cols():
    a = _rand((7, 4))
    np.testing.assert_allclose(np.asarray(ops.column_norms(a)),
                               np.linalg.norm(a, axis=0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ops.row_max_norms(a)),
                               np.abs(a).max(axis=1), rtol=1e-6)


# -- level 2 ---------------------------------------------------------------

def test_gemv_ger(dtype):
    a, x, y = _rand((6, 4), dtype), _rand((4,), dtype), _rand((6,), dtype)
    out = ops.gemv("N", 1.0, a, x)
    np.testing.assert_allclose(np.asarray(out), a @ x, rtol=1e-5)
    out = ops.gemv("C", 1.0, a, y)
    np.testing.assert_allclose(np.asarray(out), a.conj().T @ y, rtol=1e-5)
    A2 = ops.ger(2.0, jnp.asarray(y), jnp.asarray(x), jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(A2), a + 2 * np.outer(y, x.conj()),
                               rtol=1e-5)


def test_symv_hemv():
    a = _rand((5, 5), np.complex128)
    h = np.tril(a) + np.tril(a, -1).conj().T
    h = h - 1j * np.diag(np.diag(a).imag)
    x = _rand((5,), np.complex128)
    out = ops.hemv("L", 1.0, a, x)
    np.testing.assert_allclose(np.asarray(out), h @ x, rtol=1e-10)


def test_trsv():
    a = np.tril(_rand((6, 6))) + 6 * np.eye(6)
    x = _rand((6,))
    out = ops.trsv("L", "N", "N", a, x)
    np.testing.assert_allclose(np.asarray(out), np.linalg.solve(np.tril(a), x),
                               rtol=1e-10)


# -- level 3 ---------------------------------------------------------------

def test_trsm_all_cases(dtype):
    n, k = 20, 7
    a = _rand((n, n), dtype)
    a = (a + n * np.eye(n)).astype(dtype)
    for side in "LR":
        for uplo in "LU":
            for orient in ("N", "T", "C"):
                for diag in ("N", "U"):
                    tri = np.tril(a) if uplo == "L" else np.triu(a)
                    if diag == "U":
                        tri = tri - np.diag(np.diag(tri)) + np.eye(n)
                    op = {"N": tri, "T": tri.T, "C": tri.conj().T}[orient]
                    b = _rand((n, k) if side == "L" else (k, n), dtype)
                    out = np.asarray(ops.trsm(side, uplo, orient, diag, 1.0,
                                              jnp.asarray(a), jnp.asarray(b)))
                    expect = (np.linalg.solve(op, b) if side == "L"
                              else np.linalg.solve(op.T, b.T).T)
                    rtol = 1e-3 if dtype in (np.float32, np.complex64) else 1e-9
                    np.testing.assert_allclose(out, expect, rtol=rtol,
                                               atol=rtol,
                                               err_msg=f"{side}{uplo}{orient}{diag}")


def test_trsm_recursive_large():
    """Exercise the recursive path (n > base blocksize)."""
    n = 600
    a = np.tril(_rand((n, n))) + n * np.eye(n)
    b = _rand((n, 3))
    out = np.asarray(ops.trsm("L", "L", "N", "N", 1.0, jnp.asarray(a),
                              jnp.asarray(b)))
    np.testing.assert_allclose(out, np.linalg.solve(np.tril(a), b), rtol=1e-8)


def test_herk_syrk(dtype):
    a = _rand((8, 5), dtype)
    out = np.asarray(ops.herk("L", "N", 1.0, jnp.asarray(a)))
    expect = np.tril(a @ a.conj().T)
    np.testing.assert_allclose(out, expect, rtol=1e-5)
    out = np.asarray(ops.syrk("U", "T", 2.0, jnp.asarray(a)))
    np.testing.assert_allclose(out, np.triu(2 * a.T @ a), rtol=1e-5)


def test_trrk_preserves_other_triangle():
    n = 8
    c = _rand((n, n))
    a, b = _rand((n, 4)), _rand((4, n))
    out = np.asarray(ops.trrk("L", "N", "N", 1.0, jnp.asarray(a),
                              jnp.asarray(b), 1.0, jnp.asarray(c)))
    np.testing.assert_allclose(np.tril(out), np.tril(a @ b + c), rtol=1e-10)
    np.testing.assert_allclose(np.triu(out, 1), np.triu(c, 1), rtol=1e-10)


def test_trmm():
    n = 10
    a, b = _rand((n, n)), _rand((n, 6))
    out = np.asarray(ops.trmm("L", "U", "N", "N", 1.0, jnp.asarray(a),
                              jnp.asarray(b)))
    np.testing.assert_allclose(out, np.triu(a) @ b, rtol=1e-10)


def test_symm_hemm():
    n = 9
    a = _rand((n, n), np.complex128)
    b = _rand((n, 4), np.complex128)
    h = np.tril(a) + np.tril(a, -1).conj().T
    h = h - 1j * np.diag(np.diag(a).imag)
    out = np.asarray(ops.hemm("L", "L", 1.0, jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(out, h @ b, rtol=1e-10)


def test_twosided_trsm():
    """A ← L⁻¹ A L⁻ᴴ should map eigenproblem A x = λ B x correctly."""
    n = 12
    a = _rand((n, n))
    a = a + a.T + 2 * n * np.eye(n)
    l = np.tril(_rand((n, n))) + n * np.eye(n)
    out = np.asarray(ops.twosided_trsm("L", "N", jnp.asarray(a),
                                       jnp.asarray(l)))
    expect = np.linalg.solve(l, np.linalg.solve(l, a.T).T)
    np.testing.assert_allclose(out, expect, rtol=1e-8)


def test_multishift_trsm():
    n, k = 16, 5
    a = np.triu(_rand((n, n))) + n * np.eye(n)
    shifts = RNG.standard_normal(k)
    b = _rand((n, k))
    out = np.asarray(ops.multishift_trsm("L", "U", "N", 1.0, jnp.asarray(a),
                                         jnp.asarray(shifts), jnp.asarray(b)))
    for j in range(k):
        expect = np.linalg.solve(np.triu(a) - shifts[j] * np.eye(n), b[:, j])
        np.testing.assert_allclose(out[:, j], expect, rtol=1e-8)
