"""Generator-breadth tier tests (reference ``src/matrices/**``: the
classical/misc/sparse_toeplitz/integral/lattice generators added for full
§2.5 parity) plus Lanczos and SafeMultiShiftTrsm.

Each test checks a *mathematical invariant* of the generator, mirroring the
reference's self-verifying style (SURVEY §4) rather than golden files."""

import numpy as np
import jax.numpy as jnp
import pytest

import elemental_tpu.matrices as M
from elemental_tpu.core import random_ as rng


def test_riffle_is_stochastic_with_known_stationary():
    n = 10
    P = np.asarray(M.riffle(n))
    assert np.abs(P.sum(axis=1) - 1).max() < 1e-12
    Pi = np.asarray(M.riffle_stationary(n))
    pi = Pi[0]
    assert abs(pi.sum() - 1) < 1e-12
    assert np.abs(pi @ P - pi).max() < 1e-12
    assert np.abs(np.asarray(M.riffle_decay(n)) - (P - Pi)).max() < 1e-14


def test_legendre_eigenvalues_are_gauss_nodes():
    n = 12
    w = np.sort(np.linalg.eigvalsh(np.asarray(M.legendre(n))))
    x, _ = np.polynomial.legendre.leggauss(n)
    assert np.abs(w - np.sort(x)).max() < 1e-12


def test_fox_li_unit_two_norm():
    A = np.asarray(M.fox_li(64, 16.0))
    assert abs(np.linalg.norm(A, 2) - 1.0) < 1e-8
    # eigenvalues inside the closed unit disk (Fox–Li spiral)
    ev = np.linalg.eigvals(A)
    assert np.abs(ev).max() <= 1.0 + 1e-8


def test_gepp_growth_exhibits_2_to_n_growth():
    import scipy.linalg
    n = 10
    _, _, U = scipy.linalg.lu(np.asarray(M.gepp_growth(n)))
    assert abs(U[-1, -1] - 2.0 ** (n - 1)) < 1e-9


def test_jordan_cholesky_factor_is_jordan():
    n = 8
    A = np.asarray(M.jordan_cholesky(n))
    L = np.linalg.cholesky(A)
    # Lᵀ is the unit-diagonal Jordan-like bidiagonal with superdiagonal 2
    U = L.T
    assert np.abs(np.diag(U) - 1.0).max() < 1e-12
    assert np.abs(np.diag(U, 1) - 2.0).max() < 1e-12
    assert np.abs(np.triu(U, 2)).max() < 1e-12


def test_druinsky_toledo_symmetric_and_indefinite():
    A = np.asarray(M.druinsky_toledo(6))
    assert np.abs(A - A.T).max() == 0
    ev = np.linalg.eigvalsh(A)
    assert ev[0] < 0 < ev[-1]


def test_extended_kahan_rank_deficiency_signal():
    # Trailing QR pivots should expose the small-φ graded structure:
    # cond grows rapidly with k.
    c2 = np.linalg.cond(np.asarray(M.extended_kahan(2, 0.9, 0.1)))
    c3 = np.linalg.cond(np.asarray(M.extended_kahan(3, 0.9, 0.1)))
    assert c3 > 10 * c2 > 0


def test_gks_columns_have_unit_norm():
    A = np.asarray(M.gks(16))
    assert np.abs(np.triu(A) - A).max() == 0
    norms = np.linalg.norm(A, axis=0)
    assert np.abs(norms - 1.0).max() < 1e-12


def test_banded_toeplitz_symbols():
    W = np.asarray(M.whale(10))
    assert W[1, 0] == 10.0 and W[0, 1] == 1.0 and W[0, 4] == -1.0
    B = np.asarray(M.bulls_head(8))
    assert B[0, 1] == 2j and B[2, 0] == 1.0 and B[3, 0] == 0.7
    T = np.asarray(M.tri_w(6, -2.0, 3))
    assert np.abs(np.diag(T) - 1).max() == 0
    assert T[0, 3] == -2.0 and T[0, 4] == 0.0 and T[1, 0] == 0.0


def test_cauchy_like():
    r, s = [1.0, 2.0], [3.0, 4.0, 5.0]
    x, y = [2.0, 3.0], [0.0, 1.0, -1.0]
    A = np.asarray(M.cauchy_like(r, s, x, y))
    for i in range(2):
        for j in range(3):
            assert abs(A[i, j] - r[i] * s[j] / (x[i] - y[j])) < 1e-12


def test_lattice_bases():
    rng.seed(7)
    A = np.asarray(M.ajtai_type_basis(6, 0.5))
    assert np.abs(np.tril(A, -1)).max() == 0          # upper triangular
    d = np.diag(A)
    assert (d[:-1] >= d[1:]).all() and d.min() >= 1   # graded powers of 2
    assert (np.triu(A, 1) <= d[None, :] / 2 + 1e-12).all()
    K = np.asarray(M.knapsack_type_basis(5, 100.0))
    assert K.shape == (6, 5)
    assert np.abs(K[:5] - np.eye(5)).max() == 0
    assert np.abs(K[5] - np.round(K[5])).max() == 0


def test_three_valued_support():
    rng.seed(3)
    A = np.asarray(M.three_valued(50, 50, p=0.5))
    vals = np.unique(A)
    assert set(vals).issubset({-1.0, 0.0, 1.0})
    frac = (A != 0).mean()
    assert 0.3 < frac < 0.7


def test_hatano_nelson_structure():
    rng.seed(4)
    A = np.asarray(M.hatano_nelson(6, g=0.3, periodic=True))
    eg = np.exp(0.3)
    assert abs(A[0, 1] - eg) < 1e-12 and abs(A[1, 0] - 1 / eg) < 1e-12
    assert abs(A[5, 0] - eg) < 1e-12 and abs(A[0, 5] - 1 / eg) < 1e-12


def test_uniform_helmholtz_greens():
    rng.seed(5)
    A = np.asarray(M.uniform_helmholtz_greens(20, 0.5))
    assert np.abs(np.diag(A)).max() == 0
    assert A.shape == (20, 20) and np.iscomplexobj(A)
    # symmetric kernel (not Hermitian): G(x,y) = G(y,x)
    assert np.abs(A - A.T).max() < 1e-12


def test_lanczos_ritz_values_match_extremal_eigs():
    from elemental_tpu.lapack import lanczos, lanczos_decomp
    rng_np = np.random.default_rng(0)
    n = 40
    A = rng_np.standard_normal((n, n))
    A = (A + A.T) / 2
    T = lanczos(n, lambda v: jnp.asarray(A) @ v, basis_size=n)
    ritz = np.sort(np.linalg.eigvalsh(np.asarray(T)))
    ev = np.sort(np.linalg.eigvalsh(A))
    assert abs(ritz[0] - ev[0]) < 1e-8 and abs(ritz[-1] - ev[-1]) < 1e-8
    V, T2, v, beta = lanczos_decomp(n, lambda x: jnp.asarray(A) @ x, 15)
    V = np.asarray(V)
    assert np.abs(V.T @ V - np.eye(15)).max() < 1e-10
    resid = A @ V - V @ np.asarray(T2) \
        - float(beta) * np.outer(np.asarray(v), np.eye(15)[-1])
    assert np.abs(resid).max() < 1e-10


def test_product_lanczos_singular_value_estimates():
    from elemental_tpu.lapack import extremal_singular_value_estimates
    rng_np = np.random.default_rng(1)
    A = rng_np.standard_normal((50, 30))
    smin, smax = extremal_singular_value_estimates(A, basis_size=30)
    sv = np.linalg.svd(A, compute_uv=False)
    assert abs(float(smax) - sv[0]) < 1e-6 * sv[0]
    assert abs(float(smin) - sv[-1]) < 1e-4 * sv[0]


def test_product_lanczos_on_sparse_operator():
    from elemental_tpu.lapack import product_lanczos
    from elemental_tpu.matrices import sparse_laplacian_2d
    A = sparse_laplacian_2d(8, 8, scaled=False)
    T = product_lanczos(A, basis_size=40)
    ritz = np.linalg.eigvalsh(np.asarray(T))
    dense = A.to_scipy().toarray()
    sv = np.linalg.svd(dense, compute_uv=False)
    assert abs(np.sqrt(ritz[-1]) - sv[0]) < 1e-6 * sv[0]


def test_safe_multishift_trsm_matches_unscaled_solve():
    from elemental_tpu.ops import safe_multishift_trsm
    rng_np = np.random.default_rng(2)
    n, k = 24, 6
    U = np.triu(rng_np.standard_normal((n, n))) + 5 * np.eye(n)
    shifts = rng_np.standard_normal(k)
    B = rng_np.standard_normal((n, k))
    X, sc = safe_multishift_trsm("L", "U", "N", 1.0, jnp.asarray(U),
                                 jnp.asarray(shifts), jnp.asarray(B))
    X, sc = np.asarray(X), np.asarray(sc)
    for j in range(k):
        r = (U - shifts[j] * np.eye(n)) @ X[:, j] - sc[j] * B[:, j]
        assert np.abs(r).max() < 1e-10
