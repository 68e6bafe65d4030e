"""Deterministic generators (reference ``src/matrices/deterministic/
{classical,misc,sparse_toeplitz}``)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _ij(m, n=None):
    n = m if n is None else n
    i = jnp.arange(m)[:, None]
    j = jnp.arange(n)[None, :]
    return i, j


def zeros(m, n=None, dtype=jnp.float32):
    return jnp.zeros((m, n if n is not None else m), dtype)


def ones(m, n=None, dtype=jnp.float32):
    return jnp.ones((m, n if n is not None else m), dtype)


def identity(n, dtype=jnp.float32):
    return jnp.eye(n, dtype=dtype)


def diagonal(d):
    return jnp.diag(jnp.asarray(d))


def jordan(n, lam, dtype=None):
    lam = jnp.asarray(lam)
    dtype = dtype or lam.dtype
    return (lam * jnp.eye(n, dtype=dtype)
            + jnp.eye(n, k=1, dtype=dtype))


def cauchy(x, y):
    x = jnp.asarray(x)[:, None]
    y = jnp.asarray(y)[None, :]
    return 1.0 / (x - y)


def hilbert(n, dtype=jnp.float64):
    i, j = _ij(n)
    return (1.0 / (i + j + 1)).astype(dtype)


def lotkin(n, dtype=jnp.float64):
    h = hilbert(n, dtype)
    return h.at[0, :].set(1.0)


def fourier(n):
    i, j = _ij(n)
    w = jnp.exp(-2j * jnp.pi * i * j / n)
    return w / jnp.sqrt(n)


def circulant(c):
    c = jnp.asarray(c)
    n = c.shape[0]
    i, j = _ij(n)
    return c[(i - j) % n]


def toeplitz(c, r=None):
    """First column c, first row r (r[0] ignored)."""
    c = jnp.asarray(c)
    r = c if r is None else jnp.asarray(r)
    m, n = c.shape[0], r.shape[0]
    i, j = _ij(m, n)
    d = i - j
    return jnp.where(d >= 0, c[jnp.abs(d)], r[jnp.abs(d)])


def hankel(c, r=None):
    c = jnp.asarray(c)
    r = c if r is None else jnp.asarray(r)
    m, n = c.shape[0], r.shape[0]
    i, j = _ij(m, n)
    s = i + j
    full = jnp.concatenate([c, r[1:]])
    return full[s]


def walsh(k, binary: bool = False):
    """Walsh/Hadamard matrix of order 2^k (reference ``Walsh``)."""
    h = jnp.array([[1.0, 1.0], [1.0, -1.0]])
    out = h
    for _ in range(k - 1):
        out = jnp.kron(out, h)
    if binary:
        out = (out + 1) / 2
    return out


def wilkinson(k):
    """Wilkinson tridiagonal W_{2k+1} (reference ``Wilkinson``)."""
    n = 2 * k + 1
    d = jnp.abs(jnp.arange(n) - k).astype(jnp.float64)
    e = jnp.ones(n - 1)
    return jnp.diag(d) + jnp.diag(e, 1) + jnp.diag(e, -1)


def kahan(n, phi, dtype=jnp.float64):
    """Kahan's upper-triangular counterexample (reference ``Kahan``)."""
    c = np.cos(phi)
    s = np.sin(phi)
    i, j = _ij(n)
    pow_s = jnp.power(s, jnp.arange(n)).astype(dtype)
    upper = jnp.where(j > i, -c, 0.0)
    return pow_s[:, None] * (jnp.eye(n, dtype=dtype) + upper.astype(dtype))


def demmel(n, dtype=jnp.float64):
    """Demmel's counterexample matrix (reference ``Demmel``): upper-triangular
    with entries β^(j−i), β = 10^(4/(n−1))."""
    i, j = _ij(n)
    beta = float(np.power(10.0, 4.0 / (n - 1)))
    return jnp.where(j >= i, jnp.power(beta, (j - i).astype(dtype)),
                     jnp.asarray(0.0, dtype))


def minij(n, dtype=jnp.float64):
    i, j = _ij(n)
    return (jnp.minimum(i, j) + 1).astype(dtype)


def onetwoone(n, dtype=jnp.float64):
    """1-2-1 tridiagonal (reference ``OneTwoOne``)."""
    return (2 * jnp.eye(n) + jnp.eye(n, k=1) + jnp.eye(n, k=-1)).astype(dtype)


def pei(n, alpha, dtype=jnp.float64):
    return (alpha * jnp.eye(n) + jnp.ones((n, n))).astype(dtype)


def parter(n, dtype=jnp.float64):
    i, j = _ij(n)
    return (1.0 / (i - j + 0.5)).astype(dtype)


def redheffer(n, dtype=jnp.float64):
    i, j = _ij(n)
    return jnp.where((j == 0) | ((j + 1) % (i + 1) == 0), 1.0, 0.0) \
        .astype(dtype)


def riemann(n, dtype=jnp.float64):
    i, j = _ij(n)
    ii, jj = i + 2, j + 2
    return jnp.where(jj % ii == 0, (ii - 1).astype(dtype),
                     jnp.asarray(-1.0, dtype))


def ris(n, dtype=jnp.float64):
    i, j = _ij(n)
    return (0.5 / (n - i - j - 0.5)).astype(dtype)


def lehmer(n, dtype=jnp.float64):
    i, j = _ij(n)
    lo = jnp.minimum(i, j) + 1
    hi = jnp.maximum(i, j) + 1
    return (lo / hi).astype(dtype)


def fiedler(c):
    c = jnp.asarray(c)
    return jnp.abs(c[:, None] - c[None, :])


def forsythe(n, alpha, lam, dtype=jnp.float64):
    out = jordan(n, lam, dtype)
    return out.at[n - 1, 0].set(alpha)


def lauchli(n, mu, dtype=jnp.float64):
    top = jnp.ones((1, n), dtype)
    return jnp.concatenate([top, mu * jnp.eye(n, dtype=dtype)], axis=0)


def gcd_matrix(n, dtype=jnp.float64):
    i, j = _ij(n)
    return jnp.asarray(np.gcd.outer(np.arange(1, n + 1),
                                    np.arange(1, n + 1))).astype(dtype)


def gear(n, s=None, t=None, dtype=jnp.float64):
    s = n if s is None else s
    t = -n if t is None else t
    out = jnp.eye(n, k=1, dtype=dtype) + jnp.eye(n, k=-1, dtype=dtype)
    out = out.at[0, abs(s) - 1].set(float(np.sign(s)))
    out = out.at[n - 1, n - abs(t)].set(float(np.sign(t)))
    return out


def gkms(n, dtype=jnp.float64):
    i, j = _ij(n)
    return jnp.power(0.5, jnp.abs(i - j)).astype(dtype)


def kms(n, rho=0.5, dtype=jnp.float64):
    i, j = _ij(n)
    return jnp.power(rho, jnp.abs(i - j)).astype(dtype)


def hanowa(n, alpha, dtype=jnp.float64):
    m = n // 2
    d = alpha * jnp.eye(m, dtype=dtype)
    dd = jnp.diag(jnp.arange(1, m + 1).astype(dtype))
    return jnp.block([[d, -dd], [dd, d]])


def grcar(n, k=3, dtype=jnp.float64):
    """Grcar nonnormal Toeplitz (reference sparse_toeplitz ``Grcar``)."""
    i, j = _ij(n)
    d = j - i
    return jnp.where((d >= 0) & (d <= k), 1.0,
                     jnp.where(d == -1, -1.0, 0.0)).astype(dtype)


def triangle(n, dtype=jnp.complex128):
    """'Triangle' sparse-toeplitz matrix (reference ``Triangle``): symbol
    z^{-1} + (1/4) z^2 — subdiagonal ones and a 1/4 super-super-diagonal,
    whose spectrum fills a triangle."""
    i, j = _ij(n)
    d = j - i
    out = jnp.where(d == -1, 1.0, 0.0) + jnp.where(d == 2, 0.25, 0.0)
    return out.astype(dtype)


def trefethen_embree(n, dtype=jnp.complex128):
    """Trefethen–Embree pseudospectra demo matrix (sparse_toeplitz tier)."""
    i, j = _ij(n)
    d = j - i
    out = jnp.zeros((n, n), dtype)
    for off, val in [(1, 1.0), (-2, 1j), (2, -1.0), (-1, 0.0)]:
        out = out + jnp.where(d == off, val, 0.0).astype(dtype)
    return out


def ehrenfest(n, dtype=jnp.float64):
    """Ehrenfest diffusion transition matrix (reference ``Ehrenfest``):
    tridiagonal birth-death chain with P(k→k+1) = (n−1−k)/(n−1),
    P(k→k−1) = k/(n−1)."""
    k = jnp.arange(n).astype(dtype)
    return (jnp.diag((n - 1 - k[:-1]) / (n - 1), 1)
            + jnp.diag(k[1:] / (n - 1), -1))


def egorov(n, phase_fn=None, dtype=jnp.complex128):
    i, j = _ij(n)
    if phase_fn is None:
        def phase_fn(x, y):
            return -2 * jnp.pi * x * y / n
    return jnp.exp(1j * phase_fn(i, j)).astype(dtype) / jnp.sqrt(n)


def dynamic_regularization_counter(n, dtype=jnp.float64):
    """Druinsky–Toledo style counterexample (reference
    ``examples/interface/DynamicRegCounter.py`` / ``DruinskyToledo.py``):
    [[G, I],[I, I]] with G built from ones + scaled identity, making naive
    LDL regularization-hungry."""
    k = n // 2
    phi = (1 + np.sqrt(5)) / 2
    g = jnp.ones((k, k), dtype) * (-(phi ** 2)) + (1 + phi) * jnp.eye(
        k, dtype=dtype)
    eye = jnp.eye(k, dtype=dtype)
    return jnp.block([[g, eye], [eye, eye]])


def cauchy_like(r, s, x, y):
    """Cauchy-like matrix A(i,j) = r_i·s_j/(x_i − y_j) (reference
    ``deterministic/classical/CauchyLike.cpp``)."""
    r = jnp.asarray(r)[:, None]
    s = jnp.asarray(s)[None, :]
    x = jnp.asarray(x)[:, None]
    y = jnp.asarray(y)[None, :]
    return r * s / (x - y)


def gks(n, dtype=jnp.float64):
    """Golub–Klema–Stewart upper-triangular matrix: A(j,j)=1/√(j+1),
    A(i,j)=−1/√(j+1) for i<j (reference ``misc/GKS.cpp``)."""
    i, j = _ij(n)
    col = 1.0 / jnp.sqrt(jnp.arange(1, n + 1).astype(dtype))[None, :]
    return jnp.where(i < j, -col, jnp.where(i == j, col, 0.0)).astype(dtype)


def legendre(n, dtype=jnp.float64):
    """Jacobi (Golub–Welsch) tridiagonal whose eigenvalues are the
    Gauss–Legendre nodes: off-diagonal β_j = 1/(2√(1−(2(j+1))⁻²))
    (reference ``misc/Legendre.cpp``)."""
    j = jnp.arange(1, n).astype(dtype)
    beta = 0.5 / jnp.sqrt(1.0 - 1.0 / (2.0 * j) ** 2)
    return jnp.diag(beta, 1) + jnp.diag(beta, -1)


def extended_kahan(k, phi, mu, dtype=jnp.float64):
    """Extended Kahan matrix of order n=3·2^k: S·K with K built from
    Walsh blocks and S = diag(ζ^i), ζ=√(1−φ²) (reference
    ``misc/ExtendedKahan.cpp``; QR-pivoting stress test)."""
    if not (0 < phi < 1) or not (0 < mu < 1):
        raise ValueError("phi and mu must be in (0,1)")
    ell = 1 << k
    n = 3 * ell
    A = jnp.eye(n, dtype=dtype)
    W = walsh(k).astype(dtype) if k > 0 else jnp.ones((1, 1), dtype)
    A = A.at[2 * ell:, 2 * ell:].multiply(mu)
    A = A.at[:ell, ell:2 * ell].set(-phi * W)
    A = A.at[ell:2 * ell, 2 * ell:].set(phi * W)
    zeta = np.sqrt(1.0 - phi * phi)
    gamma = jnp.power(jnp.asarray(zeta, dtype), jnp.arange(n).astype(dtype))
    return gamma[:, None] * A


def gepp_growth(n, dtype=jnp.float64):
    """Wilkinson's GEPP worst-case growth matrix: identity, last column of
    ones, all subdiagonals −1 (reference ``misc/GEPPGrowth.cpp``)."""
    i, j = _ij(n)
    A = jnp.where(i == j, 1.0, jnp.where(i > j, -1.0, 0.0)).astype(dtype)
    return A.at[:, n - 1].set(1.0)


def jordan_cholesky(n, dtype=jnp.float64):
    """Tridiagonal [2,5,2] with A(0,0)=1, whose Cholesky factor is a scaled
    Jordan block (reference ``misc/JordanCholesky.cpp``)."""
    A = 5.0 * jnp.eye(n, dtype=dtype) + 2.0 * (
        jnp.eye(n, k=1, dtype=dtype) + jnp.eye(n, k=-1, dtype=dtype))
    return A.at[0, 0].set(1.0) if n > 0 else A


def druinsky_toledo(k, dtype=jnp.float64):
    """Druinsky–Toledo counterexample of order n=2k for Bunch–Kaufman growth
    (reference ``misc/DruinskyToledo.cpp``)."""
    n = 2 * k
    if k == 0:
        return jnp.zeros((0, 0), dtype)
    if k == 1:
        return jnp.ones((n, n), dtype)
    eps = np.finfo(np.dtype(dtype)).eps
    phi = 1.0 + 4.0 * eps
    alpha_phi = (1.0 + np.sqrt(17.0)) / 8.0 * phi
    d = np.empty(k - 2)
    sigma = 1.0
    for i in range(k - 2):
        d[i] = -alpha_phi / sigma
        sigma -= 1.0 / d[i]
    A = jnp.zeros((n, n), dtype)
    A = A.at[k - 2:k, :k].set(1.0)   # G_BL rows of ones
    A = A.at[:k, k - 2:k].set(1.0)   # G_TR cols of ones
    A = A.at[:k - 2, :k - 2].set(jnp.diag(jnp.asarray(d, dtype)))
    eye = jnp.eye(k, dtype=dtype)
    A = A.at[k:, :k].set(eye)
    A = A.at[:k, k:].set(eye)
    A = A.at[k:, k:].set(eye)
    return A


def _log_binomial(n):
    """log(choose(n,k)) for k=0..n (reference ``random/impl.hpp:69``)."""
    from scipy.special import gammaln
    k = np.arange(n + 1)
    return gammaln(n + 1) - gammaln(k + 1) - gammaln(n - k + 1)


def _log_eulerian(n):
    """log of Eulerian numbers A(n,j), j=0..n−1 (reference
    ``random/impl.hpp:87``), via the stable log-space recurrence."""
    euler = np.zeros(n)
    for j in range(1, n):
        new = euler.copy()
        for kk in range(1, j):
            new[kk] = np.logaddexp(np.log(kk + 1) + euler[kk],
                                   np.log(j - kk + 1) + euler[kk - 1])
        euler = new
    return euler


def riffle(n, dtype=jnp.float64):
    """Gilbert–Shannon–Reeds riffle-shuffle transition matrix:
    P(i,j) = 2^{−n}·C(n+1, 2i−j+1)·α_{j+1}/α_{i+1} (reference
    ``misc/Riffle.cpp``; Diaconis–Fulman spectral demo)."""
    lb = _log_binomial(n + 1)
    le = _log_eulerian(n)
    i, j = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    k = 2 * i - j + 1
    valid = (k >= 0) & (k <= n + 1)
    P = np.where(valid,
                 np.exp(lb[np.clip(k, 0, n + 1)] - n * np.log(2.0)
                        + le[j] - le[i]),
                 0.0)
    return jnp.asarray(P, dtype)


def riffle_stationary(n, dtype=jnp.float64):
    """Stationary distribution of the riffle chain, replicated over rows
    (reference ``RiffleStationary``)."""
    sigma = np.zeros(n)
    sigma[0] = 1.0
    for j in range(1, n):
        new = sigma.copy()
        for kk in range(1, j + 1):
            new[kk] = (kk + 1) * sigma[kk] + (j - kk + 1) * sigma[kk - 1]
        sigma = new / (j + 1)
    return jnp.broadcast_to(jnp.asarray(sigma, dtype), (n, n))


def riffle_decay(n, dtype=jnp.float64):
    """P − P∞: the decaying part of the riffle chain (reference
    ``RiffleDecay``)."""
    return riffle(n, dtype) - riffle_stationary(n, dtype)


def _banded_complex(n, bands, dtype=jnp.complex128):
    out = jnp.zeros((n, n), dtype)
    i, j = _ij(n)
    for off, val in bands:
        out = out + jnp.where(j - i == off, val, 0.0).astype(dtype)
    return out


def bulls_head(n, dtype=jnp.complex128):
    """Bull's-head banded Toeplitz (symbol 2i·z⁻¹ + z² + 7/10·z³;
    reference ``sparse_toeplitz/BullsHead.cpp``)."""
    if n < 4:
        raise ValueError("BullsHead needs n ≥ 4 for its third-order symbol")
    return _banded_complex(n, [(1, 2j), (-2, 1.0), (-3, 0.7)], dtype)


def whale(n, dtype=jnp.complex128):
    """Whale banded Toeplitz, a fourth-order pseudospectra demo symbol
    (reference ``sparse_toeplitz/Whale.cpp``)."""
    if n < 5:
        raise ValueError("Whale needs n ≥ 5 for its fourth-order symbol")
    return _banded_complex(
        n, [(4, -1.0), (3, -3.0 - 2.0j), (2, 1.0j), (1, 1.0),
            (-1, 10.0), (-2, 3.0 + 1.0j), (-3, 4.0), (-4, 1.0j)], dtype)


def tri_w(n, alpha, k, dtype=jnp.float64):
    """Upper-triangular Toeplitz with unit diagonal and k superdiagonals of
    α (reference ``sparse_toeplitz/TriW.cpp``)."""
    if k < 0:
        raise ValueError("k must be non-negative")
    i, j = _ij(n)
    d = j - i
    A = jnp.where((d >= 1) & (d <= k), alpha, 0.0).astype(dtype)
    return A + jnp.eye(n, dtype=dtype)


def fox_li(n, omega, dtype=jnp.complex128):
    """Fox–Li laser cavity integral operator discretized by Gauss–Legendre
    quadrature: A(i,j) = √(iω/π)·exp(−iω(x_i−x_j)²)·√(w_i w_j) (reference
    ``integral/FoxLi.cpp``; the quadrature tridiagonal there is the
    Golub–Welsch Legendre matrix, so nodes/weights come from
    ``leggauss``)."""
    x, w = np.polynomial.legendre.leggauss(n)
    phi = complex(np.sqrt(1j * omega / np.pi))
    real_dt = jnp.float32 if dtype == jnp.complex64 else jnp.float64
    sq = jnp.asarray(np.sqrt(w), real_dt)
    xs = jnp.asarray(x, real_dt)
    theta = -omega * (xs[:, None] - xs[None, :]) ** 2
    A = phi * jnp.exp(1j * theta).astype(dtype)
    return (sq[:, None] * A * sq[None, :]).astype(dtype)
