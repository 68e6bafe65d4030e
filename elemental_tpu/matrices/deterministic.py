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
