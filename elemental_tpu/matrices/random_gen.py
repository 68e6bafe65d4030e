"""Random generators (reference ``src/matrices/random``: Uniform, Gaussian,
Bernoulli, Wigner, Haar, HermitianUniformSpectrum, NormalUniformSpectrum)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core import random_ as rng


def uniform(m, n=None, dtype=jnp.float32, center=0.0, radius=1.0):
    shape = (m, n if n is not None else m)
    return rng.uniform(shape, dtype, center, radius)


def gaussian(m, n=None, dtype=jnp.float32, mean=0.0, stddev=1.0):
    shape = (m, n if n is not None else m)
    return rng.gaussian(shape, dtype, mean, stddev)


def bernoulli(m, n=None, p=0.5, dtype=jnp.float32):
    shape = (m, n if n is not None else m)
    return rng.bernoulli(shape, p).astype(dtype)


def rademacher(m, n=None, dtype=jnp.float32):
    shape = (m, n if n is not None else m)
    return rng.rademacher(shape, dtype)


def wigner(n, dtype=jnp.float32):
    """Gaussian Wigner ensemble: Hermitian with N(0,1) entries (reference
    ``Wigner``)."""
    g = rng.gaussian((n, n), dtype)
    return (g + jnp.conj(g.T)) / jnp.sqrt(2).astype(
        jnp.abs(g[:1, :1]).dtype)


def haar(n, dtype=jnp.float32):
    """Haar-distributed orthogonal/unitary matrix via QR of a Ginibre sample
    with phase fix (reference ``Haar``)."""
    g = rng.gaussian((n, n), dtype)
    q, r = jnp.linalg.qr(g)
    d = jnp.diagonal(r)
    ph = d / jnp.abs(d)
    return q * jnp.conj(ph)[None, :]


def hermitian_uniform_spectrum(n, lower=0.0, upper=1.0, dtype=jnp.float32):
    """Hermitian matrix with eigenvalues drawn Uniform[lower, upper] under a
    Haar conjugation (reference ``HermitianUniformSpectrum`` — the standard
    well-conditioned test input of ``tests/lapack_like``)."""
    q = haar(n, dtype)
    lam = rng.uniform((n,), jnp.abs(q[:1, :1]).dtype,
                      (lower + upper) / 2, (upper - lower) / 2)
    return (q * lam[None, :].astype(q.dtype)) @ jnp.conj(q.T)


def normal_uniform_spectrum(n, center=0.0, radius=1.0, dtype=jnp.complex64):
    """Normal matrix with eigenvalues uniform in a disk (reference
    ``NormalUniformSpectrum``)."""
    q = haar(n, dtype)
    lam = rng.uniform((n,), dtype, center, radius)
    return (q * lam[None, :]) @ jnp.conj(q.T)


def three_valued(m, n=None, p=0.5, dtype=jnp.float32):
    """Entries −1/+1 each with probability p/2, else 0 (reference
    ``random/independent/ThreeValued.cpp``)."""
    shape = (m, n if n is not None else m)
    import jax
    u = jax.random.uniform(rng.next_key(), shape)
    return jnp.where(u <= p / 2, -1.0,
                     jnp.where(u <= p, 1.0, 0.0)).astype(dtype)


def hatano_nelson(n, center=0.0, radius=1.0, g=0.5, periodic=True,
                  dtype=jnp.float64):
    """Hatano–Nelson non-Hermitian hopping matrix: uniform diagonal,
    super-diagonal e^g, sub-diagonal e^{−g}, optionally periodic (reference
    ``random/misc/HatanoNelson.cpp``; Trefethen–Embree §36)."""
    if n < 3:
        raise ValueError("HatanoNelson requires n ≥ 3")
    d = rng.uniform((n,), dtype, center, radius)
    eg, emg = jnp.exp(jnp.asarray(g, dtype)), jnp.exp(jnp.asarray(-g, dtype))
    A = jnp.diag(d) + eg * jnp.eye(n, k=1, dtype=dtype) \
        + emg * jnp.eye(n, k=-1, dtype=dtype)
    if periodic:
        A = A.at[n - 1, 0].set(eg).at[0, n - 1].set(emg)
    return A


def uniform_helmholtz_greens(n, lam, dtype=jnp.complex128):
    """Green's kernel G(x,y)=e^{ik₀‖x−y‖}/‖x−y‖ (k₀=2π/λ) between n uniform
    samples of the 3-D unit ball, zero diagonal (reference
    ``random/misc/UniformHelmholtzGreens.cpp``)."""
    import jax
    real_dt = jnp.float32 if dtype == jnp.complex64 else jnp.float64
    k0 = 2.0 * jnp.pi / lam
    # rejection-free ball sampling: direction × cube-root radius
    z = jax.random.normal(rng.next_key(), (n, 3), real_dt)
    z = z / jnp.linalg.norm(z, axis=1, keepdims=True)
    r = jax.random.uniform(rng.next_key(), (n, 1), real_dt) ** (1.0 / 3.0)
    X = z * r
    diff = X[:, None, :] - X[None, :, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    gamma = k0 * dist
    safe = jnp.where(gamma == 0, 1.0, gamma)
    G = jnp.exp(1j * gamma.astype(dtype)) / safe.astype(dtype)
    return jnp.where(jnp.eye(n, dtype=bool), 0.0, G)


def ajtai_type_basis(n, alpha, dtype=jnp.float64):
    """Ajtai-type lattice basis: diagonal β_j = round(2^{(2n−j+1)^α}), strict
    upper triangle uniform in [0, β_j/2) (reference
    ``random/lattice/AjtaiTypeBasis.cpp``)."""
    import jax
    j = jnp.arange(n).astype(dtype)
    beta = jnp.round(2.0 ** ((2.0 * n - j + 1.0) ** alpha))
    u = jax.random.uniform(rng.next_key(), (n, n), dtype)
    upper = jnp.triu(u * (beta[None, :] / 2.0), k=1)
    return jnp.diag(beta) + upper


def knapsack_type_basis(n, radius, dtype=jnp.float64):
    """Knapsack-type lattice basis: (n+1)×n with identity on top and a
    rounded-uniform bottom row (reference
    ``random/lattice/KnapsackTypeBasis.cpp``)."""
    bottom = jnp.round(rng.uniform((1, n), dtype, 0.0, radius))
    return jnp.concatenate([jnp.eye(n, dtype=dtype), bottom], axis=0)
