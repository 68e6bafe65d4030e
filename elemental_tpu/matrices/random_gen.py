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
