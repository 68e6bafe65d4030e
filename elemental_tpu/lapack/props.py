"""Matrix properties (reference ``src/lapack_like/props``: Norm family,
Condition, Determinant, Inertia, Trace)."""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp

from ..core.distmatrix import DistMatrix, as_array
from .lu import determinant as _lu_determinant
from .ldl import ldl, inertia as _ldl_inertia

Arr = Union[jnp.ndarray, DistMatrix]


def one_norm(A: Arr):
    return jnp.max(jnp.sum(jnp.abs(as_array(A)), axis=0))


def infinity_norm(A: Arr):
    return jnp.max(jnp.sum(jnp.abs(as_array(A)), axis=1))


def frobenius_norm(A: Arr):
    return jnp.linalg.norm(as_array(A).ravel())


def max_norm(A: Arr):
    return jnp.max(jnp.abs(as_array(A)))


def entrywise_norm(A: Arr, p: float = 1.0):
    return jnp.sum(jnp.abs(as_array(A)) ** p) ** (1.0 / p)


def two_norm_estimate(A: Arr, iters: int = 20):
    """Power iteration on AᴴA (reference ``TwoNormEstimate``)."""
    a = as_array(A)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (a.shape[1],), jnp.float32).astype(
        jnp.real(a).dtype if not jnp.issubdtype(a.dtype, jnp.complexfloating)
        else jnp.float32)
    x = x.astype(a.dtype) if not jnp.issubdtype(a.dtype, jnp.complexfloating) \
        else (x + 0j).astype(a.dtype)

    def body(i, x):
        y = jnp.conj(a.T) @ (a @ x)
        return y / jnp.linalg.norm(y)

    x = jax.lax.fori_loop(0, iters, body, x / jnp.linalg.norm(x))
    return jnp.linalg.norm(a @ x)


def two_norm(A: Arr):
    """Exact spectral norm via SVD (reference ``Norm(TWO_NORM)``)."""
    return jnp.max(jnp.linalg.svd(as_array(A), compute_uv=False))


def nuclear_norm(A: Arr):
    return jnp.sum(jnp.linalg.svd(as_array(A), compute_uv=False))


def schatten_norm(A: Arr, p: float):
    s = jnp.linalg.svd(as_array(A), compute_uv=False)
    return jnp.sum(s ** p) ** (1.0 / p)


def norm(A: Arr, kind: str = "frobenius"):
    kind = kind.lower()
    table = {
        "one": one_norm, "1": one_norm,
        "infinity": infinity_norm, "inf": infinity_norm,
        "frobenius": frobenius_norm, "fro": frobenius_norm,
        "max": max_norm,
        "two": two_norm, "2": two_norm,
        "nuclear": nuclear_norm,
    }
    return table[kind](A)


def condition(A: Arr, kind: str = "two"):
    """Condition number (reference ``Condition``)."""
    a = as_array(A)
    if kind == "two":
        s = jnp.linalg.svd(a, compute_uv=False)
        return jnp.max(s) / jnp.min(s)
    inv = jnp.linalg.inv(a)
    return norm(a, kind) * norm(inv, kind)


def determinant(A: Arr):
    return _lu_determinant(A)


def hpd_determinant(uplo: str, A: Arr):
    from .cholesky import cholesky
    L = as_array(cholesky(uplo, A))
    d = jnp.real(jnp.diagonal(L))
    return jnp.prod(d) ** 2


def log_det(A: Arr):
    """log|det| via LU — overflow-safe (reference SafeDeterminant shape)."""
    from .lu import lu as _lu
    fact = _lu(A)
    return jnp.sum(jnp.log(jnp.abs(jnp.diagonal(fact.lu))))


def inertia(A: Arr, conjugate: bool = True):
    """Sylvester inertia via LDL (reference ``Inertia``)."""
    return _ldl_inertia(ldl(A, conjugate=conjugate))


def trace(A: Arr):
    return jnp.trace(as_array(A))
