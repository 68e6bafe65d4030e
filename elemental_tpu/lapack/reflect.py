"""Householder reflectors (reference ``src/lapack_like/reflect``: form/apply
packed reflector products, expand, hyperbolic variants)."""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp

from ..core.distmatrix import DistMatrix, as_array, like

Arr = Union[jnp.ndarray, DistMatrix]


def householder(x) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Compute (v, tau, beta) with (I − τ v vᴴ) x = β e₁, v[0] = 1
    (reference ``reflect/Householder``)."""
    x = as_array(x).ravel()
    alpha = x[0]
    xnorm = jnp.linalg.norm(x)
    absa = jnp.abs(alpha)
    phase = jnp.where(absa == 0, jnp.ones((), x.dtype), alpha / absa)
    beta = -phase * xnorm
    denom = alpha - beta
    safe = jnp.where(denom == 0, 1.0, denom)
    v = x / safe
    v = v.at[0].set(1.0)
    # standard LAPACK tau: τ = (β − α)/β
    tau = jnp.where(xnorm == 0, jnp.zeros((), x.dtype), (beta - alpha) / beta)
    return v, tau, beta


def apply_packed_reflectors(side: str, uplo: str, order: str, packed: Arr,
                            taus, B: Arr, offset: int = 0) -> Arr:
    """Apply a product of Householder reflectors stored column-wise in the
    (strict) lower triangle of ``packed`` (reference ``ApplyPackedReflectors``).
    Uses the explicit compact product — reflectors applied in sequence via a
    scan."""
    a = as_array(packed)
    b = as_array(B)
    taus = jnp.asarray(taus)
    m = a.shape[0]
    k = taus.shape[0]
    left = side.upper().startswith("L")
    forward = order.upper().startswith("F")

    def apply_one(b, j):
        col = a[:, j]
        v = jnp.where(jnp.arange(m) > j, col, 0.0).at[j].set(1.0)
        tau = taus[j]
        if left:
            b = b - tau * jnp.outer(v, jnp.conj(v) @ b)
        else:
            b = b - tau * jnp.outer(b @ v, jnp.conj(v))
        return b, None

    idx = jnp.arange(k) if forward else jnp.arange(k)[::-1]
    b, _ = jax.lax.scan(apply_one, b, idx)
    return like(B, b)


def expand_packed_reflectors(packed: Arr, taus) -> jnp.ndarray:
    """Form the explicit unitary Q from packed reflectors (reference
    ``ExpandPackedReflectors``)."""
    a = as_array(packed)
    return jax.lax.linalg.householder_product(a, jnp.asarray(taus))


def hyperbolic_reflector(x) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Hyperbolic reflector for the signature (1, −1, ..., −1): maps x to
    ±√(x₀² − ‖x₁:‖²) e₁ (reference ``reflect/Hyperbolic``)."""
    x = as_array(x).ravel()
    alpha = jnp.real(x[0])
    rest2 = jnp.sum(jnp.abs(x[1:]) ** 2)
    beta2 = alpha ** 2 - rest2
    beta = jnp.sign(alpha) * jnp.sqrt(jnp.maximum(beta2, 0.0))
    denom = alpha - beta
    safe = jnp.where(denom == 0, 1.0, denom)
    v = x / safe
    v = v.at[0].set(1.0)
    tau = jnp.where(beta2 <= 0, 0.0, (beta - alpha) / beta)
    return v, tau.astype(x.dtype), beta.astype(x.dtype)
