"""BLAS-like level 2 (reference ``src/blas_like/level2``): Gemv, Ger, Geru,
Hemv, Symv, Her, Her2, Syr, Syr2, Trmv, Trsv, ApplyGivensSequence.

Distributed Gemv in the reference routes through [MC,MR]·[MR,*] partial sums
(``Gemv.cpp:20-148``); here the same contraction is a sharded matvec — GSPMD
inserts the row-sum (psum over 'mr').
"""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp

from ..core.distmatrix import DistMatrix, as_array, like
from .level3 import _orient, trsm

Arr = Union[jnp.ndarray, DistMatrix]


def gemv(orient: str, alpha, A: Arr, x: Arr, beta=0, y: Arr = None) -> Arr:
    a = _orient(as_array(A), orient)
    xv = as_array(x).ravel()
    out = alpha * (a @ xv)
    if y is not None:
        out = out + beta * as_array(y).ravel()
        return like(y, out)
    return out


def ger(alpha, x: Arr, y: Arr, A: Arr) -> Arr:
    """A += α·x·yᴴ (reference ``Ger``)."""
    xv, yv = as_array(x).ravel(), as_array(y).ravel()
    return like(A, as_array(A) + alpha * jnp.outer(xv, jnp.conj(yv)))


def geru(alpha, x: Arr, y: Arr, A: Arr) -> Arr:
    xv, yv = as_array(x).ravel(), as_array(y).ravel()
    return like(A, as_array(A) + alpha * jnp.outer(xv, yv))


def _sym_full(a, uplo, conjugate):
    tri = jnp.tril(a) if uplo.upper().startswith("L") else jnp.triu(a)
    opp = jnp.conj(tri.T) if conjugate else tri.T
    d = jnp.real(jnp.diagonal(tri)) if conjugate else jnp.diagonal(tri)
    return tri + opp - jnp.diag(d.astype(a.dtype))


def symv(uplo: str, alpha, A: Arr, x: Arr, beta=0, y: Arr = None) -> Arr:
    full = _sym_full(as_array(A), uplo, False)
    out = alpha * (full @ as_array(x).ravel())
    if y is not None:
        out = out + beta * as_array(y).ravel()
        return like(y, out)
    return out


def hemv(uplo: str, alpha, A: Arr, x: Arr, beta=0, y: Arr = None) -> Arr:
    full = _sym_full(as_array(A), uplo, True)
    out = alpha * (full @ as_array(x).ravel())
    if y is not None:
        out = out + beta * as_array(y).ravel()
        return like(y, out)
    return out


def _tri_update(A, upd, uplo):
    a = as_array(A)
    if uplo.upper().startswith("L"):
        return like(A, a + jnp.tril(upd))
    return like(A, a + jnp.triu(upd))


def syr(uplo: str, alpha, x: Arr, A: Arr) -> Arr:
    xv = as_array(x).ravel()
    return _tri_update(A, alpha * jnp.outer(xv, xv), uplo)


def her(uplo: str, alpha, x: Arr, A: Arr) -> Arr:
    xv = as_array(x).ravel()
    return _tri_update(A, alpha * jnp.outer(xv, jnp.conj(xv)), uplo)


def syr2(uplo: str, alpha, x: Arr, y: Arr, A: Arr) -> Arr:
    xv, yv = as_array(x).ravel(), as_array(y).ravel()
    upd = alpha * (jnp.outer(xv, yv) + jnp.outer(yv, xv))
    return _tri_update(A, upd, uplo)


def her2(uplo: str, alpha, x: Arr, y: Arr, A: Arr) -> Arr:
    xv, yv = as_array(x).ravel(), as_array(y).ravel()
    upd = (alpha * jnp.outer(xv, jnp.conj(yv))
           + jnp.conj(alpha) * jnp.outer(yv, jnp.conj(xv)))
    return _tri_update(A, upd, uplo)


def trmv(uplo: str, orient: str, diag: str, A: Arr, x: Arr) -> Arr:
    a = as_array(A)
    tri = jnp.tril(a) if uplo.upper().startswith("L") else jnp.triu(a)
    if diag.upper().startswith("U"):
        tri = tri - jnp.diag(jnp.diagonal(tri)) + jnp.eye(
            tri.shape[0], dtype=tri.dtype)
    return like(x, _orient(tri, orient) @ as_array(x).ravel())


def trsv(uplo: str, orient: str, diag: str, A: Arr, x: Arr) -> Arr:
    sol = trsm("L", uplo, orient, diag, 1, A, as_array(x).reshape(-1, 1))
    return like(x, as_array(sol).ravel())


def apply_givens_sequence(side: str, c, s, A: Arr) -> Arr:
    """Apply a sequence of Givens rotations G_i acting on rows (i, i+1)
    (reference ``ApplyGivensSequence``)."""
    a = as_array(A)
    c = jnp.asarray(c)
    s = jnp.asarray(s)
    left = side.upper().startswith("L")
    import jax

    def body(i, acc):
        if left:
            r0, r1 = acc[i], acc[i + 1]
            acc = acc.at[i].set(c[i] * r0 + s[i] * r1)
            acc = acc.at[i + 1].set(-jnp.conj(s[i]) * r0 + c[i] * r1)
        else:
            c0, c1 = acc[:, i], acc[:, i + 1]
            acc = acc.at[:, i].set(c[i] * c0 + s[i] * c1)
            acc = acc.at[:, i + 1].set(-jnp.conj(s[i]) * c0 + c[i] * c1)
        return acc

    out = jax.lax.fori_loop(0, c.shape[0], body, a)
    return like(A, out)
