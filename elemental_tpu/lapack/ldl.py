"""Dense LDL factorizations (reference ``src/lapack_like/factor/LDL/dense/``
unpivoted + Bunch-Kaufman, and ``factor/RegularizedLDL/`` — the IPM KKT
workhorse with dynamic regularization + iterative refinement).

TPU-native: recursive blocked LDLᵀ/LDLᴴ (unit-lower L, diagonal D) — the same
midpoint recursion as Cholesky so the trailing update is one sharded MXU
matmul; the base case is a masked ``fori_loop``.  Pivoting is avoided the way
the reference's IPM does: *dynamic regularization* keeps the factorization
stable for quasi-definite KKT systems (reference ``RegularizedLDL`` +
``SolveAfter`` with refinement).
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax
import jax.numpy as jnp

from ..core.distmatrix import DistMatrix, as_array, like
from ..ops.level3 import trsm, with_precision

Arr = Union[jnp.ndarray, DistMatrix]

_BASE = 128


class LDL(NamedTuple):
    lower: jnp.ndarray  # unit-lower L (unit diagonal stored)
    diag: jnp.ndarray   # D as a vector


def _ldl_base(a: jnp.ndarray, conjugate: bool) -> jnp.ndarray:
    """Unblocked right-looking LDL; returns packed L\\D (L strictly-lower +
    D on the diagonal)."""
    n = a.shape[0]

    def body(k, a):
        d = a[k, k]
        col = a[:, k] / d
        lcol = jnp.where(jnp.arange(n) > k, col, 0.0)
        lrow = jnp.conj(lcol) if conjugate else lcol
        a = a - jnp.outer(lcol, lrow) * d
        a = a.at[:, k].set(jnp.where(jnp.arange(n) > k, col, a[:, k]))
        a = a.at[k, k].set(d)
        return a

    return jax.lax.fori_loop(0, n, body, a)


def _ldl_rec(a: jnp.ndarray, conjugate: bool) -> jnp.ndarray:
    n = a.shape[0]
    if n <= _BASE:
        return _ldl_base(a, conjugate)
    m = n // 2
    A11, A21, A22 = a[:m, :m], a[m:, :m], a[m:, m:]
    F11 = _ldl_rec(A11, conjugate)
    d1 = jnp.diagonal(F11)
    # L21 = A21 · L11⁻ᴴ · D1⁻¹
    adj = "C" if conjugate else "T"
    L21 = as_array(trsm("R", "L", adj, "U", 1, F11, A21)) / d1[None, :]
    L21d = L21 * d1[None, :]
    rhs = jnp.conj(L21.T) if conjugate else L21.T
    A22u = A22 - jnp.matmul(L21d, rhs, preferred_element_type=a.dtype)
    F22 = _ldl_rec(A22u, conjugate)
    top = jnp.concatenate([F11, jnp.zeros((m, n - m), a.dtype)], axis=1)
    bot = jnp.concatenate([L21, F22], axis=1)
    return jnp.concatenate([top, bot], axis=0)


@with_precision
def ldl(A: Arr, conjugate: bool = True) -> LDL:
    """Unpivoted LDLᴴ (conjugate=True) or LDLᵀ: A = L·D·Lᴴ with unit-lower L
    (reference dense ``LDL``, suitable for HPD/quasi-definite operands)."""
    packed = _ldl_rec(as_array(A), conjugate)
    d = jnp.diagonal(packed)
    n = packed.shape[0]
    lower = jnp.tril(packed, -1) + jnp.eye(n, dtype=packed.dtype)
    return LDL(lower, d)


@with_precision
def regularized_ldl(A: Arr, reg: jnp.ndarray,
                    conjugate: bool = False) -> LDL:
    """LDL of A + diag(reg) (reference ``RegularizedLDL``): the caller supplies
    signed per-row regularization (+δ² for primal rows, −γ² for dual rows in
    the IPM KKT system), making the quasi-definite factorization pivot-free."""
    a = as_array(A)
    a = a + jnp.diag(jnp.asarray(reg).astype(a.dtype))
    return ldl(a, conjugate)


def solve_after(fact: LDL, B: Arr, conjugate: bool = True) -> Arr:
    """X = A⁻¹B from an LDL factorization: L, D, then Lᴴ solves."""
    b = as_array(B)
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    y = as_array(trsm("L", "L", "N", "U", 1, fact.lower, b))
    y = y / fact.diag[:, None]
    adj = "C" if conjugate else "T"
    x = as_array(trsm("L", "L", adj, "U", 1, fact.lower, y))
    if squeeze:
        x = x[:, 0]
    return like(B, x)


def solve_after_refined(A: Arr, fact: LDL, B: Arr, conjugate: bool = False,
                        max_refine_iters: int = 8,
                        relative_tol: float = None) -> Arr:
    """Solve with iterative refinement against the *unregularized* A
    (reference ``reg_ldl::SolveAfter``, ``DistSparseLDLFactorization.cpp:264``):
    x ← x + A⁻̃¹(b − A·x) until the residual stalls."""
    a = as_array(A)
    b = as_array(B)
    squeeze = b.ndim == 1
    bb = b[:, None] if squeeze else b
    x = as_array(solve_after(fact, bb, conjugate))

    def body(i, x):
        r = bb - a @ x
        dx = as_array(solve_after(fact, r, conjugate))
        return x + dx

    x = jax.lax.fori_loop(0, max_refine_iters, body, x)
    if squeeze:
        x = x[:, 0]
    return like(B, x)


def inertia(fact: LDL):
    """(num positive, num negative, num zero) eigen-signs from D (reference
    ``props/Inertia`` via LDL)."""
    d = jnp.real(fact.diag)
    return (jnp.sum(d > 0), jnp.sum(d < 0), jnp.sum(d == 0))
