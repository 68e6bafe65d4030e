"""Condensed forms (reference ``src/lapack_like/condense``: HermitianTridiag,
Bidiag, Hessenberg + ApplyQ).

TPU-native note: the reference's blocked two-sided reductions are
communication-heavy panel algorithms (``HermitianTridiag.cpp:86-94`` square-grid
variant).  Here each reduction is a ``fori_loop`` of masked Householder
similarity updates — static shapes, rank-2 updates as outer products the VPU
fuses; a blocked (latency-optimal) variant is a later optimisation since the
eigensolver hot path (``hermitian_eig``) uses XLA's fused ``eigh``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp

from ..core.distmatrix import DistMatrix, as_array

Arr = Union[jnp.ndarray, DistMatrix]


class Tridiag(NamedTuple):
    d: jnp.ndarray        # main diagonal (real)
    e: jnp.ndarray        # sub-diagonal (real)
    q: jnp.ndarray        # accumulated unitary (A = Q T Qᴴ)


def hermitian_tridiag(uplo: str, A: Arr, want_q: bool = True,
                      blocksize: int = 32) -> Tridiag:
    """Reduce Hermitian A to real symmetric tridiagonal T = Qᴴ A Q
    (reference ``HermitianTridiag``).  Dispatches to the blocked panel
    variant (``HermitianTridiag.cpp:86-94`` analog: latrd panels + rank-2nb
    MXU trailing updates) for n ≥ 192; small problems use the rank-2
    ``fori_loop``."""
    a0 = as_array(A)
    if a0.shape[0] >= 192:
        return _hermitian_tridiag_blocked(uplo, a0, nb=blocksize)
    a = a0
    if not uplo.upper().startswith("L"):
        a = jnp.conj(a.T)
    n = a.shape[0]
    q0 = jnp.eye(n, dtype=a.dtype)

    def body(k, state):
        a, q = state
        rows = jnp.arange(n)
        x = jnp.where(rows > k, a[:, k], 0.0)
        normx = jnp.linalg.norm(x)
        pivot = x[k + 1]
        # phase that makes the new subdiagonal entry real negative-free
        absp = jnp.abs(pivot)
        phase = jnp.where(absp == 0, jnp.ones((), a.dtype), pivot / absp)
        v = x.at[k + 1].add(phase * normx)
        vnorm2 = jnp.sum(jnp.abs(v) ** 2)
        tau = jnp.where(vnorm2 == 0, 0.0, 2.0 / vnorm2).astype(a.dtype)
        # similarity: a ← (I − τ v vᴴ) a (I − τ v vᴴ)
        w = tau * (a @ v)
        # correction for two-sided: w ← w − (τ/2)(vᴴ w) v
        w = w - (tau / 2) * jnp.vdot(v, w) * v
        a = a - jnp.outer(v, jnp.conj(w)) - jnp.outer(w, jnp.conj(v))
        q = q - tau * jnp.outer(q @ v, jnp.conj(v))
        return (a, q)

    if n > 2:
        a, q = jax.lax.fori_loop(0, n - 2, body, (a, q0))
    else:
        q = q0
    d = jnp.real(jnp.diagonal(a))
    sub = jnp.diagonal(a, -1)
    if jnp.issubdtype(a.dtype, jnp.complexfloating):
        # absorb subdiagonal phases into a diagonal unitary: T ← Dᴴ T D with
        # D_{j+1} = φ_j D_j so the tridiagonal becomes real (LAPACK zhetrd
        # convention); fold D into Q.
        absd = jnp.abs(sub)
        phases = jnp.where(absd == 0, jnp.ones_like(sub), sub / absd)
        dscale = jnp.concatenate([jnp.ones((1,), a.dtype),
                                  jnp.cumprod(phases)])
        q = q * dscale[None, :]
        e = absd
    else:
        e = jnp.real(sub)
    return Tridiag(d, e, q)


def _hermitian_tridiag_blocked(uplo: str, a: jnp.ndarray,
                               nb: int = 32) -> Tridiag:
    """Blocked Householder tridiagonalization (reference
    ``HermitianTridiag.cpp:86-94`` panel algorithm, LAPACK ``latrd`` shape):
    per nb-column panel, each column's reflector is computed against the
    implicitly-updated matrix A − V·Wᴴ − W·Vᴴ (small corrections on the
    VPU); the trailing similarity update is then applied as ONE rank-2nb
    matmul pair on the MXU, and Q is formed at the end by compact-WY block
    reflector application (two matmuls per panel) — the MXU does the
    O(n³) work the rank-1 loop spent in n² outer products."""
    if not uplo.upper().startswith("L"):
        a = jnp.conj(a.T)
    n = a.shape[0]
    dtype = a.dtype
    npan = max(1, -(-max(n - 2, 0) // nb))
    rows = jnp.arange(n)

    def panel(p, carry):
        a, Vall, taus = carry
        j0 = p * nb
        V = jnp.zeros((n, nb), dtype)
        W = jnp.zeros((n, nb), dtype)

        def col(j, st):
            a, V, W, Vall, taus = st
            k = j0 + j
            elim = k < n - 2
            # implicit column k of A − VWᴴ − WVᴴ (panel-local correction)
            colk = (a[:, k] - V @ jnp.conj(W[k, :]) - W @ jnp.conj(V[k, :]))
            x = jnp.where((rows > k) & elim, colk, 0.0)
            normx = jnp.linalg.norm(x)
            pivot = x[k + 1] if n > 1 else x[0]
            absp = jnp.abs(pivot)
            phase = jnp.where(absp == 0, jnp.ones((), dtype), pivot / absp)
            v = x.at[jnp.minimum(k + 1, n - 1)].add(
                jnp.where(elim, phase * normx, 0.0))
            vnorm2 = jnp.sum(jnp.abs(v) ** 2)
            tau = jnp.where((vnorm2 == 0) | ~elim, 0.0,
                            2.0 / jnp.where(vnorm2 == 0, 1.0, vnorm2)
                            ).astype(dtype)
            # w = τ·(A − VWᴴ − WVᴴ)·v, then the two-sided correction
            w = tau * (a @ v - V @ (jnp.conj(W.T) @ v)
                       - W @ (jnp.conj(V.T) @ v))
            w = w - (tau / 2) * jnp.vdot(v, w) * v
            V = V.at[:, j].set(v)
            W = W.at[:, j].set(w)
            Vall = Vall.at[:, k].set(v)
            taus = taus.at[k].set(tau)
            return (a, V, W, Vall, taus)

        a, V, W, Vall, taus = jax.lax.fori_loop(
            0, nb, col, (a, V, W, Vall, taus))
        # trailing rank-2nb similarity update on the MXU
        a = a - V @ jnp.conj(W.T) - W @ jnp.conj(V.T)
        return (a, Vall, taus)

    Vall0 = jnp.zeros((n, npan * nb), dtype)
    taus0 = jnp.zeros((npan * nb,), dtype)
    a, Vall, taus = jax.lax.fori_loop(0, npan, panel, (a, Vall0, taus0))

    # form Q by compact-WY per panel: Q ← Q − (Q·V)·T·Vᴴ, T from
    # T⁻¹ = diag(1/τ) + strict_upper(VᴴV) (τ=0 columns are exact no-ops)
    q = jnp.eye(n, dtype=dtype)

    def apply_panel(p, q):
        V = jax.lax.dynamic_slice_in_dim(Vall, p * nb, nb, 1)
        t = jax.lax.dynamic_slice_in_dim(taus, p * nb, nb, 0)
        M = jnp.conj(V.T) @ V
        inv_t = jnp.where(t == 0, 1.0, 1.0 / jnp.where(t == 0, 1.0, t))
        Tinv = jnp.triu(M, 1) + jnp.diag(inv_t)
        T = jax.lax.linalg.triangular_solve(
            Tinv, jnp.eye(nb, dtype=dtype), left_side=True, lower=False)
        return q - (q @ V) @ T @ jnp.conj(V.T)

    q = jax.lax.fori_loop(0, npan, apply_panel, q)

    d = jnp.real(jnp.diagonal(a))
    sub = jnp.diagonal(a, -1)
    if jnp.issubdtype(dtype, jnp.complexfloating):
        absd = jnp.abs(sub)
        phases = jnp.where(absd == 0, jnp.ones_like(sub), sub / absd)
        dscale = jnp.concatenate([jnp.ones((1,), dtype),
                                  jnp.cumprod(phases)])
        q = q * dscale[None, :]
        e = absd
    else:
        e = jnp.real(sub)
    return Tridiag(d, e, q)


class Bidiag(NamedTuple):
    d: jnp.ndarray
    e: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray


def bidiag(A: Arr) -> Bidiag:
    """Reduce A (m≥n) to upper bidiagonal B = Uᴴ A V (reference ``Bidiag``)."""
    a = as_array(A)
    m, n = a.shape
    u = jnp.eye(m, dtype=a.dtype)
    v = jnp.eye(n, dtype=a.dtype)

    def left_reflect(a, u, k):
        x = jnp.where(jnp.arange(m) >= k, a[:, k], 0.0)
        normx = jnp.linalg.norm(x)
        pivot = x[k]
        absp = jnp.abs(pivot)
        phase = jnp.where(absp == 0, jnp.ones((), a.dtype), pivot / absp)
        w = x.at[k].add(phase * normx)
        wn = jnp.sum(jnp.abs(w) ** 2)
        tau = jnp.where(wn == 0, 0.0, 2.0 / wn).astype(a.dtype)
        a = a - tau * jnp.outer(w, jnp.conj(w) @ a)
        u = u - tau * jnp.outer(u @ w, jnp.conj(w))
        return a, u

    def right_reflect(a, v, k):
        x = jnp.where(jnp.arange(n) > k, jnp.conj(a[k, :]), 0.0)
        normx = jnp.linalg.norm(x)
        pivot = x[k + 1]
        absp = jnp.abs(pivot)
        phase = jnp.where(absp == 0, jnp.ones((), a.dtype), pivot / absp)
        w = x.at[k + 1].add(phase * normx)
        wn = jnp.sum(jnp.abs(w) ** 2)
        tau = jnp.where(wn == 0, 0.0, 2.0 / wn).astype(a.dtype)
        a = a - tau * jnp.outer(a @ jnp.conj(w), w)
        v = v - tau * jnp.outer(v @ jnp.conj(w), w)
        return a, v

    def body(k, state):
        a, u, v = state
        a, u = left_reflect(a, u, k)
        a, v = jax.lax.cond(k < n - 2,
                            lambda ops: right_reflect(ops[0], ops[1], k),
                            lambda ops: (ops[0], ops[1]),
                            (a, v))
        return (a, u, v)

    a, u, v = jax.lax.fori_loop(0, n, body, (a, u, v))
    d = jnp.real(jnp.diagonal(a))
    e = jnp.real(jnp.diagonal(a, 1))
    return Bidiag(d, e, u, v)


class Hess(NamedTuple):
    h: jnp.ndarray
    q: jnp.ndarray


def hessenberg(uplo: str, A: Arr) -> Hess:
    """Reduce A to upper Hessenberg H = Qᴴ A Q (reference ``Hessenberg``)."""
    a = as_array(A)
    n = a.shape[0]
    q = jnp.eye(n, dtype=a.dtype)

    def body(k, state):
        a, q = state
        x = jnp.where(jnp.arange(n) > k, a[:, k], 0.0)
        normx = jnp.linalg.norm(x)
        pivot = x[k + 1]
        absp = jnp.abs(pivot)
        phase = jnp.where(absp == 0, jnp.ones((), a.dtype), pivot / absp)
        v = x.at[k + 1].add(phase * normx)
        vn = jnp.sum(jnp.abs(v) ** 2)
        tau = jnp.where(vn == 0, 0.0, 2.0 / vn).astype(a.dtype)
        a = a - tau * jnp.outer(v, jnp.conj(v) @ a)        # left
        a = a - tau * jnp.outer(a @ v, jnp.conj(v))        # right
        q = q - tau * jnp.outer(q @ v, jnp.conj(v))
        return (a, q)

    if n > 2:
        a, q = jax.lax.fori_loop(0, n - 2, body, (a, q))
    return Hess(a, q)
