"""Control-theoretic solvers (reference ``src/control`` + ``include/El/
control.hpp:17-60``: Lyapunov, Sylvester, Riccati via the matrix sign
function's spectral disection)."""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp

from ..core.distmatrix import DistMatrix, as_array, like
from ..lapack.funcs import sign as matrix_sign

Arr = Union[jnp.ndarray, DistMatrix]


def sylvester(A: Arr, B: Arr, C: Arr) -> Arr:
    """Solve A·X + X·B = C via the sign of W = [[A, −C], [0, −B]]
    (reference ``Sylvester``): sign(W) = [[I, −2X? ...]] — the (1,2) block of
    (sign(W) + I)/2 … concretely X = Y/2 where sign(W) = [[I, Y],[0, −I]].

    Requires spectra of A and −B separated by the imaginary axis (standard
    sign-function condition)."""
    a = as_array(A)
    b = as_array(B)
    c = as_array(C)
    m = a.shape[0]
    n = b.shape[0]
    W = jnp.block([[a, -c], [jnp.zeros((n, m), a.dtype), -b]])
    S = as_array(matrix_sign(W))
    # sign(W) = [[I, −2X], [0, −I]] under the similarity [[I, X],[0, I]]
    Y = S[:m, m:]
    return like(C, -Y / 2)


def lyapunov(A: Arr, C: Arr) -> Arr:
    """Solve A·X + X·Aᴴ = C (reference ``Lyapunov``) — Sylvester with
    B = Aᴴ."""
    a = as_array(A)
    return sylvester(A, jnp.conj(a.T), C)


def _symmetrize(M: jnp.ndarray, uplo: str) -> jnp.ndarray:
    """Fill the full Hermitian matrix from the given triangle (reference
    ``UpperOrLower`` convention of ``Riccati(uplo, A, K, L, X)``)."""
    tri = jnp.tril(M) if uplo.upper() == "L" else jnp.triu(M)
    off = jnp.tril(M, -1) if uplo.upper() == "L" else jnp.triu(M, 1)
    return tri + jnp.conj(off).T


def ricatti(*args) -> Arr:
    """Reference ``Riccati`` (``include/El/control.hpp:34-58``), both
    overloads:

    * ``ricatti(W)`` — W is the 2n×2n Hamiltonian [[A, −L], [−K, −Aᴴ]];
    * ``ricatti(uplo, A, K, L)`` — K, L Hermitian, stored in the ``uplo``
      triangle; solves the CARE AᴴX + XA + K − X·L·X = 0.

    Returns the stabilizing solution X extracted from the sign function's
    stable invariant subspace (same disection as the reference's
    sign-based ``Riccati``)."""
    if len(args) == 1:
        W = as_array(args[0])
        n = W.shape[0] // 2
        A = W[:n, :n]
        L = -W[:n, n:]
        K = -W[n:, :n]
        return ricatti_hamiltonian(A, K, L)
    uplo, A, K, L = args
    Kf = _symmetrize(as_array(K), uplo)
    Lf = _symmetrize(as_array(L), uplo)
    return ricatti_hamiltonian(A, like(A, Kf), like(A, Lf))


def ricatti_hamiltonian(A: Arr, K: Arr, L: Arr) -> Arr:
    """Solve AᴴX + XA + K − X·L·X = 0 (CARE; reference ``Ricatti``): sign of
    the Hamiltonian W = [[A, −L], [−K, −Aᴴ]], then the stable invariant
    subspace [[Y11],[Y21]] gives X = −Y21·Y11⁻¹ via least squares on
    (sign(W) + I)/2."""
    a = as_array(A)
    k = as_array(K)
    l = as_array(L)
    n = a.shape[0]
    W = jnp.block([[a, -l], [-k, -jnp.conj(a.T)]])
    S = as_array(matrix_sign(W))
    # stable subspace spans the kernel of (S + I): solve (S+I)[X; I]-shaped
    # system:  [[S11+I, S12],[S21, S22+I]] [X; I]… → S12·X = −(S11+I)… the
    # standard extraction: solve (S + I)·Z = 0 with Z = [I; X] ⇒
    # (S11 + I) + S12·X = 0 and S21 + (S22 + I)·X = 0; stack both.
    eye = jnp.eye(n, dtype=a.dtype)
    M = jnp.concatenate([S[:n, n:], S[n:, n:] + eye], axis=0)
    R = -jnp.concatenate([S[:n, :n] + eye, S[n:, :n]], axis=0)
    X, *_ = jnp.linalg.lstsq(M, R)
    return like(A, X)
