"""Multifrontal numeric factorization + tree solves (reference
``src/lapack_like/factor/LDL/sparse/numeric``: ``Process.hpp:150-275``
extend-add, ``ProcessFront.hpp:29-60`` dense front kernel,
``LowerSolve/Forward.hpp:77-183`` tree solves).

TPU-native design: the elimination tree is processed **level by level**
(height-bucketed).  Each level is a fixed-shape batch of padded fronts living
in one flat device pool; per level the executor runs

  1. extend-add: one gather + scatter-add of every child Schur complement
     (the reference's ``SparseAllToAll`` pack/unpack becomes two indexed ops),
  2. a vmapped masked *partial* LDL of all fronts in the level (rank-1 VPU
     updates under a ``fori_loop``; the Schur complement is left in place),

so the whole factorization is ~``num_levels`` fused XLA steps regardless of
supernode count, and re-factorization with new values
(``ChangeNonzeroValues``) reuses every plan.  Solves use the padded-unit
trick: extending the partial factor with an identity trailing block makes one
batched ``triangular_solve`` per level perform both the panel solve and the
update accumulation.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .symbolic import SymbolicFactorization


def _masked_partial_ldl(F: jnp.ndarray, ns: jnp.ndarray, max_ns: int,
                        conjugate: bool, reg: Optional[jnp.ndarray] = None,
                        reg_rows: Optional[jnp.ndarray] = None):
    """Eliminate the first ``ns`` columns of the padded front F (S×S lower),
    leaving L (unit, scaled) in the panel, D on the diagonal, and the Schur
    complement in the trailing block."""
    S = F.shape[0]
    idx = jnp.arange(S)

    def body(k, F):
        elim = k < ns
        dk = F[k, k]
        safe = jnp.where(dk == 0, jnp.ones((), F.dtype), dk)
        col = jnp.where((idx > k) & elim, F[:, k] / safe, 0.0)
        row = jnp.conj(col) if conjugate else col
        F = F - jnp.outer(col, row) * dk
        F = F.at[:, k].set(jnp.where((idx > k) & elim, col, F[:, k]))
        F = F.at[k, k].set(dk)
        return F

    return jax.lax.fori_loop(0, max_ns, body, F)


@dataclasses.dataclass
class LDLFactorization:
    """Numeric factor state (reference ``(Dist)SparseLDLFactorization``
    facade, ``numeric.hpp:550``)."""

    symb: SymbolicFactorization
    pool: jnp.ndarray            # flat packed fronts (L panels + Schur)
    d: jnp.ndarray               # (n,) pivots in permuted order
    conjugate: bool

    # -- solves -------------------------------------------------------------
    def solve(self, b) -> jnp.ndarray:
        symb = self.symb
        n = symb.n
        x = jnp.asarray(b)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[:, None]
        k = x.shape[1]
        perm = jnp.asarray(symb.perm)
        # x extended with a dummy row absorbing padded scatter traffic
        xe = jnp.concatenate([x[perm], jnp.zeros((1, k), x.dtype)], axis=0)

        # forward: ascending levels
        for lev in symb.levels:
            xe = self._level_solve(xe, lev, forward=True)
        # diagonal
        xe = xe.at[:n].set(xe[:n] / self.d[:, None].astype(xe.dtype))
        # backward: descending levels
        for lev in reversed(symb.levels):
            xe = self._level_solve(xe, lev, forward=False)

        iperm = jnp.asarray(symb.iperm)
        out = xe[:n][iperm]
        return out[:, 0] if squeeze else out

    def _level_fronts(self, lev):
        nf = lev.sn_ids.shape[0]
        S = lev.front_size
        seg = jax.lax.dynamic_slice_in_dim(self.pool, lev.offset,
                                           nf * S * S, 0)
        return seg.reshape(nf, S, S)

    def _level_solve(self, xe, lev, forward: bool):
        nf = lev.sn_ids.shape[0]
        S = lev.front_size
        fronts = self._level_fronts(lev)
        idx = jnp.arange(S)
        colmask = idx[None, None, :] < jnp.asarray(lev.ns)[:, None, None]
        eye = jnp.eye(S, dtype=fronts.dtype)
        lp = jnp.where(colmask & (idx[None, :, None] > idx[None, None, :]),
                       fronts, 0.0) + eye[None]
        rows = jnp.asarray(lev.front_rows)                 # (nf, S)
        xf = xe[rows]                                      # (nf, S, k)
        w = jax.lax.linalg.triangular_solve(
            lp, xf, left_side=True, lower=True, unit_diagonal=True,
            transpose_a=not forward, conjugate_a=(not forward)
            and self.conjugate)
        delta = w - xf
        return xe.at[rows.reshape(-1)].add(
            delta.reshape(-1, delta.shape[-1]))

    def solve_with_iterative_refinement(self, A_apply, b, iters: int = 6):
        """x ← x + F⁻¹(b − A·x) (reference
        ``SolveWithIterativeRefinement``, ``DistSparseLDLFactorization.cpp:264``)."""
        b = jnp.asarray(b)
        x = self.solve(b)

        def body(i, x):
            r = b - A_apply(x)
            return x + self.solve(r)

        return jax.lax.fori_loop(0, iters, body, x)

    # -- products ------------------------------------------------------------
    def multiply_with_l(self, x, adjoint: bool = False) -> jnp.ndarray:
        """y = L·x (or Lᴴ·x) in permuted order (reference ``MultiplyWithL``
        — used by the solver's residual diagnostics)."""
        xe = jnp.asarray(x)
        squeeze = xe.ndim == 1
        if squeeze:
            xe = xe[:, None]
        xe = jnp.concatenate([xe, jnp.zeros((1, xe.shape[1]), xe.dtype)], 0)
        # y = x + Σ_panels (L−I)_panel·x — panel contributions are linear in
        # the ORIGINAL x (columns are disjoint across supernodes), so deltas
        # accumulate into a separate output
        ye = xe
        for lev in self.symb.levels:
            nf = lev.sn_ids.shape[0]
            S = lev.front_size
            fronts = self._level_fronts(lev)
            idx = jnp.arange(S)
            colmask = idx[None, None, :] < jnp.asarray(
                lev.ns)[:, None, None]
            eye = jnp.eye(S, dtype=fronts.dtype)
            lp = jnp.where(colmask
                           & (idx[None, :, None] > idx[None, None, :]),
                           fronts, 0.0) + eye[None]
            if adjoint:
                lp = jnp.conj(jnp.swapaxes(lp, -1, -2)) if self.conjugate \
                    else jnp.swapaxes(lp, -1, -2)
            rows = jnp.asarray(lev.front_rows)
            xf = xe[rows]
            yf = jnp.einsum("fij,fjk->fik", lp, xf)
            ye = ye.at[rows.reshape(-1)].add(
                (yf - xf).reshape(-1, xf.shape[-1]))
        out = ye[:self.symb.n]
        return out[:, 0] if squeeze else out

    def inertia(self):
        d = jnp.real(self.d)
        return (jnp.sum(d > 0), jnp.sum(d < 0), jnp.sum(d == 0))


def factor(symb: SymbolicFactorization, a_vals, conjugate: bool = False,
           reg: Optional[np.ndarray] = None,
           dtype=jnp.float64) -> LDLFactorization:
    """Numeric multifrontal LDL given the symbolic plan and A's values
    (+ optional diagonal regularization in *original* order, the
    ``RegularizedLDL`` path)."""
    a_vals = jnp.asarray(a_vals, dtype)
    pool = jnp.zeros((symb.pool_size,), dtype)

    # assemble every level's A entries up front (independent of elimination)
    for lev in symb.levels:
        if lev.asm_dst.size:
            pool = pool.at[jnp.asarray(lev.asm_dst)].add(
                a_vals[jnp.asarray(lev.asm_src)])
        if reg is not None and lev.diag_dst.size:
            regp = jnp.asarray(reg, dtype)[jnp.asarray(symb.perm)]
            pool = pool.at[jnp.asarray(lev.diag_dst)].add(
                regp[jnp.asarray(lev.diag_cols)])

    d = jnp.zeros((symb.n,), dtype)
    for lev in symb.levels:
        nf = lev.sn_ids.shape[0]
        S = lev.front_size
        if lev.child_dst.size:
            pool = pool.at[jnp.asarray(lev.child_dst)].add(
                pool[jnp.asarray(lev.child_src)])
        seg = jax.lax.dynamic_slice_in_dim(pool, lev.offset, nf * S * S, 0)
        fronts = seg.reshape(nf, S, S)
        max_ns = int(lev.ns.max())
        fronts = jax.vmap(
            lambda F, ns: _masked_partial_ldl(F, ns, max_ns, conjugate)
        )(fronts, jnp.asarray(lev.ns))
        pool = jax.lax.dynamic_update_slice_in_dim(
            pool, fronts.reshape(-1), lev.offset, 0)
        d = d.at[jnp.asarray(lev.diag_cols)].set(
            pool[jnp.asarray(lev.diag_dst)])

    return LDLFactorization(symb, pool, d, conjugate)
