"""Measured experiment: the at-scale tree-SOLVE path (EXPERIMENTS §E5.7).

E5.4 measured that ~95 % of the n=10⁵ IPM iteration is tree-solves
(527.9 ms/solve at N=150,528, k=1) — InvertDiagBlocks staging plus the
serialized ``lax.map`` chunks, not arithmetic (pool traffic alone is
~5 ms at HBM speed).  This probe measures the r5 fix: precompute the
per-level panel inverses once per factor (``LDLFactorization.
solve_context``) and apply them as batched matmuls.

Run (TPU):  python experiments/solve_path.py [--n1 224]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402

from lp_direct_large import concat_fd_2d                # noqa: E402
from elemental_tpu.optimization.lp import (_build_lp_kkt,   # noqa: E402
                                           sparse_ruiz)
from elemental_tpu.sparse_direct.numeric import (           # noqa: E402
    LDLFactorization)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n1", type=int, default=224)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--theta-ones", action="store_true")
    args = ap.parse_args()

    A = concat_fd_2d(args.n1, args.n1)
    A, _, _ = sparse_ruiz(A)
    m, n = A.shape
    N = m + n
    gamma = float(30 * np.sqrt(np.finfo(np.float32).eps))
    t0 = time.perf_counter()
    kkt, _slot = _build_lp_kkt(A, gamma, gamma, None)
    print(f"N={N}  symbolic+plans {time.perf_counter() - t0:.1f}s  "
          f"pool_elems={kkt.symb.pool_size if hasattr(kkt.symb, 'pool_size') else '?'}")

    # spread θ (E5.3's IPM regime — the preconditioner-quality stressor),
    # switchable to ones via --theta-ones
    if args.theta_ones:
        theta = jnp.ones(n, jnp.float32)
    else:
        theta = jnp.asarray(10.0 ** np.random.default_rng(1).uniform(
            -3, 3, n).astype(np.float32))
    reg_diag = jnp.concatenate([jnp.full(n, gamma, jnp.float32),
                                jnp.full(m, -gamma, jnp.float32)])
    jfactor = jax.jit(lambda kkt, th: kkt.prepare(kkt.assemble([th])))
    t0 = time.perf_counter()
    fact = jfactor(kkt, theta)
    jax.block_until_ready(fact.pool)
    print(f"factor compile+run {time.perf_counter() - t0:.1f}s  "
          f"pool {fact.pool.size * fact.pool.dtype.itemsize / 1e9:.2f} GB")

    rhs = jnp.asarray(
        np.random.default_rng(0).standard_normal(N).astype(np.float32))

    def timeit(f, *a, reps=3):
        jax.block_until_ready(f(*a))
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*a))
            best = min(best, time.perf_counter() - t0)
        return best

    # 1. plain k=1 solve (the r4/r5-pre path)
    jplain = jax.jit(lambda fact, r: fact.solve(r))
    t_plain = timeit(jplain, fact, rhs)
    print(f"plain solve (chunked tri):      {t_plain * 1e3:8.1f} ms")

    # 2. context build (once per factor)
    def build_ctx(fact):
        return LDLFactorization(fact.sys.symb, fact.pool, fact.d,
                                False).solve_context()
    jctx = jax.jit(build_ctx)
    t_ctx = timeit(jctx, fact)
    ctx = jctx(fact)
    ctx_gb = sum(c.size * c.dtype.itemsize for c in ctx) / 1e9
    print(f"solve_context build:            {t_ctx * 1e3:8.1f} ms  "
          f"({ctx_gb:.2f} GB)")

    # 3. ctx solve
    jc = jax.jit(lambda fact, r, ctx: fact.solve(r, ctx))
    t_ctxsolve = timeit(jc, fact, rhs, ctx)
    print(f"ctx solve (batched matmuls):    {t_ctxsolve * 1e3:8.1f} ms  "
          f"({t_plain / t_ctxsolve:.1f}x)")
    # residual parity
    x_p = jplain(fact, rhs)
    x_c = jc(fact, rhs, ctx)
    kx_p = fact.sys.matvec(fact.vals, np.asarray(x_p))
    kx_c = fact.sys.matvec(fact.vals, np.asarray(x_c))
    rn = float(jnp.linalg.norm(rhs))
    print(f"rel resid  plain {float(jnp.linalg.norm(rhs - kx_p)) / rn:.2e}"
          f"  ctx {float(jnp.linalg.norm(rhs - kx_c)) / rn:.2e}")

    # 4. one FGMRES sweep (solve_refined, hoisted ctx inside), vs the
    # substitution-path sweep (ctx gate lifted via UNROLL_MAX_N)
    def sweep_stats(label):
        jref = jax.jit(lambda fact, rd, r: fact.solve_refined(
            r, rd, iters=args.iters, unroll=False))
        t_ref = timeit(jref, fact, reg_diag, rhs)
        sol = jref(fact, reg_diag, rhs)
        kx = fact.sys.matvec(fact.vals, sol) - reg_diag * sol
        rr = float(jnp.linalg.norm(rhs - kx)) / rn
        print(f"FGMRES-{args.iters} sweep [{label}]: "
              f"{t_ref * 1e3:8.1f} ms   rel resid {rr:.2e}")

    sweep_stats("ctx" if N > type(fact).UNROLL_MAX_N else "plain")
    if N > type(fact).UNROLL_MAX_N:
        saved = type(fact).UNROLL_MAX_N
        type(fact).UNROLL_MAX_N = 10 ** 9
        try:
            sweep_stats("plain")
        finally:
            type(fact).UNROLL_MAX_N = saved


if __name__ == "__main__":
    main()
