"""At-scale sparse IPM demonstration (mirror of
``examples/interface/LPDirect.py:70-115`` on the ConcatFD2D operator).

Solves  min cᵀx  s.t.  A·x = b, x ≥ 0  where A = [FD₁ FD₂] stacks two 2-D
finite-difference blocks (m = n1², n = 2·n1² variables) — every IPM
iteration re-factors the fixed-pattern KKT with the level-batched
multifrontal RegularizedLDL (symbolic reused, ``ChangeNonzeroValues``).

At-scale invocation (n = 10⁵ variables, the round-1 done-criterion):

    python examples/lp_direct_large.py --n1 224

Reports wall-clock per IPM iteration and the multifrontal factor GFlop
estimate (reference ``LocalFactorGFlops``, ``SparseLDL.cpp:143-169``).

Captured r5 on the machine's TPU v5 lite (pure f32): ``--n1 224``
(m=50,176, n=100,352, KKT N=150,528) **CONVERGES in 32 iterations** —
metric 5.88e-6 < the f32 tolerance floor 5.96e-6, final relative primal
residual 3.6e-8, 44.5 s/iteration (1,423 s wall incl. one-time
compiles); rb contracts ~3×/iteration (6.9e3 → 2.2e-4 absolute by it
14) and the DD-evaluated duality gap passes 1e-5 by it ~25.  r4's run
was stuck at primal residual 5.7e-1 after 100 iterations.  Three
measured r5 fixes made this possible — EXPERIMENTS.md §E5.3-E5.4:
(1) the front kernels' MXU matmuls ran at bf16 precision
(factored-solve residual 4.8 at spread θ; now pinned 'highest');
(2) γ = 30·√eps sits at the element-growth knee; (3) residuals/gap are
evaluated with compensated (double-word) arithmetic and the refined
solves restart to 1e-6·‖rhs‖.
"""

import time

import _path  # noqa: F401
import numpy as np

from elemental_tpu.core.environment import Args, output
from elemental_tpu.optimization import LPCtrl, lp_direct
from elemental_tpu.optimization.kkt import KKTBuilder
from elemental_tpu.sparse import SparseMatrix


def concat_fd_2d(n0, n1):
    """Two 2-D finite-difference blocks side by side (reference BP.py's
    ConcatFD2D stencil), vectorized assembly."""
    m = n0 * n1
    s = np.arange(m)
    x0, x1 = s % n0, s // n0
    rows, cols, vals = [], [], []

    def add(mask, col, val):
        rows.append(s[mask]); cols.append(col[mask])
        vals.append(np.full(int(mask.sum()), float(val)))

    t = np.ones(m, bool)
    add(t, s, 11.0); add(t, s + m, -20.0)
    add(x0 > 0, s - 1, -1.0); add(x0 > 0, s + m - 1, -17.0)
    add(x0 + 1 < n0, s + 1, 2.0); add(x0 + 1 < n0, s + m + 1, -20.0)
    add(x1 > 0, s - n0, -30.0); add(x1 > 0, s + m - n0, -3.0)
    add(x1 + 1 < n1, s + n0, 4.0); add(x1 + 1 < n1, s + m + n0, 3.0)
    return SparseMatrix.from_coo(m, 2 * m, np.concatenate(rows),
                                 np.concatenate(cols),
                                 np.concatenate(vals))


def kkt_factor_gflops(A: SparseMatrix, gamma=1e-9, delta=1e-9) -> float:
    """Flop estimate of one multifrontal KKT factorization."""
    from elemental_tpu.optimization.lp import _build_lp_kkt
    kkt, _ = _build_lp_kkt(A, gamma, delta, None)
    total = 0.0
    for sn in kkt.symb.supernodes:
        ns = sn.cols[1] - sn.cols[0]
        nr = len(sn.struct)
        sfull = ns + nr
        for k in range(ns):
            total += 2.0 * (sfull - k) ** 2
    return total / 1e9


def main():
    args = Args()
    args.input("n1", "FD grid dimension (n = 2*n1^2 variables)", 24)
    args.input("tol", "convergence tolerance", 1e-8)
    args.process_input()
    n1 = args["n1"]
    A = concat_fd_2d(n1, n1)
    m, n = A.shape
    rng = np.random.default_rng(0)
    x0 = np.abs(rng.standard_normal(n)) + 0.1
    b = A.to_scipy() @ x0
    c = np.abs(rng.standard_normal(n)) + 0.5

    gf = kkt_factor_gflops(A)
    output(f"LP: m={m} rows, n={n} vars, nnz(A)={A.nnz}, "
           f"KKT factor ≈ {gf:.3f} GFlop")

    t0 = time.time()
    res = lp_direct(A, b, c, LPCtrl(tol=args["tol"], max_iters=100))
    wall = time.time() - t0
    per_it = wall / max(res.iterations, 1)
    output(f"objective = {res.objective:.8g} in {res.iterations} iterations "
           f"({wall:.1f}s wall, {per_it:.2f}s/it, "
           f"~{gf / per_it:.2f} GFlop/s factor-bound)")
    r = np.linalg.norm(A.to_scipy() @ res.x - b) / (1 + np.linalg.norm(b))
    output(f"primal residual {r:.2e}, min(x) = {res.x.min():.2e}, "
           f"converged={res.converged}")
    # Dtype-aware expectations (core/policy): under x64 (CPU hosts) the
    # solve converges to classical tolerances at any size.  In pure f32
    # (TPU) the r5 numerics (precision-pinned fronts, γ at the growth
    # knee, restarted refined solves, DD-evaluated residuals/gap) carry
    # the n=10⁵ instance to a DD-evaluated gap ~1e-5 and relative primal
    # residual ~1e-7; the asserted f32 bound below is the measured
    # achievable envelope (EXPERIMENTS.md §E5.4).
    import jax.numpy as jnp
    from elemental_tpu.core.policy import default_real_dtype, x64_enabled
    eps = float(jnp.finfo(default_real_dtype()).eps)
    assert np.isfinite(r) and res.x.min() > -1e-6
    if x64_enabled() or n1 <= 32:
        bound = max(1e-6, 2000.0 * eps)
        assert res.converged or r < bound
        assert r < bound
    else:
        # f32 at scale: primal feasibility to ~1e-6 relative and the
        # (DD-evaluated) metric within ~1e-4
        assert r < 1e-5 * (1 + np.sqrt(n1)), r
        assert res.metric is not None and res.metric < 2e-4, res.metric


if __name__ == "__main__":
    main()
