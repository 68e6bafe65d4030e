"""Sparse Helmholtz solve (mirror of reference
``examples/lapack_like/Helmholtz.cpp``): build a 2-D Helmholtz operator,
factor with the multifrontal LDL, solve, report the residual.

Run:  python examples/helmholtz_solve.py --n1 20 --n2 20 --shift 20.0
"""

import _path  # noqa: F401
import numpy as np

from elemental_tpu.core.environment import Args, Timer, output
from elemental_tpu.matrices import sparse_helmholtz_2d
from elemental_tpu.sparse_direct import SparseLDLFactorization


def main():
    args = Args()
    args.input("n1", "grid points in x", 20)
    args.input("n2", "grid points in y", 20)
    args.input("shift", "Helmholtz shift omega^2", 20.0)
    args.input("rhs", "number of right-hand sides", 3)
    args.process_input()
    args.print_report()

    A = sparse_helmholtz_2d(args["n1"], args["n2"], args["shift"])
    n = A.height
    output(f"A: {n}x{n}, nnz={A.nnz}")

    t = Timer("factor")
    t.start()
    f = SparseLDLFactorization().initialize(A).factor()
    output(f"symbolic+numeric factor: {t.stop():.3f}s, "
           f"factor nnz={f.factor_nnz()}, "
           f"~{f.factor_gflops():.3f} GFLOP")

    rng = np.random.default_rng(0)
    X = rng.standard_normal((n, args["rhs"]))
    B = A.to_dense() @ X
    t.start()
    Xs = np.asarray(f.solve(B))
    output(f"solve: {t.stop():.3f}s")
    for j in range(args["rhs"]):
        rel = np.linalg.norm(Xs[:, j] - X[:, j]) / np.linalg.norm(X[:, j])
        output(f"  rhs {j}: relative error {rel:.3e}")


if __name__ == "__main__":
    main()
