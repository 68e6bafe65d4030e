"""Dense direct-form LP (mirror of ``LPDirectDense.py``)."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.optimization import LPCtrl, lp_direct
from elemental_tpu.sparse import SparseMatrix


def main():
    args = Args()
    args.input("m", "rows", 10)
    args.input("n", "cols", 24)
    args.process_input()
    rng = np.random.default_rng(27)
    A = np.abs(rng.standard_normal((args["m"], args["n"]))) + 0.1
    x0 = np.abs(rng.standard_normal(args["n"])) + 0.2
    b = A @ x0
    c = np.abs(rng.standard_normal(args["n"])) + 0.5
    res = lp_direct(SparseMatrix.from_dense(A), b, c,
                    LPCtrl(tol=1e-8, max_iters=60))
    assert res.converged
    assert res.objective <= c @ x0 + 1e-4 * (1 + abs(c @ x0))
    output(f"dense LPDirect: obj {res.objective:.6g} "
           f"(feasible point {c @ x0:.6g}), its={res.iterations}")


if __name__ == "__main__":
    main()
