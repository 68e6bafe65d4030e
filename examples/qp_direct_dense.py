"""Dense direct-form QP (mirror of ``QPDirectDense.py``)."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.optimization import LPCtrl, qp_direct


def main():
    args = Args()
    args.input("m", "rows", 5)
    args.input("n", "cols", 12)
    args.process_input()
    m, n = args["m"], args["n"]
    rng = np.random.default_rng(30)
    M = rng.standard_normal((n, n))
    Q = M @ M.T + n * np.eye(n)
    A = np.abs(rng.standard_normal((m, n))) + 0.1
    x0 = np.abs(rng.standard_normal(n)) + 0.2
    b = A @ x0
    c = rng.standard_normal(n)
    res = qp_direct(Q, A, b, c, LPCtrl(tol=1e-8))
    x = res.x
    assert np.linalg.norm(A @ x - b) < 1e-3 * (1 + np.linalg.norm(b))
    assert x.min() > -1e-5
    obj0 = 0.5 * x0 @ Q @ x0 + c @ x0
    assert res.objective <= obj0 + 1e-4 * (1 + abs(obj0))
    output(f"dense QPDirect: obj {res.objective:.6g} "
           f"(feasible point {obj0:.6g})")


if __name__ == "__main__":
    main()
