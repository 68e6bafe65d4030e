"""Direct-form QP (mirror of ``examples/interface/QPDirect.py``)."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.optimization import LPCtrl, qp_direct


def main():
    args = Args()
    args.input("m", "rows", 5)
    args.input("n", "vars", 15)
    args.process_input()
    rng = np.random.default_rng(10)
    m, n = args["m"], args["n"]
    Q0 = rng.standard_normal((n, n))
    Q = Q0 @ Q0.T + np.eye(n)
    A = rng.standard_normal((m, n))
    b = A @ np.abs(rng.standard_normal(n))
    c = rng.standard_normal(n)
    res = qp_direct(Q, A, b, c, LPCtrl(tol=1e-9))
    r = np.linalg.norm(A @ res.x - b)
    output(f"QPDirect: obj {res.objective:.8g}, ||Ax-b|| {r:.2e}")
    assert res.converged and r < 1e-6 * (1 + np.linalg.norm(b))
    assert res.x.min() > -1e-8


if __name__ == "__main__":
    main()
