"""Dense affine-form QP (mirror of ``QPAffineDense.py``)."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.optimization import LPCtrl, qp_affine


def main():
    args = Args()
    args.input("n", "cols", 8)
    args.process_input()
    n = args["n"]
    rng = np.random.default_rng(31)
    M = rng.standard_normal((n, n))
    Q = M @ M.T + n * np.eye(n)
    c = rng.standard_normal(n)
    A = rng.standard_normal((2, n))
    b = A @ rng.uniform(-0.3, 0.3, n)
    G = np.concatenate([np.eye(n), -np.eye(n)])
    h = np.ones(2 * n)
    res = qp_affine(Q, A, b, G, h, c, LPCtrl(tol=1e-8))
    x = res.x
    assert np.linalg.norm(A @ x - b) < 1e-3 * (1 + np.linalg.norm(b))
    assert np.abs(x).max() <= 1 + 1e-4
    output(f"dense QPAffine: obj {res.objective:.6g}, "
           f"its={res.iterations}")


if __name__ == "__main__":
    main()
