"""Dense affine-form LP (mirror of ``LPAffineDense.py``)."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.optimization import LPCtrl, lp_affine
from elemental_tpu.sparse import SparseMatrix


def main():
    args = Args()
    args.input("n", "cols", 10)
    args.process_input()
    n = args["n"]
    rng = np.random.default_rng(28)
    # min cᵀx s.t. |x| ≤ 1 elementwise, one equality
    A = rng.standard_normal((1, n))
    x_f = rng.uniform(-0.3, 0.3, n)
    b = A @ x_f
    G = np.concatenate([np.eye(n), -np.eye(n)])
    h = np.ones(2 * n)
    c = rng.standard_normal(n)
    res = lp_affine(SparseMatrix.from_dense(A), b,
                    SparseMatrix.from_dense(G), h, c, LPCtrl(tol=1e-8))
    x = res.x
    assert np.abs(A @ x - b).max() < 1e-4
    assert np.abs(x).max() <= 1 + 1e-4
    output(f"dense LPAffine: obj {c @ x:.6g}, its={res.iterations}")


if __name__ == "__main__":
    main()
