"""Dense non-negative least squares (mirror of ``NNLSDense.py``)."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.optimization import nnls


def main():
    args = Args()
    args.input("m", "rows", 20)
    args.input("n", "cols", 10)
    args.process_input()
    rng = np.random.default_rng(29)
    A = rng.standard_normal((args["m"], args["n"]))
    b = rng.standard_normal(args["m"])
    x = nnls(A, b)
    assert x.min() > -1e-6
    r = np.linalg.norm(A @ x - b)
    # projected-gradient stationarity: grad ≥ 0 where x = 0
    g = A.T @ (A @ x - b)
    assert g[x < 1e-6].min() > -1e-3 if (x < 1e-6).any() else True
    output(f"dense NNLS: residual {r:.6g}, actives {(x < 1e-6).sum()}")


if __name__ == "__main__":
    main()
