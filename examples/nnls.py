"""Nonnegative least squares (mirror of ``examples/interface/NNLS.py``)."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.optimization import nnls


def main():
    args = Args()
    args.input("m", "rows", 40)
    args.input("n", "cols", 20)
    args.process_input()
    rng = np.random.default_rng(6)
    A = rng.standard_normal((args["m"], args["n"]))
    b = rng.standard_normal(args["m"])
    x = nnls(A, b)
    import scipy.optimize as so
    ref, _ = so.nnls(A, b)
    output(f"NNLS: ours {np.linalg.norm(A @ x - b):.8g} vs scipy "
           f"{np.linalg.norm(A @ ref - b):.8g}")
    assert x.min() > -1e-8
    assert np.linalg.norm(A @ x - b) <= np.linalg.norm(A @ ref - b) + 1e-5


if __name__ == "__main__":
    main()
