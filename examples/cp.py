"""Chebyshev point: min ‖Ax − b‖∞ (mirror of ``examples/interface/CP.py``)."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.optimization import LPCtrl, chebyshev_point


def main():
    args = Args()
    args.input("m", "rows", 40)
    args.input("n", "cols", 8)
    args.process_input()
    rng = np.random.default_rng(3)
    A = rng.standard_normal((args["m"], args["n"]))
    b = rng.standard_normal(args["m"])
    x = chebyshev_point(A, b, LPCtrl(tol=1e-9))
    linf = np.abs(A @ x - b).max()
    lsq = np.abs(A @ np.linalg.lstsq(A, b, rcond=None)[0] - b).max()
    output(f"CP: inf-norm {linf:.6g} (LS point gives {lsq:.6g})")
    assert linf <= lsq + 1e-8


if __name__ == "__main__":
    main()
