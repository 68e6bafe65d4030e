"""Least absolute value regression (mirror of ``examples/interface/LAV.py``):
min ‖Ax − b‖₁ through the affine-form IPM."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.optimization import LPCtrl, lav


def main():
    args = Args()
    args.input("m", "rows", 40)
    args.input("n", "cols", 8)
    args.process_input()
    rng = np.random.default_rng(2)
    A = rng.standard_normal((args["m"], args["n"]))
    b = rng.standard_normal(args["m"])
    x = lav(A, b, LPCtrl(tol=1e-9))
    l1 = np.abs(A @ x - b).sum()
    l2 = np.abs(A @ np.linalg.lstsq(A, b, rcond=None)[0] - b).sum()
    output(f"LAV: l1 objective {l1:.6g} (LS point gives {l2:.6g})")
    assert l1 <= l2 + 1e-8


if __name__ == "__main__":
    main()
