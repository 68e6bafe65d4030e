"""Robust least squares (mirror of ``examples/interface/RLS.py``):
min ‖Ax − b‖₂ + ρ‖x‖₂ as an SOCP."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.optimization import robust_least_squares


def main():
    args = Args()
    args.input("m", "rows", 30)
    args.input("n", "cols", 10)
    args.input("rho", "regularization", 0.5)
    args.process_input()
    rng = np.random.default_rng(7)
    A = rng.standard_normal((args["m"], args["n"]))
    b = rng.standard_normal(args["m"])
    rho = args["rho"]
    x = robust_least_squares(A, b, rho)
    obj = np.linalg.norm(A @ x - b) + rho * np.linalg.norm(x)
    xls = np.linalg.lstsq(A, b, rcond=None)[0]
    ols = np.linalg.norm(A @ xls - b) + rho * np.linalg.norm(xls)
    output(f"RLS: objective {obj:.6g} (LS point {ols:.6g})")
    assert obj <= ols + 1e-6


if __name__ == "__main__":
    main()
