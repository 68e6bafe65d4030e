"""Dantzig selector (mirror of ``examples/interface/DS.py``):
min ‖x‖₁ s.t. ‖Aᵀ(Ax − b)‖∞ ≤ λ."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.optimization import dantzig_selector


def main():
    args = Args()
    args.input("m", "rows", 25)
    args.input("n", "cols", 40)
    args.input("lam", "residual bound", 1.0)
    args.process_input()
    rng = np.random.default_rng(4)
    A = rng.standard_normal((args["m"], args["n"]))
    x0 = np.zeros(args["n"]); x0[:3] = [3.0, -2.0, 1.5]
    b = A @ x0
    x = dantzig_selector(A, b, args["lam"])
    viol = np.abs(A.T @ (A @ x - b)).max()
    output(f"DS: ||x||_1 = {np.abs(x).sum():.6g}, constraint {viol:.4g} <= {args['lam']}")
    assert viol <= args["lam"] * (1 + 1e-4)


if __name__ == "__main__":
    main()
