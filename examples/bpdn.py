"""Basis-pursuit denoising / LASSO (mirror of ``examples/interface/BPDN.py``):
min ½‖Ax − b‖² + λ‖x‖₁."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.optimization import bpdn


def main():
    args = Args()
    args.input("m", "rows", 30)
    args.input("n", "cols", 60)
    args.input("lam", "l1 weight", 0.5)
    args.process_input()
    rng = np.random.default_rng(1)
    A = rng.standard_normal((args["m"], args["n"]))
    x0 = np.zeros(args["n"]); x0[:4] = rng.standard_normal(4) * 3
    b = A @ x0 + 0.01 * rng.standard_normal(args["m"])
    x = bpdn(A, b, args["lam"])
    obj = 0.5 * np.sum((A @ x - b) ** 2) + args["lam"] * np.abs(x).sum()
    output(f"BPDN: objective = {obj:.6g}, nnz(x>1e-4) = {(np.abs(x) > 1e-4).sum()}")
    assert np.isfinite(obj)


if __name__ == "__main__":
    main()
