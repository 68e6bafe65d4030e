"""Dense Dantzig selector (mirror of ``DSDense.py``)."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.optimization import dantzig_selector


def main():
    args = Args()
    args.input("m", "rows", 15)
    args.input("n", "cols", 10)
    args.input("lam", "correlation bound", 2.0)
    args.process_input()
    rng = np.random.default_rng(24)
    A = rng.standard_normal((args["m"], args["n"]))
    b = rng.standard_normal(args["m"])
    lam = args["lam"]
    x = dantzig_selector(A, b, lam)
    corr = np.abs(A.T @ (A @ x - b)).max()
    assert corr <= lam * (1 + 1e-3), corr
    output(f"dense DS: ‖Aᵀ(Ax−b)‖∞ {corr:.6g} ≤ λ={lam}, "
           f"‖x‖₁ {np.abs(x).sum():.6g}")


if __name__ == "__main__":
    main()
