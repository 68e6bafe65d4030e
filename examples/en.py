"""Elastic net (mirror of ``examples/interface/EN.py``):
min ½‖Ax−b‖² + λ₁‖x‖₁ + ½λ₂‖x‖²."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.optimization import elastic_net


def main():
    args = Args()
    args.input("m", "rows", 30)
    args.input("n", "cols", 50)
    args.process_input()
    rng = np.random.default_rng(5)
    A = rng.standard_normal((args["m"], args["n"]))
    b = rng.standard_normal(args["m"])
    x = elastic_net(A, b, 0.3, 0.1)
    obj = (0.5 * np.sum((A @ x - b) ** 2) + 0.3 * np.abs(x).sum()
           + 0.05 * np.sum(x ** 2))
    output(f"EN: objective = {obj:.6g}")
    assert np.isfinite(obj)


if __name__ == "__main__":
    main()
