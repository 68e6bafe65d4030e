"""Dense elastic net (mirror of ``ENDense.py``)."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.optimization import elastic_net


def main():
    args = Args()
    args.input("m", "rows", 15)
    args.input("n", "cols", 25)
    args.process_input()
    rng = np.random.default_rng(25)
    A = rng.standard_normal((args["m"], args["n"]))
    b = rng.standard_normal(args["m"])
    lam1, lam2 = 0.4, 0.2
    x = elastic_net(A, b, lam1, lam2)
    obj = (0.5 * np.linalg.norm(A @ x - b) ** 2
           + lam1 * np.abs(x).sum() + 0.5 * lam2 * x @ x)
    assert obj <= 0.5 * np.linalg.norm(b) ** 2 + 1e-8
    output(f"dense EN: objective {obj:.6g}")


if __name__ == "__main__":
    main()
