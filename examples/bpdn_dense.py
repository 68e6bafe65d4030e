"""Dense basis-pursuit denoising (mirror of ``BPDNDense.py``)."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.optimization import bpdn


def main():
    args = Args()
    args.input("m", "rows", 15)
    args.input("n", "cols", 30)
    args.input("lam", "l1 weight", 0.3)
    args.process_input()
    rng = np.random.default_rng(22)
    A = rng.standard_normal((args["m"], args["n"]))
    b = rng.standard_normal(args["m"])
    lam = args["lam"]
    x = bpdn(A, b, lam)
    obj = 0.5 * np.linalg.norm(A @ x - b) ** 2 + lam * np.abs(x).sum()
    obj0 = 0.5 * np.linalg.norm(b) ** 2                 # x = 0 point
    assert obj <= obj0 + 1e-8
    output(f"dense BPDN: objective {obj:.6g} (zero point {obj0:.6g})")


if __name__ == "__main__":
    main()
