"""Dense least absolute value regression (mirror of ``LAVDense.py``)."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.optimization import lav


def main():
    args = Args()
    args.input("m", "rows", 25)
    args.input("n", "cols", 8)
    args.process_input()
    rng = np.random.default_rng(26)
    A = rng.standard_normal((args["m"], args["n"]))
    b = rng.standard_normal(args["m"])
    x = lav(A, b)
    obj = np.abs(A @ x - b).sum()
    xls = np.linalg.lstsq(A, b, rcond=None)[0]
    assert obj <= np.abs(A @ xls - b).sum() + 1e-5
    output(f"dense LAV: l1 residual {obj:.6g}")


if __name__ == "__main__":
    main()
