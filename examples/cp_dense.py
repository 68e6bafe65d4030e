"""Dense Chebyshev point (mirror of ``CPDense.py``)."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.optimization import chebyshev_point


def main():
    args = Args()
    args.input("m", "rows", 20)
    args.input("n", "cols", 8)
    args.process_input()
    rng = np.random.default_rng(23)
    A = rng.standard_normal((args["m"], args["n"]))
    b = rng.standard_normal(args["m"])
    x = chebyshev_point(A, b)
    obj = np.abs(A @ x - b).max()
    xls = np.linalg.lstsq(A, b, rcond=None)[0]
    assert obj <= np.abs(A @ xls - b).max() + 1e-5
    output(f"dense CP: linf residual {obj:.6g}")


if __name__ == "__main__":
    main()
