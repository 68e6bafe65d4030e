"""1-D total-variation denoising (mirror of ``examples/interface/TV.py``)."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.optimization import total_variation


def main():
    args = Args()
    args.input("n", "signal length", 60)
    args.input("lam", "TV weight", 2.0)
    args.process_input()
    rng = np.random.default_rng(8)
    truth = np.repeat([0.0, 2.0, -1.0], args["n"] // 3 + 1)[:args["n"]]
    b = truth + 0.2 * rng.standard_normal(args["n"])
    x = total_variation(b, args["lam"])
    tv_x = np.abs(np.diff(x)).sum()
    tv_b = np.abs(np.diff(b)).sum()
    output(f"TV: total variation {tv_b:.4g} -> {tv_x:.4g}")
    assert tv_x < tv_b


if __name__ == "__main__":
    main()
