"""Soft-margin linear SVM (mirror of ``examples/interface/SVM.py``)."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.optimization import svm


def main():
    args = Args()
    args.input("m", "samples", 60)
    args.input("n", "features", 4)
    args.process_input()
    rng = np.random.default_rng(7)
    w_true = rng.standard_normal(args["n"])
    X = rng.standard_normal((args["m"], args["n"]))
    y = np.sign(X @ w_true + 0.1 * rng.standard_normal(args["m"]))
    wb = svm(X, y, lam=0.1)
    pred = np.sign(X @ wb[:-1] + wb[-1])
    acc = (pred == y).mean()
    output(f"SVM: training accuracy {acc:.3f}")
    assert acc > 0.85


if __name__ == "__main__":
    main()
