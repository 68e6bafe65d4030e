"""Dense soft-margin SVM (mirror of ``SVMDense.py``)."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.optimization import svm


def main():
    args = Args()
    args.input("m", "samples", 30)
    args.input("n", "features", 4)
    args.process_input()
    rng = np.random.default_rng(32)
    m, n = args["m"], args["n"]
    w_true = rng.standard_normal(n)
    X = rng.standard_normal((m, n))
    labels = np.sign(X @ w_true + 0.1 * rng.standard_normal(m))
    wb = svm(X, labels, lam=0.1)
    w, beta = wb[:n], wb[n]
    acc = (np.sign(X @ w + beta) == labels).mean()
    assert acc >= 0.8, acc
    output(f"dense SVM: training accuracy {acc:.3f}")


if __name__ == "__main__":
    main()
