"""Dense basis pursuit (mirror of ``examples/interface/BPDense.py``):
``El.BP`` on a dense ``Matrix`` — same model as ``bp.py``, dense input."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.optimization import basis_pursuit


def main():
    args = Args()
    args.input("m", "rows", 12)
    args.input("n", "cols", 40)
    args.process_input()
    m, n = args["m"], args["n"]
    rng = np.random.default_rng(21)
    A = rng.standard_normal((m, n)) / np.sqrt(m)       # dense Matrix input
    x_true = np.zeros(n)
    x_true[rng.choice(n, 3, replace=False)] = rng.standard_normal(3)
    b = A @ x_true
    x = basis_pursuit(A, b)
    assert np.linalg.norm(A @ x - b) < 1e-3 * (1 + np.linalg.norm(b))
    assert np.abs(x).sum() <= np.abs(x_true).sum() * (1 + 1e-2)
    output(f"dense BP: l1 {np.abs(x).sum():.6g} "
           f"(generator {np.abs(x_true).sum():.6g})")


if __name__ == "__main__":
    main()
