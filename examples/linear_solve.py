"""Distributed linear + symmetric solve (mirror of
``examples/interface/LinearSolve.py`` + ``SymmetricSolve.py``)."""
import _path  # noqa: F401
import numpy as np
import jax
import elemental_tpu as el
from elemental_tpu import lapack as la
from elemental_tpu.core.environment import Args, output


def main():
    args = Args()
    args.input("n", "system size", 96)
    args.process_input()
    n = args["n"]
    rng = np.random.default_rng(14)
    try:
        grid = el.Grid(devices=jax.devices("cpu"), height=2)
    except RuntimeError:
        grid = el.Grid.default()
    a = rng.standard_normal((n, n)).astype(np.float64) + n * np.eye(n)
    b = rng.standard_normal((n, 2))
    A = el.distribute(a, el.MC, el.MR, grid)
    B = el.distribute(b, el.MC, el.MR, grid)
    X = la.linear_solve(A, B)
    r = np.abs(a @ np.asarray(el.core.as_array(X)) - b).max()
    s = (a + a.T) / 2 + n * np.eye(n)
    S = el.distribute(s, el.MC, el.MR, grid)
    Xs = la.symmetric_solve(S, B)
    rs = np.abs(s @ np.asarray(el.core.as_array(Xs)) - b).max()
    output(f"linear_solve residual {r:.2e}; symmetric_solve {rs:.2e}")
    assert r < 1e-8 and rs < 1e-8


if __name__ == "__main__":
    main()
