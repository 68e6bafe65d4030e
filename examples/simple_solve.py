"""Smallest end-to-end driver (mirror of ``examples/interface/Simple.py``):
build a distributed matrix on the mesh, solve, check."""
import _path  # noqa: F401
import numpy as np
import jax
import jax.numpy as jnp
import elemental_tpu as el
from elemental_tpu.core.environment import Args, output
from elemental_tpu.lapack import linear_solve


def main():
    args = Args()
    args.input("n", "size", 64)
    args.process_input()
    n = args["n"]
    rng = np.random.default_rng(14)
    a = rng.standard_normal((n, n)) + n * np.eye(n)
    b = rng.standard_normal((n, 2))
    try:
        g = el.Grid(devices=jax.devices("cpu")[:4], height=2)
    except Exception:
        g = el.Grid.default()
    A = el.distribute(a, el.MC, el.MR, g)
    B = el.distribute(b, el.MC, el.MR, g)
    X = np.asarray(el.core.distmatrix.as_array(linear_solve(A, B)))
    r = np.linalg.norm(a @ X - b) / np.linalg.norm(b)
    output(f"simple: dist linear solve residual {r:.2e} on {g.size} devices")
    assert r < 1e-5


if __name__ == "__main__":
    main()
