"""Tikhonov-regularized least squares (mirror of
``examples/interface/Tikhonov.py``): min ‖Ax − b‖² + ‖Γx‖²."""
import _path  # noqa: F401
import numpy as np
import jax.numpy as jnp
from elemental_tpu.core.environment import Args, output
from elemental_tpu.lapack import ridge, tikhonov


def main():
    args = Args()
    args.input("m", "rows", 50)
    args.input("n", "cols", 30)
    args.process_input()
    rng = np.random.default_rng(6)
    A = rng.standard_normal((args["m"], args["n"]))
    b = rng.standard_normal(args["m"])
    G = 0.5 * rng.standard_normal((args["n"], args["n"]))
    x = np.asarray(tikhonov("N", jnp.asarray(A), jnp.asarray(b)[:, None],
                            jnp.asarray(G)))[:, 0]
    xr = np.linalg.solve(A.T @ A + G.T @ G, A.T @ b)
    output(f"Tikhonov: ||x - x_normal_eq|| = {np.linalg.norm(x - xr):.2e}")
    assert np.allclose(x, xr, atol=1e-8)
    xg = np.asarray(ridge("N", jnp.asarray(A), jnp.asarray(b)[:, None],
                          0.7))[:, 0]
    xrr = np.linalg.solve(A.T @ A + 0.49 * np.eye(args["n"]), A.T @ b)
    assert np.allclose(xg, xrr, atol=1e-8)


if __name__ == "__main__":
    main()
