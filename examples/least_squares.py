"""Distributed least squares / ridge / Tikhonov (mirror of
``examples/interface/LeastSquares.py`` + ``Tikhonov.py``)."""
import _path  # noqa: F401
import numpy as np
import jax.numpy as jnp
import elemental_tpu as el
from elemental_tpu.core.environment import Args, output
from elemental_tpu.lapack.euclidean_min import least_squares, ridge, tikhonov


def main():
    args = Args()
    args.input("m", "rows", 120)
    args.input("n", "cols", 40)
    args.process_input()
    rng = np.random.default_rng(13)
    a = rng.standard_normal((args["m"], args["n"]))
    b = rng.standard_normal(args["m"])
    x = np.asarray(least_squares("N", jnp.asarray(a), jnp.asarray(b)))
    ref = np.linalg.lstsq(a, b, rcond=None)[0]
    assert np.abs(x - ref).max() < 1e-8
    xr = np.asarray(ridge("N", jnp.asarray(a), jnp.asarray(b), 0.7))
    refr = np.linalg.solve(a.T @ a + 0.49 * np.eye(args["n"]), a.T @ b)
    assert np.abs(xr - refr).max() < 1e-8
    xt = np.asarray(tikhonov("N", jnp.asarray(a), jnp.asarray(b),
                             jnp.asarray(0.7 * np.eye(args["n"]))))
    assert np.abs(xt - refr).max() < 1e-8
    output(f"least_squares/ridge/tikhonov OK (residual {np.linalg.norm(a @ x - b):.4g})")


if __name__ == "__main__":
    main()
