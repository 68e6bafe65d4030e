"""Equality-constrained least squares (mirror of
``examples/interface/LSE.py``): min ‖A·x − c‖₂ s.t. B·x = d."""
import _path  # noqa: F401
import numpy as np
import jax.numpy as jnp
from elemental_tpu.core.environment import Args, output
from elemental_tpu.lapack import lse


def main():
    args = Args()
    args.input("m", "A rows", 70)
    args.input("n", "cols", 40)
    args.input("p", "constraints", 12)
    args.process_input()
    rng = np.random.default_rng(5)
    A = rng.standard_normal((args["m"], args["n"]))
    B = rng.standard_normal((args["p"], args["n"]))
    c = rng.standard_normal(args["m"])
    d = rng.standard_normal(args["p"])
    x = np.asarray(lse(jnp.asarray(A), jnp.asarray(B), jnp.asarray(c),
                       jnp.asarray(d)))
    cons = np.linalg.norm(B @ x - d) / (1 + np.linalg.norm(d))
    # optimality: residual gradient orthogonal to null(B)
    g = A.T @ (A @ x - c)
    Pg = g - B.T @ np.linalg.lstsq(B.T, g, rcond=None)[0]
    output(f"LSE: constraint {cons:.2e}, projected gradient "
           f"{np.linalg.norm(Pg):.2e}")
    assert cons < 1e-8 and np.linalg.norm(Pg) < 1e-6


if __name__ == "__main__":
    main()
