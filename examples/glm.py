"""General (Gauss-Markov) linear model (mirror of
``examples/interface/GLM.py``): min ‖y‖₂ s.t. d = A·x + B·y."""
import _path  # noqa: F401
import numpy as np
import jax.numpy as jnp
from elemental_tpu.core.environment import Args, output
from elemental_tpu.lapack import glm


def main():
    args = Args()
    args.input("m", "rows", 60)
    args.input("n", "x cols", 25)
    args.input("p", "y cols", 70)
    args.process_input()
    rng = np.random.default_rng(4)
    A = rng.standard_normal((args["m"], args["n"]))
    B = rng.standard_normal((args["m"], args["p"]))
    d = rng.standard_normal(args["m"])
    x, y = glm(jnp.asarray(A), jnp.asarray(B), jnp.asarray(d))
    x, y = np.asarray(x), np.asarray(y)
    res = np.linalg.norm(A @ x + B @ y - d) / (1 + np.linalg.norm(d))
    output(f"GLM: constraint residual {res:.2e}, ||y|| = "
           f"{np.linalg.norm(y):.6g}")
    assert res < 1e-8
    # KKT optimality: y ⟂ null-space motions — y ∈ range(Bᵀ λ) with Aᵀλ=0
    lam = np.linalg.lstsq(B.T, y, rcond=None)[0]
    assert np.linalg.norm(A.T @ lam) / (1 + np.linalg.norm(lam)) < 1e-6


if __name__ == "__main__":
    main()
