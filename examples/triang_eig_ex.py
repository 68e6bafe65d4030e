"""Triangular eigenvector solve (mirror of
``examples/interface/TriangEig.py``): eigenvectors of a Schur factor."""
import _path  # noqa: F401
import numpy as np
import jax.numpy as jnp
from elemental_tpu.core.environment import Args, output
from elemental_tpu.lapack import triang_eig


def main():
    args = Args()
    args.input("n", "size", 40)
    args.process_input()
    n = args["n"]
    rng = np.random.default_rng(10)
    T = np.triu(rng.standard_normal((n, n))
                + 1j * rng.standard_normal((n, n)))
    T += np.diag(np.arange(n))           # well-separated eigenvalues
    X = np.asarray(triang_eig(jnp.asarray(T)))
    R = T @ X - X @ np.diag(np.diagonal(T))
    rel = np.abs(R).max() / np.abs(T).max()
    output(f"triang_eig: max residual {rel:.2e}")
    assert rel < 1e-10


if __name__ == "__main__":
    main()
