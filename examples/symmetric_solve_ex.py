"""Symmetric/Hermitian indefinite solve (mirror of
``examples/interface/SymmetricSolve.py``): LDL-based solve on an
indefinite matrix, real and complex."""
import _path  # noqa: F401
import numpy as np
import jax.numpy as jnp
from elemental_tpu.core.environment import Args, output
from elemental_tpu.lapack import symmetric_solve


def main():
    args = Args()
    args.input("n", "size", 40)
    args.input("k", "rhs", 3)
    args.process_input()
    n, k = args["n"], args["k"]
    rng = np.random.default_rng(12)
    for cplx in (False, True):
        A = rng.standard_normal((n, n))
        if cplx:
            A = A + 1j * rng.standard_normal((n, n))
        A = (A + A.T) / 2          # complex-SYMMETRIC (not Hermitian)
        B = rng.standard_normal((n, k)).astype(A.dtype)
        X = np.asarray(symmetric_solve(jnp.asarray(A), jnp.asarray(B)))
        r = np.linalg.norm(A @ X - B) / np.linalg.norm(B)
        assert r < 1e-8, (cplx, r)
    output("symmetric_solve: real + complex-symmetric residuals < 1e-8")


if __name__ == "__main__":
    main()
