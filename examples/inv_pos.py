"""HPD inversion (mirror of ``examples/interface/InvPos.py``): inverse of
a Hermitian positive-definite matrix via Cholesky."""
import _path  # noqa: F401
import numpy as np
import jax.numpy as jnp
from elemental_tpu.core.environment import Args, output
from elemental_tpu.lapack import hpd_inverse


def main():
    args = Args()
    args.input("n", "size", 40)
    args.process_input()
    n = args["n"]
    rng = np.random.default_rng(13)
    B = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    A = B @ B.conj().T + n * np.eye(n)
    Ainv = np.asarray(hpd_inverse("L", jnp.asarray(A)))
    r = np.abs(A @ Ainv - np.eye(n)).max()
    output(f"hpd_inverse: ||A·A⁻¹ − I||_max = {r:.2e}")
    assert r < 1e-8


if __name__ == "__main__":
    main()
