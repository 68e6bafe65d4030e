"""Hermitian eigensolver driver (mirror of ``examples/interface/Eig.py``)."""
import _path  # noqa: F401
import numpy as np
import jax.numpy as jnp
from elemental_tpu.core.environment import Args, output
from elemental_tpu.lapack.spectral import hermitian_eig


def main():
    args = Args()
    args.input("n", "matrix size", 120)
    args.process_input()
    n = args["n"]
    rng = np.random.default_rng(15)
    a = rng.standard_normal((n, n)); a = (a + a.T) / 2
    w, v = hermitian_eig("L", jnp.asarray(a))
    w, v = np.asarray(w), np.asarray(v)
    err = np.abs(a @ v - v * w[None, :]).max()
    ref = np.linalg.eigvalsh(a)
    output(f"eig: residual {err:.2e}, lambda range [{w.min():.4g}, {w.max():.4g}]")
    assert err < 1e-10 * n and np.abs(np.sort(w) - ref).max() < 1e-9 * n


if __name__ == "__main__":
    main()
