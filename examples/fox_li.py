"""Fox–Li pseudospectral portrait (mirror of ``examples/interface/FoxLi.py``
+ the reference's pseudospectra drivers): largest singular values of
(A − σI) over a grid of shifts."""
import _path  # noqa: F401
import numpy as np
import jax.numpy as jnp
from elemental_tpu.core.environment import Args, output
from elemental_tpu.matrices import fox_li
from elemental_tpu.lapack.spectral import pseudospectra


def main():
    args = Args()
    args.input("n", "discretization size", 64)
    args.input("omega", "Fresnel number", 16.0)
    args.process_input()
    A = fox_li(args["n"], args["omega"])
    re = np.linspace(-1.1, 1.1, 6)
    im = np.linspace(-1.1, 1.1, 6)
    shifts = (re[:, None] + 1j * im[None, :]).reshape(-1)
    inv_norms = np.asarray(pseudospectra(A, jnp.asarray(shifts), iters=24))
    sigma_min = inv_norms.reshape(6, 6)
    output(f"fox_li portrait: min sigma_min {sigma_min.min():.3e}, "
           f"max {sigma_min.max():.3e}")
    assert np.isfinite(sigma_min).all() and sigma_min.min() >= 0


if __name__ == "__main__":
    main()
