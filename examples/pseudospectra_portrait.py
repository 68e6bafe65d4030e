"""ε-pseudospectrum portrait (mirror of the reference's
``ChunkedPseudospectra.cpp`` / ``Pseudospectra`` drivers): σ_min(A − zI)
over a grid of shifts around the spectrum of the Fox-Li operator, via the
Schur-form multishift inverse-power path (``lapack.pseudospectra``)."""
import _path  # noqa: F401
import numpy as np
import jax.numpy as jnp
from elemental_tpu.core.environment import Args, output
from elemental_tpu.lapack import pseudospectra
from elemental_tpu.matrices import fox_li


def main():
    args = Args()
    args.input("n", "matrix size", 48)
    args.input("g", "portrait grid side", 8)
    args.process_input()
    n, g = args["n"], args["g"]
    A = fox_li(n, -0.18)
    re = np.linspace(-1.2, 1.2, g)
    im = np.linspace(-1.2, 1.2, g)
    Z = (re[None, :] + 1j * im[:, None]).ravel()
    sig = np.asarray(pseudospectra(jnp.asarray(A), jnp.asarray(Z),
                                   iters=60)).reshape(g, g)
    # verify a few grid points against dense SVD
    rng = np.random.default_rng(0)
    for idx in rng.choice(g * g, 5, replace=False):
        z = Z[idx]
        true = np.linalg.svd(A - z * np.eye(n), compute_uv=False)[-1]
        assert abs(sig.ravel()[idx] - true) / max(true, 1e-12) < 0.05, \
            (z, sig.ravel()[idx], true)
    output(f"pseudospectra portrait {g}x{g}: sigma_min in "
           f"[{sig.min():.3e}, {sig.max():.3e}] — 5 samples verified vs SVD")


if __name__ == "__main__":
    main()
