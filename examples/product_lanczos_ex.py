"""Product Lanczos driver (mirror of
``examples/interface/ProductLanczos.py``): two-norm/condition estimation
via Lanczos on AᴴA."""
import _path  # noqa: F401
import numpy as np
import jax.numpy as jnp
from elemental_tpu.core.environment import Args, output
from elemental_tpu.lapack import product_lanczos


def main():
    args = Args()
    args.input("m", "rows", 80)
    args.input("n", "cols", 50)
    args.process_input()
    rng = np.random.default_rng(16)
    A = rng.standard_normal((args["m"], args["n"]))
    T = np.asarray(product_lanczos(jnp.asarray(A), basis_size=30))
    ritz = np.linalg.eigvalsh(T)
    s1 = np.linalg.svd(A, compute_uv=False)[0]
    est = np.sqrt(ritz.max())
    output(f"product-Lanczos two-norm estimate {est:.6g} vs SVD {s1:.6g}")
    assert abs(est - s1) / s1 < 1e-6


if __name__ == "__main__":
    main()
