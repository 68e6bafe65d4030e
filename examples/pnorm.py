"""Matrix norms (mirror of ``examples/interface/PNorm.py``): one/inf/
Frobenius/max/two-estimate on a random matrix vs NumPy."""
import _path  # noqa: F401
import numpy as np
import jax.numpy as jnp
from elemental_tpu.core.environment import Args, output
from elemental_tpu.lapack import (frobenius_norm, infinity_norm, max_norm,
                                  one_norm, two_norm_estimate)


def main():
    args = Args()
    args.input("m", "rows", 60)
    args.input("n", "cols", 45)
    args.process_input()
    rng = np.random.default_rng(11)
    A = rng.standard_normal((args["m"], args["n"]))
    Aj = jnp.asarray(A)
    assert np.isclose(float(one_norm(Aj)), np.abs(A).sum(0).max())
    assert np.isclose(float(infinity_norm(Aj)), np.abs(A).sum(1).max())
    assert np.isclose(float(frobenius_norm(Aj)), np.linalg.norm(A))
    assert np.isclose(float(max_norm(Aj)), np.abs(A).max())
    t2 = float(two_norm_estimate(Aj))
    s1 = np.linalg.svd(A, compute_uv=False)[0]
    assert abs(t2 - s1) / s1 < 1e-2
    output(f"norms: one/inf/fro/max exact, two-estimate within 1% "
           f"({t2:.6g} vs {s1:.6g})")


if __name__ == "__main__":
    main()
