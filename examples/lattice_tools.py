"""Lattice toolbox drivers (mirror of ``examples/interface/``
``LatticeImageAndKernel.py``, ``ZDependenceSearch.py``,
``AlgebraicRelationSearch.py``): LLL-based image/kernel, integer
relations, algebraic relation search."""
import _path  # noqa: F401
import numpy as np
import jax.numpy as jnp
from elemental_tpu.core.environment import Args, output
from elemental_tpu.lapack import (algebraic_relation_search,
                                  lattice_image_and_kernel,
                                  z_dependence_search)


def main():
    args = Args()
    args.process_input()
    # image & kernel of an integer matrix with known rank deficiency
    B = np.array([[2, 4, 6, 1], [1, 2, 3, 0], [0, 0, 0, 5]], float).T
    M, K, _ = lattice_image_and_kernel(jnp.asarray(B))
    M, K = np.asarray(M), np.asarray(K)
    assert np.allclose(B @ K, 0, atol=1e-8)        # kernel vectors
    assert np.linalg.matrix_rank(M) == np.linalg.matrix_rank(B)
    # integer relation: z = (1, φ, φ²) satisfies  z·(-1, -1, 1) = 0
    phi = (1 + np.sqrt(5)) / 2
    a, _, _ = z_dependence_search(np.array([1.0, phi, phi * phi]))
    a = np.asarray(a)
    a = np.rint(a).astype(int)
    rel = abs(a @ np.array([1.0, phi, phi * phi]))
    assert rel < 1e-4 and np.abs(a).max() > 0
    # algebraic relation: √2 is a root of x² − 2
    p, _, _ = algebraic_relation_search(np.sqrt(2.0), 2)
    p = np.rint(np.asarray(p))
    val = sum(c * np.sqrt(2.0) ** k for k, c in enumerate(p))
    assert abs(val) < 1e-6 and np.abs(p).max() > 0
    output(f"lattice: kernel dim {K.shape[1]}, phi relation {a.tolist()}, "
           f"sqrt2 poly {p.astype(int).tolist()}")


if __name__ == "__main__":
    main()
