"""Sparse Multiply cross-checks (mirror of ``examples/interface/Multiply.py``
/ ``tests/blas_like/Multiply.cpp``): SparseMatrix vs Graph vs distributed."""
import _path  # noqa: F401
import numpy as np
import jax
import elemental_tpu as el
from elemental_tpu.core.environment import output
from elemental_tpu.matrices import sparse_laplacian_2d
from elemental_tpu.sparse import DistSparseMatrix
from elemental_tpu.sparse.matmul import multiply


def main():
    A = sparse_laplacian_2d(12, 12)
    rng = np.random.default_rng(17)
    x = rng.standard_normal(A.width)
    dense = A.to_dense()
    y1 = np.asarray(multiply("N", 1.0, A, x))
    y2 = np.asarray(multiply("N", 1.0, A.graph().to_sparse(), x))
    sx = dense @ x
    pattern = (dense != 0) @ x
    assert np.abs(y1 - sx).max() < 1e-12
    assert np.abs(y2 - pattern).max() < 1e-12
    try:
        grid = el.Grid(devices=jax.devices("cpu"), height=2)
        dA = DistSparseMatrix.from_sparse(A, grid)
        y3 = np.asarray(multiply("N", 1.0, dA, x))
        assert np.abs(y3 - sx).max() < 1e-10
    except RuntimeError:
        pass
    output("sparse multiply cross-checks OK")


if __name__ == "__main__":
    main()
