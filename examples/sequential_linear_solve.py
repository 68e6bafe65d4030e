"""Sparse sequential linear solve (mirror of
``examples/interface/SequentialLinearSolve.py``): the reference's
``Rectang`` square stencil WITH its dense last column (a worst-case
fill-in stressor for the ordering) solved via the augmented-system
multifrontal path."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.lapack import sparse_linear_solve
from elemental_tpu.sparse import SparseMatrix


def rectang_square(n):
    s = np.arange(n)
    rows = [s, s[1:], s[:-1]]
    cols = [s, s[:-1], s[1:]]
    vals = [np.full(n, 11.0), np.full(n - 1, -1.0), np.full(n - 1, 2.0)]
    # the dense last column (reference: A.QueueUpdate(s, width-1, -5/height))
    rows.append(s)
    cols.append(np.full(n, n - 1))
    vals.append(np.full(n, -5.0 / n))
    return SparseMatrix.from_coo(n, n, np.concatenate(rows),
                                 np.concatenate(cols),
                                 np.concatenate(vals))


def main():
    args = Args()
    args.input("n", "system size", 300)
    args.process_input()
    n = args["n"]
    A = rectang_square(n)
    rng = np.random.default_rng(5)
    b = rng.standard_normal(n)
    x = np.asarray(sparse_linear_solve(A, b))
    r = np.linalg.norm(A.to_scipy() @ x - b) / np.linalg.norm(b)
    from elemental_tpu.core.policy import default_real_dtype, residual_bound
    bound = residual_bound(default_real_dtype(), n)
    assert r < bound, (r, bound)
    output(f"sparse linear solve (n={n}, dense last column): "
           f"rel residual {r:.3e}")


if __name__ == "__main__":
    main()
