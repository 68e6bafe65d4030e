"""Sparse Multiply driver (mirror of ``examples/interface/Multiply.py`` /
``tests/blas_like/Multiply.cpp:19-46``): y = αAx + βy for the stacked
FD2D operator, cross-checked in NORMAL and TRANSPOSE orientations and
against the Graph (pattern-only) SpMV — the reference's
cross-implementation agreement trick."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.sparse import Graph, SparseMatrix, multiply


def stacked_fd2d(n0, n1):
    height, width = 2 * n0 * n1, n0 * n1
    rows, cols, vals = [], [], []
    s = np.arange(n0 * n1)
    x0, x1 = s % n0, s // n0
    for base, diag, offs in [
            (0, 11.1, [(x0 > 0, -1, -1.2), (x0 < n0 - 1, 1, 2.3),
                       (x1 > 0, -n0, -3.4), (x1 < n1 - 1, n0, 4.5)]),
            (n0 * n1, -2.0, [(x0 > 0, -1, -1.0), (x0 < n0 - 1, 1, -2.0),
                             (x1 > 0, -n0, -3.0), (x1 < n1 - 1, n0, 3.0)])]:
        rows.append(s + base)
        cols.append(s)
        vals.append(np.full(s.size, diag))
        for mask, off, v in offs:
            rows.append(s[mask] + base)
            cols.append(s[mask] + off)
            vals.append(np.full(int(mask.sum()), v))
    return SparseMatrix.from_coo(height, width, np.concatenate(rows),
                                 np.concatenate(cols),
                                 np.concatenate(vals))


def main():
    args = Args()
    args.input("n0", "x grid", 16)
    args.input("n1", "y grid", 16)
    args.process_input()
    A = stacked_fd2d(args["n0"], args["n1"])
    m, n = A.shape
    rng = np.random.default_rng(10)
    x = rng.standard_normal(n)
    y0 = rng.standard_normal(m)
    As = A.to_scipy()

    y = np.asarray(multiply("N", 2.0, A, x, -0.5, y0))
    assert np.abs(y - (2.0 * As @ x + -0.5 * y0)).max() < 1e-4

    w0 = rng.standard_normal(n)
    w = np.asarray(multiply("T", 1.5, A, y0, 0.25, w0))
    assert np.abs(w - (1.5 * As.T @ y0 + 0.25 * w0)).max() < 1e-4

    # SpMM (multiple RHS)
    X = rng.standard_normal((n, 3))
    Y = np.asarray(multiply("N", 1.0, A, X, 0.0, np.zeros((m, 3))))
    assert np.abs(Y - As @ X).max() < 1e-4

    # Graph (pattern-only) agreement: Multiply.cpp:35-43 cross-check
    G = Graph.from_edges(m, n, np.repeat(np.arange(m), A.row_nnz()),
                         A.colind)
    yg = np.asarray(multiply("N", 1.0, G.to_sparse(), x, 0.0,
                             np.zeros(m)))
    ones = SparseMatrix(m, n, A.rowptr.copy(), A.colind.copy(),
                        np.ones(A.nnz))
    assert np.abs(yg - ones.to_scipy() @ x).max() < 1e-4
    output(f"Multiply: N/T/SpMM/Graph agree on {m}x{n}, nnz={A.nnz}")


if __name__ == "__main__":
    main()
