"""Sparse sequential LSE (mirror of ``examples/interface/SequentialLSE.py``):
min ‖Ax − c‖ s.t. Bx = d with A the reference's FD2D stencil (including
its dense last column) and B dense random constraint rows."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.lapack import sparse_lse
from elemental_tpu.sparse import SparseMatrix


def fd2d(n0, n1):
    n = n0 * n1
    s = np.arange(n)
    x, y = s % n0, s // n0
    rows = [s]
    cols = [s]
    vals = [np.full(n, 11.0)]
    for mask, col, v in [(x > 0, s - 1, -1.0), (x < n0 - 1, s + 1, 2.0),
                         (y > 0, s - n0, -3.0), (y < n1 - 1, s + n0, 4.0)]:
        rows.append(s[mask])
        cols.append(col[mask])
        vals.append(np.full(int(mask.sum()), v))
    rows.append(s)
    cols.append(np.full(n, n - 1))
    vals.append(np.full(n, -10.0 / n))
    return SparseMatrix.from_coo(n, n, np.concatenate(rows),
                                 np.concatenate(cols),
                                 np.concatenate(vals))


def main():
    args = Args()
    args.input("n0", "x grid", 10)
    args.input("n1", "y grid", 10)
    args.input("p", "constraint rows", 5)
    args.process_input()
    A = fd2d(args["n0"], args["n1"])
    n = A.shape[1]
    p = args["p"]
    rng = np.random.default_rng(6)
    B = SparseMatrix.from_dense(rng.uniform(0, 1, (p, n)))
    c = rng.standard_normal(n)
    d = rng.standard_normal(p)
    x, resid = sparse_lse(A, B, c, d)
    x = np.asarray(x)
    cons = np.abs(B.to_dense() @ x - d).max()
    from elemental_tpu.core.policy import default_real_dtype, residual_bound
    bound = residual_bound(default_real_dtype(), n) * (1 + np.abs(d).max())
    assert cons < bound, (cons, bound)
    # optimality: Aᵀr ∈ range(Bᵀ) — check projection orthogonal to ker(Bᵀ)
    As = A.to_scipy()
    g = As.T @ (c - As @ x)
    Bd = B.to_dense()
    coef = np.linalg.lstsq(Bd.T, g, rcond=None)[0]
    perp = np.abs(g - Bd.T @ coef).max()
    scale = np.abs(As.data).max() * np.linalg.norm(c) + 1
    assert perp < residual_bound(default_real_dtype(), n) * scale
    output(f"sparse LSE: constraint err {cons:.3e}, "
           f"‖P_ker(Bᵀ)·Aᵀr‖∞ {perp:.3e}, residual {float(resid):.4g}")


if __name__ == "__main__":
    main()
