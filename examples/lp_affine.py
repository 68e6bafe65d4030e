"""Affine-form LP (mirror of ``examples/interface/LPAffine.py``):
min cᵀx s.t. Ax = b, Gx + s = h, s ≥ 0."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.optimization import LPCtrl, lp_affine
from elemental_tpu.sparse import SparseMatrix


def main():
    args = Args()
    args.input("m", "equality rows", 6)
    args.input("n", "variables", 20)
    args.input("k", "inequality rows", 30)
    args.process_input()
    rng = np.random.default_rng(9)
    m, n, k = args["m"], args["n"], args["k"]
    A = rng.standard_normal((m, n))
    G = rng.standard_normal((k, n))
    xf = rng.standard_normal(n)
    b = A @ xf
    h = G @ xf + np.abs(rng.standard_normal(k)) + 0.5
    c = rng.standard_normal(n)
    res = lp_affine(SparseMatrix.from_dense(A), b,
                    SparseMatrix.from_dense(G), h, c, LPCtrl(tol=1e-9))
    import scipy.optimize as so
    ref = so.linprog(c, A_ub=G, b_ub=h, A_eq=A, b_eq=b,
                     bounds=(None, None), method="highs")
    output(f"LPAffine: obj {res.objective:.8g} vs HiGHS {ref.fun:.8g}")
    assert abs(res.objective - ref.fun) < 1e-5 * (1 + abs(ref.fun))


if __name__ == "__main__":
    main()
