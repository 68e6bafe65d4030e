"""Affine-form QP (mirror of ``examples/interface/QPAffine.py``):
min ½xᵀQx + cᵀx s.t. Ax = b, Gx + s = h, s ≥ 0 — box constraints via
G = [I; −I] on a random strongly convex objective."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.optimization import LPCtrl, qp_affine


def main():
    args = Args()
    args.input("n", "variables", 12)
    args.input("m", "equalities", 3)
    args.process_input()
    n, m = args["n"], args["m"]
    rng = np.random.default_rng(5)
    M = rng.standard_normal((n, n))
    Q = M @ M.T + n * np.eye(n)
    c = rng.standard_normal(n)
    A = rng.standard_normal((m, n))
    x_feas = rng.uniform(-0.4, 0.4, n)
    b = A @ x_feas
    # box |x| ≤ 1 as Gx + s = h, s ≥ 0
    G = np.concatenate([np.eye(n), -np.eye(n)])
    h = np.ones(2 * n)

    res = qp_affine(Q, A, b, G, h, c, LPCtrl(tol=1e-8))
    x = res.x
    assert np.linalg.norm(A @ x - b) / (1 + np.linalg.norm(b)) < 1e-3
    assert np.abs(x).max() <= 1.0 + 1e-4
    obj = 0.5 * x @ Q @ x + c @ x
    # the solution must beat every random feasible point (convexity check)
    for _ in range(20):
        xr = rng.uniform(-1, 1, n)
        # project onto Ax=b affinely
        corr = np.linalg.lstsq(A, b - A @ xr, rcond=None)[0]
        xr = np.clip(xr + corr, -1, 1)
        if np.linalg.norm(A @ xr - b) > 1e-8 * (1 + np.linalg.norm(b)):
            continue
        objr = 0.5 * xr @ Q @ xr + c @ xr
        assert obj <= objr + 1e-5 * (1 + abs(objr)), (obj, objr)
    output(f"QP affine: objective {obj:.6g}, converged={res.converged}, "
           f"its={res.iterations}")


if __name__ == "__main__":
    main()
