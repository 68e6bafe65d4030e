"""Trivial SOCP (mirror of ``examples/interface/SOCP_trivial.py``):
min c'x s.t. Gx + s = h, s in a product of Lorentz cones."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.optimization import Cones, LPCtrl, socp_affine


def main():
    rng = np.random.default_rng(11)
    # min t s.t. (t, x - x0) in SOC  ==> t* = 0, x = x0
    n = 5
    x0 = rng.standard_normal(n)
    nv = n + 1
    G = np.zeros((n + 1, nv)); h = np.zeros(n + 1)
    G[0, n] = -1.0
    G[1:, :n] = -np.eye(n); h[1:] = -x0
    c = np.zeros(nv); c[n] = 1.0
    res = socp_affine(np.zeros((0, nv)), np.zeros(0), G, h, c,
                      Cones([n + 1]), LPCtrl(tol=1e-9))
    err = np.linalg.norm(res.x[:n] - x0)
    output(f"SOCP_trivial: t* = {res.objective:.2e}, ||x - x0|| = {err:.2e}")
    assert abs(res.objective) < 1e-6 and err < 1e-5


if __name__ == "__main__":
    main()
