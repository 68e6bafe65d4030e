"""LLL lattice reduction drivers (reference
``examples/interface/{LLL,ZDependenceSearch,AlgebraicRelationSearch}.py``).

Run: python examples/lll_reduction.py
"""
import _path  # noqa: F401
import numpy as np

from elemental_tpu.lapack import (algebraic_relation_search, lll,
                                  z_dependence_search)

rng = np.random.default_rng(0)
B = np.round(rng.uniform(0.0, 10.0, (50, 50)))

for presort, smallest in [(True, False), (True, True), (False, False)]:
    for delta in (0.5, 0.75, 0.95, 0.98):
        for variant in ("weak", "normal", "deep"):
            Br, U, R, info = lll(B.copy(), delta, variant=variant,
                                 presort=presort, smallest_first=smallest)
            print(f"variant={variant:6s} presort={presort} "
                  f"smallest1st={smallest} delta={delta}: "
                  f"achieved delta={info.delta:.3f} eta={info.eta:.3f} "
                  f"nullity={info.nullity} swaps={info.num_swaps} "
                  f"|b1|={np.linalg.norm(Br[:, 0]):.2f}")
        break  # keep the demo quick; inner loops mirror the reference driver
    break

# hidden integer relation (ZDependenceSearch.py)
n = 20
z = rng.uniform(10.0, 15.0, n)
a_hidden = np.round(rng.uniform(-5.0, 5.0, n - 1))
z[-1] = a_hidden @ z[:-1]
a, res, _ = z_dependence_search(z, n_sqrt=1e8)
print("integer relation residual:", res)

# minimal polynomial of sqrt(2) (AlgebraicRelationSearch.py)
c, res, _ = algebraic_relation_search(np.sqrt(2.0), 2, n_sqrt=1e8)
print("minpoly of sqrt(2):", c, "residual", res)
