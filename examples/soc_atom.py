"""Second-order-cone Jordan-algebra atoms (mirror of
``examples/interface/SOCAtom.py``/``SOC.py``): dets, identity, apply,
inverse, min-eig, max step to the cone boundary."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.optimization.socp import (Cones, in_cone, max_step,
                                             soc_apply, soc_dets,
                                             soc_identity, soc_inverse,
                                             soc_min_eig)


def main():
    args = Args()
    args.process_input()
    cones = Cones([3, 4, 2])
    rng = np.random.default_rng(8)
    e = soc_identity(cones)
    assert in_cone(e, cones)
    # a strictly interior point: identity + small perturbation
    s = e * 2.0
    for o, st in zip([3, 4, 2], [0, 3, 7]):
        s[st + 1:st + o] = 0.3 * rng.standard_normal(o - 1)
    assert in_cone(s, cones)
    dets = soc_dets(s, cones)
    assert (dets > 0).all()
    inv = soc_inverse(s, cones)
    prod = soc_apply(s, inv, cones)
    assert np.allclose(prod, e, atol=1e-10)
    lam = soc_min_eig(s, cones)
    assert lam > 0
    ds = -e
    alpha = max_step(s, ds, cones)
    edge = s + 0.999 * alpha * ds
    assert in_cone(edge, cones, margin=-1e-9)
    output(f"SOC atoms: dets {np.round(dets, 3)}, min-eig {lam:.4f}, "
           f"max step {alpha:.4f} — all identities hold")


if __name__ == "__main__":
    main()
