"""Dynamic-regularization counter (mirror of
``examples/interface/DynamicRegCounter.py``): factor a quasi-definite KKT
with multifrontal RegularizedLDL pivot floors and COUNT how many pivots
the dynamic regularization touched."""
import _path  # noqa: F401
import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp
from elemental_tpu.core.environment import Args, output
from elemental_tpu.sparse import SparseMatrix
from elemental_tpu.sparse_direct.ordering import nested_dissection
from elemental_tpu.sparse_direct.symbolic import analyze
from elemental_tpu.sparse_direct.numeric import factor


def main():
    args = Args()
    args.input("n", "primal size", 60)
    args.input("m", "dual size", 40)
    args.process_input()
    n, m = args["n"], args["m"]
    rng = np.random.default_rng(17)
    Ad = sp.random(m, n, density=0.2, format="csr", random_state=2)
    Ad.data += 0.5
    g = 1e-8
    K = sp.bmat([[g * sp.eye(n), Ad.T], [Ad, -g * sp.eye(m)]],
                format="csr")
    A = SparseMatrix.from_scipy(K)
    symb = analyze(A, perm=nested_dissection(A, cutoff=16)).device()
    floor = 1e-6
    pf = jnp.concatenate([jnp.full(n, floor), jnp.full(m, -floor)])
    num = factor(symb, jnp.asarray(A.vals), pivot_floor=pf)
    d = np.asarray(num.d)
    clamped = int((np.abs(np.abs(d) - floor) < 1e-12).sum())
    output(f"dynamic regularization touched {clamped}/{n + m} pivots "
           f"(floor {floor:g})")
    # the nearly-singular system (static reg 1e-8) would blow the
    # unregularized solve up; with floors the solve stays finite/bounded —
    # the count is the reference driver's observable
    b = rng.standard_normal(n + m)
    x = np.asarray(num.solve(jnp.asarray(b)))
    assert np.isfinite(x).all()
    assert clamped >= 1   # the -g block forces at least one boost
    output(f"regularized solve finite, ||x|| = {np.linalg.norm(x):.3g}")


if __name__ == "__main__":
    main()
