"""GEPP growth driver (mirror of ``examples/interface/GEPPGrowth.py``):
the Wilkinson matrix attaining 2^{n-1} partial-pivoting growth."""
import _path  # noqa: F401
import numpy as np
import jax.numpy as jnp
from elemental_tpu.core.environment import Args, output
from elemental_tpu.lapack import lu
from elemental_tpu.matrices import gepp_growth


def main():
    args = Args()
    args.input("n", "size", 16)
    args.process_input()
    n = args["n"]
    A = gepp_growth(n)
    fact = lu(jnp.asarray(np.asarray(A, np.float64)))
    u = np.triu(np.asarray(fact.lu))
    growth = np.abs(u).max() / np.abs(np.asarray(A)).max()
    output(f"GEPP growth on Wilkinson({n}): {growth:.1f} "
           f"(theory 2^{n - 1} = {2 ** (n - 1)})")
    from elemental_tpu.core.policy import x64_enabled
    if x64_enabled():
        # host LAPACK getrf: classical partial pivoting, exact 2^{n-1}
        assert abs(growth - 2 ** (n - 1)) / 2 ** (n - 1) < 1e-10, growth
    else:
        # the TPU LuDecomposition expander uses a different (blocked)
        # pivot order that sidesteps the adversarial growth — itself an
        # interesting datum; just assert a valid factorization
        P = np.asarray(fact.perm)
        L = np.tril(np.asarray(fact.lu), -1) + np.eye(n)
        r = np.abs((L @ u) - np.asarray(A, np.float32)[P]).max()
        assert r < 1e-3, r


if __name__ == "__main__":
    main()
