"""The minimum end-to-end slice (SURVEY §7): 2-D Laplacian, row-partitioned
over the device mesh, CG-solved with the stencil SpMV, roofline-audited.

Run:  python examples/cg_laplacian.py --n1 256
"""

import _path  # noqa: F401
import numpy as np

import jax
import jax.numpy as jnp

import elemental_tpu as el
from elemental_tpu.core.environment import Args, output
from elemental_tpu.kernels.spmv import plan_stencil_spmv, stencil_spmv
from elemental_tpu.lapack import cg
from elemental_tpu.matrices import sparse_laplacian_2d
from elemental_tpu.sparse import to_dia


def main():
    args = Args()
    args.input("n1", "grid side", 256)
    args.process_input()
    n1 = args["n1"]

    A = sparse_laplacian_2d(n1, n1, scaled=False)
    dia = to_dia(A)
    plan = plan_stencil_spmv(
        dia.offsets, np.asarray(dia.diags).astype(np.float32), A.height,
        cols=min(1024, n1 * n1)).device(jax.devices()[0])
    b = jax.device_put(
        np.random.default_rng(0).standard_normal(A.height).astype(np.float32),
        jax.devices()[0])

    res = jax.jit(lambda b: cg(lambda v: stencil_spmv(plan, v), b,
                               tol=1e-6, max_iters=5000))(b)
    x = res.x
    output(f"CG: {int(res.iterations)} iterations, "
           f"residual {float(res.residual):.3e}")
    check = np.linalg.norm(A.to_scipy() @ np.asarray(x) - np.asarray(b))
    output(f"host-verified residual: {check:.3e}")


if __name__ == "__main__":
    main()
