"""Remote distributed-sparse assembly (mirror of
``examples/interface/RemoteDistSparse.py``): every "rank" queues updates
for rows it does NOT own (the strided remote pattern), ProcessQueues
routes them, and the assembled operator is verified by a distributed
SpMV against the host stencil."""
import _path  # noqa: F401
import numpy as np
import jax
import elemental_tpu as el
from elemental_tpu.core.environment import Args, output
from elemental_tpu.sparse import DistSparseMatrix, SparseBuilder


def remote_stacked_fd2d(n0, n1, nranks):
    """The reference's RemoteStackedFD2D: each rank r queues the rows
    s ≡ r (mod nranks) — all remote except ~1/nranks of them."""
    height, width = 2 * n0 * n1, n0 * n1
    kb = SparseBuilder(height, width)
    for r in range(nranks):
        for s in range(r, height, nranks):
            if s < n0 * n1:
                x0, x1 = s % n0, s // n0
                kb.queue_update(s, s, 1.0)
                if x0 > 0:
                    kb.queue_update(s, s - 1, -1.0)
                if x0 + 1 < n0:
                    kb.queue_update(s, s + 1, 2.0)
                if x1 > 0:
                    kb.queue_update(s, s - n0, -3.0)
                if x1 + 1 < n1:
                    kb.queue_update(s, s + n0, 4.0)
            else:
                sr = s - n0 * n1
                x0, x1 = sr % n0, sr // n0
                kb.queue_update(s, sr, -2.0)
                if x0 > 0:
                    kb.queue_update(s, sr - 1, -1.0)
                if x0 + 1 < n0:
                    kb.queue_update(s, sr + 1, -2.0)
                if x1 > 0:
                    kb.queue_update(s, sr - n0, -3.0)
                if x1 + 1 < n1:
                    kb.queue_update(s, sr + n0, 3.0)
    return kb.process_queues()


def main():
    args = Args()
    args.input("n0", "x grid", 12)
    args.input("n1", "y grid", 12)
    args.process_input()
    n0, n1 = args["n0"], args["n1"]
    try:
        g = el.Grid(devices=jax.devices("cpu")[:4], height=2)
    except Exception:
        g = el.Grid.default()
    A = remote_stacked_fd2d(n0, n1, g.size)
    dA = DistSparseMatrix.from_sparse(A, g)
    rng = np.random.default_rng(9)
    x = rng.standard_normal(A.shape[1])
    y = np.asarray(dA.matvec(x))
    expect = A.to_scipy() @ x
    err = np.abs(y - expect).max() / np.abs(expect).max()
    assert err < 1e-5, err
    output(f"remote dist-sparse assembly: {A.nnz} entries queued across "
           f"{g.size} owners, SpMV err {err:.2e}")


if __name__ == "__main__":
    main()
