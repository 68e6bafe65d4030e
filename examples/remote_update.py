"""Remote entrywise updates (mirror of
``examples/interface/RemoteUpdate.py``): any caller queues updates/pulls
against a distributed matrix; ProcessQueues drains them as one sharded
scatter-add."""
import _path  # noqa: F401
import numpy as np
import jax
import elemental_tpu as el
from elemental_tpu.core.environment import Args, output


def main():
    args = Args()
    args.input("n", "size", 24)
    args.process_input()
    n = args["n"]
    try:
        g = el.Grid(devices=jax.devices("cpu")[:4], height=2)
    except Exception:
        g = el.Grid.default()
    A = el.distribute(np.zeros((n, n), np.float32), el.MC, el.MR, g)
    rng = np.random.default_rng(15)
    expect = np.zeros((n, n), np.float32)
    for _ in range(50):
        i, j = int(rng.integers(n)), int(rng.integers(n))
        v = float(rng.standard_normal())
        A.queue_update(i, j, v)
        expect[i, j] += np.float32(v)
    A = A.process_queues()
    got = A.to_numpy()
    assert np.allclose(got, expect, atol=1e-6)
    A.queue_pull(0, 0)
    A.queue_pull(n - 1, n - 1)
    vals = A.process_pull_queue()
    assert np.allclose(vals, [expect[0, 0], expect[-1, -1]], atol=1e-6)
    output(f"remote updates: 50 queued updates + 2 pulls verified on "
           f"{g.size}-device grid")


if __name__ == "__main__":
    main()
