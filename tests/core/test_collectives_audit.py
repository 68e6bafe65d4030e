"""HLO collective audit (utils/collectives.py — the comm-volume proxy the
weak-scaling table reports; reference per-rank accounting,
``SparseLDL.cpp:129-196``)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from elemental_tpu.utils.collectives import collective_audit


def _mesh(n):
    return Mesh(np.array(jax.devices("cpu")[:n]), ("x",))


def test_psum_counts_and_bytes():
    mesh = _mesh(4)
    from jax.experimental.shard_map import shard_map

    def f(x):
        return shard_map(lambda a: jax.lax.psum(a, "x"), mesh=mesh,
                         in_specs=P("x"), out_specs=P())(x)

    x = jax.device_put(np.ones((8, 128), np.float32),
                       NamedSharding(mesh, P("x")))
    audit = collective_audit(f, x)
    assert audit["all-reduce"]["count"] >= 1
    # output of the psum is (2,128) f32 per shard → bytes > 0
    assert audit["all-reduce"]["bytes"] > 0
    assert audit["total"]["count"] == sum(
        v["count"] for k, v in audit.items() if k != "total")


def test_all_gather_bytes_scale_with_size():
    mesh = _mesh(4)
    from jax.experimental.shard_map import shard_map

    def make(n):
        def f(x):
            return shard_map(
                lambda a: jax.lax.all_gather(a, "x", tiled=True),
                mesh=mesh, in_specs=P("x"), out_specs=P(),
                check_rep=False)(x)
        return f

    def put(n):
        return jax.device_put(np.ones((n, 128), np.float32),
                              NamedSharding(mesh, P("x")))

    small = collective_audit(make(8), put(8))["all-gather"]["bytes"]
    big = collective_audit(make(32), put(32))["all-gather"]["bytes"]
    assert small > 0 and big >= 4 * small * 0.9       # ~linear in size


def test_no_collectives_single_device():
    audit = collective_audit(lambda x: x * 2 + 1,
                             jnp.ones((4, 4), jnp.float32))
    assert audit["total"]["count"] == 0
    assert audit["total"]["bytes"] == 0
