"""Core tier tests: Grid, Dist calculus, DistMatrix redistribution round-trips
(model: reference ``tests/core/`` — DistMatrix.cpp redistribution round-trips
over all 13 pairs, DifferentGrids.cpp cross-grid copies)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from elemental_tpu.core import (DIST_PAIRS, DistMatrix, Grid, MC, MR, STAR,
                                VC, VR, CIRC, distribute,
                                translate_between_grids, partition_spec)


def test_grid_shapes(grid8):
    assert grid8.size == 8
    assert grid8.height * grid8.width == 8
    assert grid8.mesh.axis_names == ("mc", "mr")


def test_grid_near_square():
    g = Grid(devices=jax.devices("cpu"))  # 8 devices → 2x4
    assert (g.height, g.width) == (2, 4)


def test_distribute_and_gather(grid8):
    a = np.arange(64, dtype=np.float32).reshape(8, 8)
    A = distribute(a, MC, MR, grid8)
    assert A.shape == (8, 8)
    np.testing.assert_array_equal(A.to_numpy(), a)


@pytest.mark.parametrize("pair", DIST_PAIRS, ids=lambda p: f"{p[0].value}_{p[1].value}")
def test_redistribution_roundtrip(grid8, pair):
    """[MC,MR] → [U,V] → [MC,MR] preserves every entry (the reference's
    DistMatrix test over all pairs)."""
    cd, rd = pair
    a = np.random.default_rng(0).standard_normal((16, 24)).astype(np.float32)
    A = distribute(a, MC, MR, grid8)
    B = A.redistribute(cd, rd)
    assert B.dist() == (cd, rd)
    C = B.redistribute(MC, MR)
    np.testing.assert_array_equal(C.to_numpy(), a)


def test_redistribution_under_jit(grid8):
    a = np.random.default_rng(1).standard_normal((16, 16)).astype(np.float32)

    @jax.jit
    def f(A: DistMatrix):
        B = A.redistribute(VC, STAR)
        return B.redistribute(MC, MR)

    A = distribute(a, MC, MR, grid8)
    out = f(A)
    assert isinstance(out, DistMatrix)
    np.testing.assert_allclose(out.to_numpy(), a)


def test_transpose_dist(grid8):
    a = np.random.default_rng(2).standard_normal((8, 12)).astype(np.float32)
    A = distribute(a, MC, MR, grid8)
    At = A.T
    assert At.dist() == (MR, MC)
    np.testing.assert_array_equal(At.to_numpy(), a.T)


def test_different_grids(grid8, grid4):
    """Cross-grid copy (reference ``tests/core/DifferentGrids.cpp:36-74``)."""
    a = np.random.default_rng(3).standard_normal((12, 12)).astype(np.float32)
    A = distribute(a, MC, MR, grid8)
    B = translate_between_grids(A, grid4)
    assert B.grid is grid4
    np.testing.assert_array_equal(B.to_numpy(), a)
    C = translate_between_grids(B, grid8)
    np.testing.assert_array_equal(C.to_numpy(), a)


def test_pytree_roundtrip(grid8):
    a = np.ones((4, 4), np.float32)
    A = distribute(a, MC, MR, grid8)
    leaves, tree = jax.tree_util.tree_flatten(A)
    assert len(leaves) == 1
    B = jax.tree_util.tree_unflatten(tree, leaves)
    assert B.dist() == A.dist() and B.grid == A.grid


def test_partition_spec_calculus():
    from jax.sharding import PartitionSpec as P
    assert partition_spec(MC, MR) == P("mc", "mr")
    assert partition_spec(VC, STAR) == P(("mc", "mr"), None)
    assert partition_spec(VR, STAR) == P(("mr", "mc"), None)
    assert partition_spec(STAR, STAR) == P(None, None)


def test_dist_algebra():
    from elemental_tpu.core import diag_col, transpose_pair, partial_dist
    from elemental_tpu.core.dist import MD
    assert diag_col(MC, MR) == MD
    assert transpose_pair(MC, MR) == (MR, MC)
    assert partial_dist(VC) == MC


def test_local_sharding_is_real(grid8):
    """Data must actually be sharded over the 8 devices, not replicated."""
    a = np.zeros((16, 16), np.float32)
    A = distribute(a, MC, MR, grid8)
    shard_shapes = {s.data.shape for s in A.data.addressable_shards}
    assert shard_shapes == {(8, 4)}  # 16/2 x 16/4
    assert len(A.data.addressable_shards) == 8
