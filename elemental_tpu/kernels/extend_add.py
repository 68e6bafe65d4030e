"""Pallas extend-add: the multifrontal child→parent Schur accumulation
(reference ``SparseAllToAll`` pack/unpack,
``src/lapack_like/factor/LDL/sparse/numeric/Process.hpp:150-275``).

Measured r4: XLA's flat ``pool.at[dst].add(pool[src])`` extend-add emits
SCALAR gather/scatter (~0.03 Gelem/s) and eats 84 % of factor wall time.
Two structural facts admit a fast path (prototyped at 26 Gelem/s in
``experiments/extend_add.py``):

* each child Schur ROW is CONTIGUOUS in the front pool, and elimination
  structs are sorted, so the sources feeding one parent-row 128-lane
  chunk are ONE run of ≤128 consecutive pool elements — they fit a
  2-row window of the pool viewed as (rows, 128);
* XLA's gather IS fast at whole-row granularity (measured r5 on v5e:
  13-23 Gelem/s for (1,128)-slice gathers vs 0.116 Gelem/s for element
  gathers) — only sub-128-lane routing needs Pallas.

So the production pipeline per (level, round) is

  1. ``W = pool.reshape(-1,128)[wpair]`` — XLA row-gather of each
     destination chunk-row's 2-row window, and
  2. :func:`ea_route_add` — this kernel: a dense lane-route
     (``take_along_axis`` within the per-row 256-element window) that
     accumulates into the destination blocks selected by a
     scalar-prefetched block map (``input_output_aliases`` in-place).

Rounds make each destination row receive at most one source run per
call; ``sparse_direct/ea_plan.py`` emits the plans.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 8          # destination chunk-rows per grid step


def _route_kernel(dstblk_ref, idx_ref, w_ref, segin_ref, out_ref):
    idx = idx_ref[:].astype(jnp.int32)       # (BR, 128); -1 = inactive
    valid = idx >= jnp.int32(0)
    i0 = jnp.maximum(idx, jnp.int32(0))
    lane = jnp.bitwise_and(i0, jnp.int32(127))
    sel = jnp.right_shift(i0, jnp.int32(7))  # which of the 2 window rows
    w = w_ref[:]                             # (BR, 2, 128)
    g0 = jnp.take_along_axis(w[:, 0, :], lane, axis=1)
    g1 = jnp.take_along_axis(w[:, 1, :], lane, axis=1)
    u = jnp.where(sel == 0, g0, g1)
    out_ref[:] = segin_ref[:] + jnp.where(valid, u,
                                          jnp.zeros((), out_ref.dtype))


@functools.partial(jax.jit, static_argnames=("interpret",))
def ea_route_add(seg, w, idx, dstblk, *, interpret: bool = False):
    """``seg[dstblk[s]·BR + j] += route(w[s·BR+j], idx[s·BR+j])``.

    seg:    (R, 128) destination segment in chunk-row view; its LAST
            ``BLOCK_ROWS`` rows are scratch absorbing padded grid steps.
    w:      (ns·BR, 2, 128) pre-gathered per-row source windows.
    idx:    (ns·BR, 128) int16 window-local source index in [0, 256);
            -1 marks inactive lanes.
    dstblk: (ns,) int32 destination block per grid step (sorted, unique
            except for trailing scratch-block padding).
    """
    ns = dstblk.shape[0]
    br = BLOCK_ROWS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,               # dstblk
        grid=(ns,),
        in_specs=[
            pl.BlockSpec((br, 128), lambda s, db: (s, 0),
                         memory_space=pltpu.VMEM),                 # idx
            pl.BlockSpec((br, 2, 128), lambda s, db: (s, 0, 0),
                         memory_space=pltpu.VMEM),                 # windows
            pl.BlockSpec((br, 128), lambda s, db: (db[s], 0),
                         memory_space=pltpu.VMEM),                 # seg in
        ],
        out_specs=pl.BlockSpec((br, 128), lambda s, db: (db[s], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _route_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(seg.shape, seg.dtype),
        input_output_aliases={3: 0},         # seg accumulates in place
        interpret=interpret,
    )(dstblk, idx, w, seg)
