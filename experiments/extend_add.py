"""Prototype + measurement of the windowed Pallas EXTEND-ADD
(the r5 design specced in ``sparse_direct/numeric.py``).

The multifrontal factor spends 84 % of wall time in the XLA
gather+scatter extend-add (~0.03 Gelem/s, measured r4).  The structural
facts that admit a fast kernel:

* each child Schur ROW is CONTIGUOUS in the pool;
* its parent (row, column) maps are MONOTONE (elimination structs are
  sorted subsets), so a parent-row 128-chunk draws from ONE ≤256-element
  window of one child row — a broadcast-row ``take_along_axis`` + mask,
  exactly the windowed-gather primitive the unstructured SpMV tier uses,
  plus an in-place accumulate via ``input_output_aliases``.

This prototype runs the kernel on a synthetic child pool (VMEM-resident:
measures the COMPUTE rate; HBM staging of child segments is the
remaining engineering, see numeric.py) and checks exactness vs NumPy.

Run: python experiments/extend_add.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUPER = 64           # output sublane-rows per grid step


def _ea_kernel(woff_ref, idx_ref, mval_ref, src_ref, outin_ref,
               out_ref):
    s = pl.program_id(0)
    idx_all = idx_ref[:]                    # (8*SUPER, 128) local ∈ [0,256)
    m_all = mval_ref[:]
    lane = jnp.bitwise_and(idx_all, 127)
    sel = jnp.right_shift(idx_all, 7)
    for k in range(SUPER):
        base = woff_ref[s * SUPER + k]
        lo, hi = 8 * k, 8 * k + 8
        w0 = jnp.broadcast_to(src_ref[pl.ds(base, 1), :], (8, 128))
        w1 = jnp.broadcast_to(src_ref[pl.ds(base + 1, 1), :], (8, 128))
        g0 = jnp.take_along_axis(w0, lane[lo:hi], axis=1)
        g1 = jnp.take_along_axis(w1, lane[lo:hi], axis=1)
        u = jnp.where(sel[lo:hi] == 0, g0, g1)
        out_ref[lo:hi, :] = outin_ref[lo:hi, :] + m_all[lo:hi] * u


def extend_add(out, src2, woff, idx, mval, *, interpret=False):
    """out[r, :] += mask * src2[window(r)][idx[r]] for every 128-chunk row
    r — windows are per-SUBLANE-ROW (8 rows per wb entry like the SpMV
    gather would be per-vreg; here per-row for generality)."""
    R = out.shape[0]
    ns = -(-R // (8 * SUPER))
    Rp = ns * SUPER * 8
    outp = jnp.pad(out, ((0, Rp - R), (0, 0)))
    idxp = jnp.pad(idx, ((0, Rp - R), (0, 0)))
    mvalp = jnp.pad(mval, ((0, Rp - R), (0, 0)))
    # prototype restriction: one window base per 8-row group
    wg = woff[::8]
    woffp = jnp.pad(wg, (0, ns * SUPER - wg.shape[0]))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ns,),
        in_specs=[
            pl.BlockSpec((8 * SUPER, 128), lambda s, w: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * SUPER, 128), lambda s, w: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * SUPER, 128), lambda s, w: (s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8 * SUPER, 128), lambda s, w: (s, 0),
                               memory_space=pltpu.VMEM),
    )
    res = pl.pallas_call(
        _ea_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Rp, 128), out.dtype),
        input_output_aliases={4: 0},     # accumulate in place into out
        interpret=interpret,
    )(woffp, idxp, mvalp, src2, outp)
    return res[:R]


def main():
    rng = np.random.default_rng(0)
    # synthetic: R output chunks; per 8-row group one 256-elem window into
    # a VMEM-resident child pool; monotone local indices with holes
    R = 1 << 16                      # 65536 chunk-rows = 8.4M output elems
    Sr = 1 << 14                     # child pool: 16384 rows = 2M elements
    src = rng.standard_normal((Sr, 128)).astype(np.float32)
    out0 = rng.standard_normal((R, 128)).astype(np.float32)
    woff8 = rng.integers(0, Sr - 2, R // 8).astype(np.int32)
    woff = np.repeat(woff8, 8)
    # monotone-with-holes local indices per row + ~30 % masked slots
    idx = np.sort(rng.integers(0, 256, (R, 128)), axis=1).astype(np.int32)
    mval = (rng.random((R, 128)) < 0.7).astype(np.float32)

    f = jax.jit(lambda o, s, w, i, m: extend_add(o, s, w, i, m))
    got = np.asarray(f(jnp.asarray(out0), jnp.asarray(src),
                       jnp.asarray(woff), jnp.asarray(idx),
                       jnp.asarray(mval)))
    flat = src.reshape(-1)
    gathered = flat[(woff[:, None] * 128 + idx)]
    expect = out0 + mval * gathered
    err = np.abs(got - expect).max()
    print(f"extend-add prototype correctness: max err {err:.2e}")
    assert err == 0.0

    args = [jnp.asarray(x) for x in (out0, src, woff, idx, mval)]
    float(jnp.sum(f(*args)))
    def run(reps):
        o = None
        t0 = time.perf_counter()
        for _ in range(reps):
            o = f(*args)
        float(jnp.sum(o))
        return time.perf_counter() - t0
    best = np.inf
    for _ in range(3):
        t1, t2 = run(2), run(10)
        best = min(best, (t2 - t1) / 8)
    rate = R * 128 / best / 1e9
    print(f"extend-add prototype: {rate:.1f} Gelem/s "
          f"(vs 0.03 Gelem/s for the XLA gather+scatter path — "
          f"×{rate/0.03:.0f})")


if __name__ == "__main__":
    main()
