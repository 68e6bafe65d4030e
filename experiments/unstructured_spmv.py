"""Measured kernel experiments for unstructured SpMV (VERDICT r3 #2).

The r3 verdict demanded the MXU one-hot row-combine be TRIED, not argued
about: "If it truly can't work, the refutation must be a measured kernel
experiment written into the docs."  This file is that experiment suite;
EXPERIMENTS.md holds the captured numbers.

Run:  python experiments/unstructured_spmv.py [exp_a|exp_b|exp_c|all]

EXP-A — one-hot MXU combine (the r3 proposal, engineered faithfully):
  entries pre-bucketed by 1024-row output tile; per (8,128) entry tile the
  local row id lr ∈ [0,1024) is factorized lr = 32·hi + lo and the tile is
  reduced into the row-tile accumulator with ONE MXU contraction
  A[h,l] += Σ_e onehot_hi[h,e]·(p⊙onehot_lo)[l,e]  (2·32·32 = 2048
  flops/entry — the budget the verdict quoted).  The ceiling this measures:
  an M=N=32, K=1024 matmul uses (32/128)² = 6.25 % of the MXU, so the
  algebraic bound is util·peak_f32/(2hl) = (hl/128²)·49e12/(2hl)
  ≈ 1.5 Gnnz/s — INDEPENDENT of the radix split (h,l).  The "98 TFLOPs at
  48 Gnnz/s" budget in the verdict assumed full MXU utilization, which no
  one-hot shape can reach: utilization scales with hl while flops scale
  with hl, cancelling exactly.

EXP-B — bridge primitives: dynamic-sublane-offset row stores (the
  write-combining append used by any radix-partition bridge) and
  per-(8,128)-tile fixed permutations (take_along_axis lane/sublane
  routing).  These rates bound every "reorder products from column-sorted
  to row-sorted" design.

EXP-C — end-to-end reference points on the same matrix: the existing
  windowed gather half alone, and the full current pipeline
  (gather + XLA segment_sum).
"""

from __future__ import annotations

import functools
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


def bench(fn, *args, reps=(2, 8), inner=1):
    """Marginal seconds per call via pipelined dispatches + readback."""

    def run(r):
        out = fn(*args)
        jax.tree.map(lambda t: float(jnp.sum(t.astype(jnp.float32))), out)
        t0 = time.perf_counter()
        for _ in range(r):
            out = fn(*args)
        jax.tree.map(lambda t: float(jnp.sum(t.astype(jnp.float32))), out)
        return time.perf_counter() - t0

    r1, r2 = reps
    best = np.inf
    for _ in range(3):
        t1, t2 = run(r1), run(r2)
        best = min(best, (t2 - t1) / (r2 - r1))
    return best / inner


# ---------------------------------------------------------------------------
# EXP-A: one-hot MXU combine
# ---------------------------------------------------------------------------

def make_bucketed(n=1 << 20, d=10, seed=0):
    """Uniform-random rows bucketed by 1024-row tile: per tile a padded
    (SUB, 8, 128) block of products and local row ids (pad rows -> lr 0
    with p 0)."""
    rng = np.random.default_rng(seed)
    nnz = n * d
    rows = rng.integers(0, n, nnz)        # arbitrary order: combine only
    p = rng.standard_normal(nnz).astype(np.float32)
    order = np.argsort(rows >> 10, kind="stable")
    rows, p = rows[order], p[order]
    ntiles = n // 1024
    counts = np.bincount(rows >> 10, minlength=ntiles)
    SUB = int(-(-counts.max() // 1024))          # sub-tiles of 1024
    P = np.zeros((ntiles, SUB * 1024), np.float32)
    LR = np.zeros((ntiles, SUB * 1024), np.int32)
    off = np.zeros(ntiles + 1, np.int64)
    np.cumsum(counts, out=off[1:])
    for t in range(ntiles):
        c = counts[t]
        P[t, :c] = p[off[t]:off[t] + c]
        LR[t, :c] = rows[off[t]:off[t] + c] & 1023
    return (P.reshape(ntiles, SUB, 8, 128), LR.reshape(ntiles, SUB, 8, 128),
            nnz, rows, p)


def onehot_combine(P, LR, *, interpret=False):
    """y[t·1024 + lr] += p summed per row-tile via factorized one-hot MXU
    contraction (lr = 32·hi + lo)."""
    ntiles, SUB, _, _ = P.shape

    def kernel(p_ref, lr_ref, y_ref):
        acc = jnp.zeros((32, 32), jnp.float32)
        iota = jax.lax.broadcasted_iota(jnp.int32, (32, 8, 128), 0)
        for s in range(SUB):
            p = p_ref[0, s]                       # (8,128)
            lr = lr_ref[0, s]
            hi, lo = lr >> 5, lr & 31
            o_hi = (hi[None] == iota).astype(jnp.float32)   # (32,8,128)
            o_lo = (lo[None] == iota).astype(jnp.float32)
            pl_ = p[None] * o_lo                             # (32,8,128)
            acc = acc + jax.lax.dot_general(
                o_hi.reshape(32, 1024), pl_.reshape(32, 1024),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        # acc[h,l] -> y rows 32h+l: store as (32,32) -> caller reshapes
        y_ref[0] = acc

    y = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, SUB, 8, 128), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, 8, 128), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 32, 32), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ntiles, 32, 32), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 32 * 32 * ntiles * SUB * 1024,
            bytes_accessed=P.size * 8, transcendentals=0),
        interpret=interpret,
    )(P, LR)
    return y.reshape(-1)


def exp_a():
    P, LR, nnz, rows, p = make_bucketed()
    Pj, LRj = jnp.asarray(P), jnp.asarray(LR)
    f = jax.jit(lambda P, LR: onehot_combine(P, LR))
    y = np.asarray(f(Pj, LRj))
    expect = np.bincount(rows, weights=p, minlength=1 << 20)
    rel = np.abs(y - expect).max() / np.abs(expect).max()
    print(f"EXP-A correctness rel={rel:.2e}  "
          f"(MXU f32 one-hot contraction carries bf16-level error on v5e "
          f"— another strike against the design for an f32 SpMV contract)")
    assert rel < 5e-3
    dt = bench(f, Pj, LRj)
    print(f"EXP-A one-hot combine: {nnz/dt/1e9:.3f} Gnnz/s "
          f"(pad-incl {P.size/dt/1e9:.3f} Gslot/s; SUB={P.shape[1]}) — "
          f"algebraic ceiling ~1.5 Gnnz/s f32")


# ---------------------------------------------------------------------------
# EXP-B: bridge primitives
# ---------------------------------------------------------------------------

def exp_b():
    """Each primitive measured with a LONG in-kernel loop over
    VMEM-resident data (dispatch floor amortized away): the number is the
    per-op streaming rate a bridge built from that primitive would get."""
    n_tiles = 2048                      # 2048 vregs = 2M elems = 1 MB
    ITER = 40                           # device-side repetitions
    src = jnp.asarray(
        np.random.default_rng(0).standard_normal((n_tiles * 8, 128))
        .astype(np.float32))
    dst_off = jnp.asarray(
        (np.random.default_rng(1).permutation(n_tiles) * 8).astype(np.int32))

    def run(make_kernel, name, elems, check=None, scratch=None, **kw):
        try:
            f = jax.jit(make_kernel)
            y = np.asarray(f(*kw["args"]))
            ok = check(y) if check else True
            dt = bench(f, *kw["args"], reps=(1, 3))
            print(f"{name}: {elems/dt/1e9:.1f} Gelem/s (ok={ok})")
        except Exception as e:  # noqa: BLE001
            print(f"{name} failed: {type(e).__name__}: {str(e)[:160]}")

    # B1: dynamic-sublane-offset vreg stores VMEM->VMEM (write-combining
    # append primitive of any radix-partition bridge)
    def store_kernel(off_ref, src_ref, out_ref):
        def it(j, _):
            def body(i, _):
                o = off_ref[i]
                out_ref[pl.ds(o, 8), :] = src_ref[pl.ds(i * 8, 8), :]
                return 0
            return jax.lax.fori_loop(0, n_tiles, body, 0)
        jax.lax.fori_loop(0, ITER, it, 0)

    run(lambda off, src: pl.pallas_call(
        store_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct(src.shape, src.dtype),
    )(off, src), "EXP-B1 dyn-offset vreg stores (VMEM)",
        n_tiles * 1024 * ITER,
        args=(dst_off, src))

    # B2: per-vreg lane gather (fixed routing primitive) — static slices,
    # the pattern the production windowed-gather kernel uses
    idx_lane = jnp.asarray(
        np.random.default_rng(2).integers(0, 128, (n_tiles * 8, 128))
        .astype(np.int32))
    GROUP = 64                           # vregs per grid step

    # grid = (blocks, ITER): the inner ITER dim revisits the same blocks so
    # the in-VMEM gather op repeats with no HBM restream or dispatch floor
    def route_kernel(src_ref, idx_ref, out_ref):
        for k in range(GROUP):
            sl = slice(8 * k, 8 * k + 8)
            out_ref[sl, :] = jnp.take_along_axis(
                src_ref[sl, :], idx_ref[sl, :], axis=1)

    run(lambda src, idx: pl.pallas_call(
        route_kernel,
        grid=(n_tiles // GROUP, ITER),
        in_specs=[pl.BlockSpec((8 * GROUP, 128), lambda t, j: (t, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((8 * GROUP, 128), lambda t, j: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(src.shape, src.dtype),
    )(src, idx), "EXP-B2 per-vreg lane-gather (in-VMEM op rate)",
        n_tiles * 1024 * ITER,
        check=lambda y: np.allclose(
            y[:8], np.take_along_axis(np.asarray(src[:8]),
                                      np.asarray(idx_lane[:8]), 1)),
        args=(src, idx_lane))

    # B2s: per-vreg SUBLANE gather (8-deep per-lane)
    idx_sub = jnp.asarray(
        np.random.default_rng(4).integers(0, 8, (n_tiles * 8, 128))
        .astype(np.int32))

    def route_sub_kernel(src_ref, idx_ref, out_ref):
        for k in range(GROUP):
            sl = slice(8 * k, 8 * k + 8)
            out_ref[sl, :] = jnp.take_along_axis(
                src_ref[sl, :], idx_ref[sl, :], axis=0)

    run(lambda src, idx: pl.pallas_call(
        route_sub_kernel,
        grid=(n_tiles // GROUP, ITER),
        in_specs=[pl.BlockSpec((8 * GROUP, 128), lambda t, j: (t, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((8 * GROUP, 128), lambda t, j: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(src.shape, src.dtype),
    )(src, idx), "EXP-B2s per-vreg sublane-gather (in-VMEM op rate)",
        n_tiles * 1024 * ITER,
        check=lambda y: np.allclose(
            y[:8], np.take_along_axis(np.asarray(src[:8]),
                                      np.asarray(idx_sub[:8]), 0)),
        args=(src, idx_sub))

    # B3: dynamic lane-roll (misaligned-append rotation)
    shifts = jnp.asarray(
        np.random.default_rng(3).integers(0, 128, n_tiles).astype(np.int32))

    def roll_kernel(sh_ref, src_ref, out_ref):
        def it(j, _):
            def body(i, _):
                out_ref[pl.ds(i * 8, 8), :] = pltpu.roll(
                    src_ref[pl.ds(i * 8, 8), :], sh_ref[i], 1)
                return 0
            return jax.lax.fori_loop(0, n_tiles, body, 0)
        jax.lax.fori_loop(0, ITER, it, 0)

    run(lambda sh, src: pl.pallas_call(
        roll_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct(src.shape, src.dtype),
    )(sh, src), "EXP-B3 dynamic lane-roll", n_tiles * 1024 * ITER,
        check=lambda y: np.allclose(
            y[:8], np.roll(np.asarray(src[:8]), int(shifts[0]), axis=1)),
        args=(shifts, src))


# ---------------------------------------------------------------------------
# EXP-C: current pipeline reference
# ---------------------------------------------------------------------------

def exp_c():
    from elemental_tpu.sparse import SparseMatrix
    from elemental_tpu.kernels.unstructured import (plan_gather_spmv,
                                                    gather_multiply)
    n = 1 << 20
    rng = np.random.default_rng(0)
    rows = np.repeat(np.arange(n), 10)
    cols = rng.integers(0, n, 10 * n)
    vals = rng.standard_normal(10 * n).astype(np.float32)
    A = SparseMatrix.from_coo(n, n, rows, cols, vals)
    plan = plan_gather_spmv(A)
    assert not hasattr(plan, "chunks"), "expected single-panel plan"
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    g = jax.jit(lambda plan, x: gather_multiply(plan, x))
    dt = bench(g, plan, x)
    print(f"EXP-C gather half alone: {A.nnz/dt/1e9:.2f} Gnnz/s")
    full = jax.jit(lambda plan, x: plan.matvec(x))
    dt = bench(full, plan, x, reps=(1, 3))
    print(f"EXP-C full current pipeline: {A.nnz/dt/1e9:.3f} Gnnz/s")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("exp_a", "all"):
        exp_a()
    if which in ("exp_b", "all"):
        exp_b()
    if which in ("exp_c", "all"):
        exp_c()
