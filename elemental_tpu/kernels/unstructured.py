"""Unstructured SpMV building blocks (Pallas, TPU-native).

The hardware facts that shape this design (measured on v5 lite this round):

* XLA's gather/scatter emitters are fast ONLY as standalone dispatches with
  the index arrays passed as jit ARGUMENTS; embedded in loop bodies or as
  jaxpr constants they fall to a ~0.06 Gnnz/s scalar path.  A Pallas kernel
  keeps its code shape wherever it is called — loops included.
* Mosaic's only vector gather is ``tpu.dynamic_gather`` — per-lane gather
  WITHIN one (8,128) vreg (``jnp.take_along_axis`` on the lane or sublane
  axis).  There is no vector gather across a large VMEM buffer and no
  vector scatter at all.

So the kernel processes entries SORTED BY COLUMN: 1024 consecutive entries
of a matrix with nnz/row ≳ a few span only ~n/nnz·1024 columns, so each
(8,128) tile reads from a 256-column window = two 128-lane rows of x
(viewed as (n/128, 128)).  The gather is then two broadcast-row
``take_along_axis`` ops + a select — pure VPU work, no scalar path.  The
host planner splits tiles at window boundaries (padding, typically <5 %).

The row-side combine (products are in column order) is a separate sorted
``segment_sum`` dispatch on the permuted-row ids — fast at XLA level with
argument-passed indices; fusing it into the kernel would require a vector
scatter the hardware does not have.

Reference spec: sparse ``Multiply`` (``tests/blas_like/Multiply.cpp:19-46``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.statics import register_plan_pytree

TILE = 1024          # entries per tile = one (8,128) vreg
WIN = 256            # window: two aligned 128-lane x-rows


@dataclasses.dataclass
class GatherPlan:
    """Host-built plan for y = A·x with column-sorted entry processing."""

    n_rows: int
    n_cols: int
    nnz: int                 # real entries (before tile padding)
    ntiles: int
    cols_local: jnp.ndarray  # (ntiles*TILE,) int32: c − 128·wb ∈ [0, 256)
    vals: jnp.ndarray        # (ntiles*TILE,) padded entries = 0
    rows: jnp.ndarray        # (ntiles*TILE,) int32 row ids; pad → n_rows
    wb: jnp.ndarray          # (ntiles,) int32 window base x-row
    xrows: int               # padded x rows (n_cols/128 + 1 guard)

    def matvec(self, x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
        p = gather_multiply(self, x, interpret=interpret)
        return jax.ops.segment_sum(p, self.rows, num_segments=self.n_rows)


register_plan_pytree(GatherPlan, ("cols_local", "vals", "rows", "wb"))


# VMEM budget for the resident x panel (the kernel keeps all of x in VMEM
# as (n/128, 128)); wider matrices are split into column chunks
# (VERDICT r3 weak #8: no guard → compile failure past ~2-3M columns).
VMEM_X_BYTES = 6 * 1024 * 1024


@dataclasses.dataclass
class ChunkedGatherPlan:
    """Column-chunked windowed-gather SpMV: each chunk is a GatherPlan over
    a column slice of A (x slice resident in VMEM); y = Σ chunk partials."""

    n_rows: int
    n_cols: int
    nnz: int
    chunks: Tuple[GatherPlan, ...]
    col_starts: Tuple[int, ...]       # chunk i covers [starts[i], starts[i+1])

    def matvec(self, x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
        y = jnp.zeros(self.n_rows, self.chunks[0].vals.dtype)
        for i, ch in enumerate(self.chunks):
            xs = x[self.col_starts[i]:self.col_starts[i + 1]]
            p = gather_multiply(ch, xs, interpret=interpret)
            y = y + jax.ops.segment_sum(p, ch.rows,
                                        num_segments=self.n_rows)
        return y


register_plan_pytree(ChunkedGatherPlan, ("chunks",))


def plan_gather_spmv(A, vmem_x_bytes: int = VMEM_X_BYTES):
    """Build the column-sorted windowed plan from a host CSR SparseMatrix.
    Returns a :class:`GatherPlan`, or a :class:`ChunkedGatherPlan` when the
    x panel would not fit the VMEM budget."""
    item = max(np.asarray(A.vals).dtype.itemsize, 4)
    if A.width * item > vmem_x_bytes:
        ncols_chunk = (vmem_x_bytes // item) // 128 * 128
        starts = list(range(0, A.width, ncols_chunk)) + [A.width]
        sp = A.to_scipy().tocsc()
        chunks = []
        from ..sparse.csr import SparseMatrix
        for i in range(len(starts) - 1):
            sub = sp[:, starts[i]:starts[i + 1]].tocsr()
            chunks.append(_plan_single(SparseMatrix.from_scipy(sub)))
        return ChunkedGatherPlan(A.height, A.width, A.nnz, tuple(chunks),
                                 tuple(starts))
    return _plan_single(A)


def _plan_single(A) -> GatherPlan:
    rows = np.repeat(np.arange(A.height), A.row_nnz()).astype(np.int64)
    cols = np.asarray(A.colind, np.int64)
    vals = np.asarray(A.vals)
    order = np.lexsort((rows, cols))
    rows, cols, vals = rows[order], cols[order], vals[order]
    nnz = cols.size

    # greedy tiling: cut at TILE entries or when the 256-col window overflows
    xrow = cols // 128
    tile_starts = [0]
    i = 0
    while i < nnz:
        base = xrow[i]
        # furthest entry still within [base, base+2) x-rows
        j = int(np.searchsorted(xrow, base + 2, side="left"))
        j = min(j, i + TILE, nnz)
        tile_starts.append(j)
        i = j
    starts = np.asarray(tile_starts)
    ntiles = starts.size - 1

    cl = np.zeros(ntiles * TILE, np.int32)
    vv = np.zeros(ntiles * TILE, vals.dtype)
    rr = np.full(ntiles * TILE, A.height, np.int32)   # pad rows dropped
    wb = np.zeros(ntiles, np.int32)
    for t in range(ntiles):
        a, b = starts[t], starts[t + 1]
        wb[t] = xrow[a]
        sl = slice(t * TILE, t * TILE + (b - a))
        cl[sl] = (cols[a:b] - 128 * int(xrow[a])).astype(np.int32)
        vv[sl] = vals[a:b]
        rr[sl] = rows[a:b].astype(np.int32)

    xrows = -(-A.width // 128) + 1                     # +1 guard row
    return GatherPlan(A.height, A.width, nnz, ntiles,
                      jnp.asarray(cl), jnp.asarray(vv), jnp.asarray(rr),
                      jnp.asarray(wb), xrows)


SUPER = 64           # sub-tiles per grid step (amortizes DMA latency)


def _gather_kernel(wb_ref, cols_ref, vals_ref, x_ref, out_ref):
    s = pl.program_id(0)
    cl_all = cols_ref[:]                   # (8·SUPER, 128)
    v_all = vals_ref[:]
    lane = jnp.bitwise_and(cl_all, 127)
    sel = jnp.right_shift(cl_all, 7)       # 0 → row base, 1 → base+1
    for k in range(SUPER):
        base = wb_ref[s * SUPER + k]
        lo, hi = 8 * k, 8 * k + 8
        w0 = jnp.broadcast_to(x_ref[pl.ds(base, 1), :], (8, 128))
        w1 = jnp.broadcast_to(x_ref[pl.ds(base + 1, 1), :], (8, 128))
        g0 = jnp.take_along_axis(w0, lane[lo:hi], axis=1)
        g1 = jnp.take_along_axis(w1, lane[lo:hi], axis=1)
        u = jnp.where(sel[lo:hi] == 0, g0, g1)
        out_ref[lo:hi, :] = v_all[lo:hi] * u


def gather_multiply(plan: GatherPlan, x: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """p[t] = vals[t] · x[cols[t]] for the column-sorted entry stream —
    the gather half of the SpMV as one Pallas kernel (x resident in VMEM
    as (n/128, 128); per (8,128) sub-tile two broadcast rows + two
    lane-gathers; SUPER sub-tiles per grid step so the streaming DMAs are
    256 KB, not 4 KB)."""
    nt = plan.ntiles
    ns = -(-nt // SUPER)                   # super-tiles (plan pads wb)
    xr = plan.xrows
    xpad = jnp.pad(x.astype(plan.vals.dtype), (0, xr * 128 - x.shape[0]))
    x2 = xpad.reshape(xr, 128)
    rows8 = ns * SUPER * 8
    cols2 = jnp.pad(plan.cols_local.reshape(-1, 128),
                    ((0, rows8 - nt * 8), (0, 0)))
    vals2 = jnp.pad(plan.vals.reshape(-1, 128),
                    ((0, rows8 - nt * 8), (0, 0)))
    wbp = jnp.pad(plan.wb, (0, ns * SUPER - nt))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ns,),
        in_specs=[
            pl.BlockSpec((8 * SUPER, 128), lambda s, wb: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * SUPER, 128), lambda s, wb: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((xr, 128), lambda s, wb: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8 * SUPER, 128), lambda s, wb: (s, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows8, 128), plan.vals.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * plan.nnz,
            bytes_accessed=plan.vals.size * (plan.vals.dtype.itemsize + 4)
            + xr * 128 * plan.vals.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(wbp, cols2, vals2, x2)
    return out.reshape(-1)[:nt * TILE]


# ---------------------------------------------------------------------------
# Bridged pipeline (r5): gather → route → one-hot MXU combine
# ---------------------------------------------------------------------------
#
# The r4 refutation (EXPERIMENTS.md) killed the ≥10 Gnnz/s target but left
# the best ASSEMBLABLE pipeline unshipped at ~0.15 Gnnz/s.  This is that
# pipeline, built from three measured pieces:
#
#   1. the windowed gather above (27.3 Gnnz/s), with entries re-sorted
#      WITHIN each 256-column window by (8192-row bucket, row) — free at
#      plan time, it only permutes entries the window already covers;
#   2. a routing pass concatenating each bucket's per-window runs
#      (avg run = d·W·B/n ≈ 40 for the north-star shape) using the
#      extend-add route-add kernel (kernels/extend_add.py): XLA row-gather
#      of per-destination 2-row windows + Pallas lane routing, one round
#      per run feeding a destination chunk-row;
#   3. the one-hot MXU combine (EXPERIMENTS EXP-A) per 8192-row bucket:
#      lr = 32·hi + lo with hi ∈ [0,256) — the algebraic ceiling
#      peak/(2·128²) is INDEPENDENT of the radix split, so the bigger
#      bucket costs nothing and the output lands in row order with no
#      final scatter.

BUCKET = 8192            # rows per combine bucket (2^13)


@dataclasses.dataclass
class BridgedPlan:
    """y = A·x as gather → route → one-hot combine (see module notes)."""

    n_rows: int
    n_cols: int
    nnz: int
    gather: "GatherPlan"
    rounds: Tuple[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray], ...]
    # each round: (dstblk (ns,), wpair (ns*8,2), idx (ns*8,128) int16)
    lr: jnp.ndarray          # (nbuckets, SUB, 8, 128) int32 local row ids
    nbuckets: int
    sub: int
    bucket: int = BUCKET
    precision: str = "split2"  # combine matmul precision (see kernel)

    def matvec(self, x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
        from .extend_add import BLOCK_ROWS, ea_route_add
        p = gather_multiply(self.gather, x, interpret=interpret)
        pr = -(-p.shape[0] // 128)
        p128 = jnp.pad(p, (0, pr * 128 - p.shape[0])).reshape(pr, 128)
        seg = jnp.zeros((self.nbuckets * self.sub * 8 + BLOCK_ROWS, 128),
                        p.dtype)
        for dstblk, wpair, idx in self.rounds:
            seg = ea_route_add(seg, p128[wpair], idx, dstblk,
                               interpret=interpret)
        P = seg[:-BLOCK_ROWS].reshape(self.nbuckets, self.sub, 8, 128)
        y = onehot_combine_bucketed(P, self.lr, bucket=self.bucket,
                                    precision=self.precision,
                                    interpret=interpret)
        return y[:self.n_rows]


register_plan_pytree(BridgedPlan, ("gather", "rounds", "lr"))


def onehot_combine_bucketed(P, LR, bucket: int = BUCKET,
                            precision: str = "split2",
                            interpret: bool = False) -> jnp.ndarray:
    """y[b·8192 + lr] = Σ p over each 8192-row bucket, via the factorized
    one-hot MXU contraction (lr = 32·hi + lo, hi ∈ [0,256)).

    ``precision``: 'split2' (the f32 default) runs TWO default-precision
    passes with the product operand manually split into bf16 hi/lo terms
    — the one-hot operand is EXACT in bf16, so the only loss is the
    2-term split's ~2^-17 relative truncation (Mosaic supports only
    DEFAULT/HIGHEST dot precisions, so the 3-pass 'high' scheme is
    emulated at 2-pass cost); 'highest' is the 6-pass exact-f32 scheme;
    'default' is the 1-pass bf16 pipe (~1e-3 relative — the bf16 opt-in
    tier)."""
    nbuckets, SUB, _, _ = P.shape
    prec = precision
    hdim = bucket // 32

    def kernel(p_ref, lr_ref, y_ref):
        acc = jnp.zeros((hdim, 32), jnp.float32)
        iota_hi = jax.lax.broadcasted_iota(jnp.int32, (hdim, 8, 128), 0)
        iota_lo = jax.lax.broadcasted_iota(jnp.int32, (32, 8, 128), 0)
        def contract(o_hi, pl_, precision):
            return jax.lax.dot_general(
                o_hi.reshape(hdim, 1024), pl_.reshape(32, 1024),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision)

        def body(s, acc):
            # fori (not python unroll): SUB can be ~80+ and an unrolled
            # kernel of 160 dot_generals wedges the Mosaic compiler
            p = p_ref[0, s]
            lr = lr_ref[0, s]
            hi, lo = lr >> 5, lr & 31
            o_hi = (hi[None] == iota_hi).astype(jnp.float32)
            o_lo = (lo[None] == iota_lo).astype(jnp.float32)
            if prec == "split2":
                p_hi = p.astype(jnp.bfloat16).astype(jnp.float32)
                p_lo = p - p_hi
                acc = acc + contract(o_hi, p_hi[None] * o_lo, "default")
                acc = acc + contract(o_hi, p_lo[None] * o_lo, "default")
            else:
                acc = acc + contract(o_hi, p[None] * o_lo, prec)
            return acc

        y_ref[0] = jax.lax.fori_loop(0, SUB, body, acc)

    y = pl.pallas_call(
        kernel,
        grid=(nbuckets,),
        in_specs=[
            pl.BlockSpec((1, SUB, 8, 128), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, 8, 128), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hdim, 32), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbuckets, hdim, 32), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * hdim * 32 * nbuckets * SUB * 1024,
            bytes_accessed=P.size * 8, transcendentals=0),
        interpret=interpret,
    )(P, LR)
    return y.reshape(-1)


def plan_bridged_spmv(A, bucket: int = BUCKET,
                      precision: str = "split2") -> BridgedPlan:
    """Build the bridged plan from a host CSR matrix (see module notes)."""
    rows_a = np.repeat(np.arange(A.height), A.row_nnz()).astype(np.int64)
    cols_a = np.asarray(A.colind, np.int64)
    vals_a = np.asarray(A.vals)
    order = np.lexsort((rows_a, cols_a))
    rows, cols, vals = rows_a[order], cols_a[order], vals_a[order]
    nnz = cols.size
    xrow = cols // 128

    # window segmentation only (no TILE cut yet); bases recorded BEFORE
    # the within-window re-sort (the first re-sorted entry may live in the
    # window's second x-row)
    win_starts = [0]
    win_bases = []
    i = 0
    while i < nnz:
        win_bases.append(int(xrow[i]))
        j = int(np.searchsorted(xrow, xrow[i] + 2, side="left"))
        win_starts.append(j)
        i = j
    wstarts = np.asarray(win_starts)

    # within each window, re-sort by (bucket, row) — the gather does not
    # care, the bridge gets long runs
    for a, b in zip(wstarts[:-1], wstarts[1:]):
        sub = np.lexsort((rows[a:b],))
        rows[a:b] = rows[a:b][sub]
        cols[a:b] = cols[a:b][sub]
        vals[a:b] = vals[a:b][sub]

    # tile cut: 1024-entry slices within each window
    tile_starts = [0]
    tile_base = []
    for w, (a, b) in enumerate(zip(wstarts[:-1], wstarts[1:])):
        t = a
        while t < b:
            t = min(t + TILE, b)
            tile_starts.append(t)
            tile_base.append(win_bases[w])
    starts = np.asarray(tile_starts)
    ntiles = starts.size - 1

    cl = np.zeros(ntiles * TILE, np.int32)
    vv = np.zeros(ntiles * TILE, vals.dtype)
    rr = np.full(ntiles * TILE, A.height, np.int32)
    wb = np.zeros(ntiles, np.int32)
    spos = np.full(nnz, -1, np.int64)       # entry → product-stream pos
    for t in range(ntiles):
        a, b = starts[t], starts[t + 1]
        base = tile_base[t]
        wb[t] = base
        sl = slice(t * TILE, t * TILE + (b - a))
        cl[sl] = (cols[a:b] - 128 * base).astype(np.int32)
        vv[sl] = vals[a:b]
        rr[sl] = rows[a:b].astype(np.int32)
        spos[a:b] = np.arange(t * TILE, t * TILE + (b - a))

    xrows = -(-A.width // 128) + 1
    gp = GatherPlan(A.height, A.width, nnz, ntiles,
                    jnp.asarray(cl), jnp.asarray(vv), jnp.asarray(rr),
                    jnp.asarray(wb), xrows)

    # destination layout: bucket-major padded to SUB·1024 per bucket
    bkt = rows // bucket
    nbuckets = -(-A.height // bucket)
    counts = np.bincount(bkt, minlength=nbuckets)
    sub = max(1, int(-(-counts.max() // 1024)))
    cap = sub * 1024
    boff = np.arange(nbuckets) * cap
    # within-bucket order = (window, row) appearance order = sort by
    # (bucket, stream pos) — runs stay consecutive on BOTH sides
    order2 = np.lexsort((spos, bkt))
    src = spos[order2]
    dst = np.concatenate([
        boff[b] + np.arange(counts[b])
        for b in range(nbuckets)]) if nnz else np.empty(0, np.int64)
    lrow = (rows[order2] % bucket).astype(np.int32)

    lr = np.zeros(nbuckets * cap, np.int32)
    lr[dst] = lrow
    LR = lr.reshape(nbuckets, sub, 8, 128)

    rounds = _build_route_rounds(src, dst, ntiles * 8)
    return BridgedPlan(A.height, A.width, nnz, gp,
                       tuple((jnp.asarray(db), jnp.asarray(wp),
                              jnp.asarray(ix)) for db, wp, ix in rounds),
                       jnp.asarray(LR), nbuckets, sub, bucket, precision)


def _build_route_rounds(src, dst, n_src_rows, block_rows=8):
    """Route plan: move stream[src[k]] → out[dst[k]] where dst-consecutive
    pieces are src-consecutive runs.  Emits (dstblk, wpair, idx) rounds
    for :func:`extend_add.ea_route_add` (out viewed as (·,128) chunk
    rows; per destination row one ≤128-long consecutive source run per
    round, windowed as 2 rows of the source stream)."""
    dr = dst // 128
    lane = (dst % 128).astype(np.int64)
    # run pieces: break when src non-consecutive or dst row changes
    brk = np.ones(src.size, bool)
    if src.size:
        brk[1:] = (np.diff(src) != 1) | (dr[1:] != dr[:-1])
    piece = np.cumsum(brk) - 1
    # round = piece rank within its dst row
    newdr = np.ones(src.size, bool)
    if src.size:
        newdr[1:] = dr[1:] != dr[:-1]
    pstart = np.maximum.accumulate(np.where(newdr, piece, 0))
    rnd = piece - pstart
    rounds = []
    for r in range(int(rnd.max()) + 1 if src.size else 0):
        sel = np.flatnonzero(rnd == r)
        drs, lanes, srcs = dr[sel], lane[sel], src[sel]
        blocks = np.unique(drs // block_rows)
        ns = blocks.shape[0]
        blkpos = np.searchsorted(blocks, drs // block_rows)
        rowc = blkpos * block_rows + drs % block_rows
        nrows = ns * block_rows
        base = np.full(nrows, np.iinfo(np.int64).max)
        np.minimum.at(base, rowc, srcs)
        w = np.where(base < np.iinfo(np.int64).max, base // 128, 0)
        wpair = np.zeros((nrows, 2), np.int32)
        wpair[:, 0] = w
        wpair[:, 1] = np.minimum(w + 1, max(n_src_rows - 1, 0))
        idx = np.full((nrows, 128), -1, np.int16)
        idx[rowc, lanes] = (srcs - w[rowc] * 128).astype(np.int16)
        dstblk = blocks.astype(np.int32)
        rounds.append((dstblk, wpair, idx))
    return rounds
