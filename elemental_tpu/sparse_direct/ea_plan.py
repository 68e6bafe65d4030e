"""Plan emission for the Pallas extend-add (kernels/extend_add.py).

Turns the symbolic tree's child→parent relative indices (the reference's
``childRelInds``, ``NodeInfo.hpp:27-110``) into per-level lists of kernel
"rounds".  Geometry facts used:

* a level's segment, viewed with each front row lane-padded to
  ``Sl = ceil(S/128)·128``, is a dense (R, 128) array of chunk-rows; the
  destination of one (child-row, parent-laneblock) contribution is ONE
  chunk-row, with lanes ``rel[bi] mod 128``;
* the matching sources are ≤128 CONSECUTIVE pool elements (child Schur
  rows are contiguous and ``rel`` is monotone), so they fit a 2-row
  window of the pool viewed as (rows, 128) — per destination chunk-row
  the plan records the window's two pool-row ids (``wpair``, consumed by
  an XLA row-gather) and the window-local lane indices (``idx``);
* a destination chunk-row fed by k children gets k ROUNDS — within one
  round every row receives at most one run, so one kernel call applies
  a whole round in place.

Plan arrays are registered as a pytree so they ride through ``jax.jit``
as ARGUMENTS (device-resident across refactorizations).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from ..core.statics import register_plan_pytree
from .symbolic import SymbolicFactorization

BLOCK_ROWS = 8          # must match kernels/extend_add.BLOCK_ROWS


def _bucket(n: int) -> int:
    """Round up to the {1, 1.5}·2^k grid — bounds step-count padding at
    ≤1.33× while keeping the set of distinct kernel shapes small."""
    if n <= 8:
        return 8
    k = 1 << (int(n - 1).bit_length() - 1)
    if n <= k + k // 2:
        return k + k // 2
    return 2 * k


@dataclasses.dataclass
class EARound:
    dstblk: np.ndarray          # (ns,) int32 step → destination block
    wpair: np.ndarray           # (ns·BR, 2) int32 pool-row ids per row
    idx: np.ndarray             # (ns·BR, 128) int16, -1 = inactive


register_plan_pytree(EARound, ("dstblk", "wpair", "idx"))


@dataclasses.dataclass
class LevelEAPlan:
    Sl: int                     # lane-padded front row length
    rounds: List[EARound]
    spill_dst: np.ndarray       # pool-flat dst for rounds ≥ max_rounds
    spill_src: np.ndarray       # (tiny tails — XLA scatter is fine there)


register_plan_pytree(LevelEAPlan, ("rounds", "spill_dst", "spill_src"))


@dataclasses.dataclass
class EAPlans:
    levels: Dict[int, LevelEAPlan]      # level index → plan
    pool_alloc: int                     # pool length (multiple of 128)


register_plan_pytree(EAPlans, ("levels",))


def build_ea_plans(symb: SymbolicFactorization, min_elems: int = 4096,
                   block_rows: int = BLOCK_ROWS,
                   max_rounds: int = 2) -> Optional[EAPlans]:
    """Emit Pallas extend-add plans for every level moving at least
    ``min_elems`` child-Schur elements.  Returns None when no level
    qualifies (the XLA scatter path stays).

    ``max_rounds``: rounds past this go to a per-level XLA scatter spill —
    measured (24³): rounds ≥2 hold only hundreds of elements, while each
    extra round costs a kernel invocation and a Mosaic compile."""
    sns = symb.supernodes
    n_sn = len(sns)
    sn_lev = np.empty(n_sn, np.int64)
    sn_slot = np.empty(n_sn, np.int64)
    for li, lev in enumerate(symb.levels):
        ids = np.asarray(lev.sn_ids)
        sn_lev[ids] = li
        sn_slot[ids] = np.arange(ids.shape[0])
    lev_S = np.array([lev.front_size for lev in symb.levels], np.int64)
    lev_off = np.array([lev.offset for lev in symb.levels], np.int64)
    sn_S = lev_S[sn_lev]
    sn_off = lev_off[sn_lev] + sn_slot * sn_S * sn_S

    sn_rows = [np.concatenate([np.arange(sn.cols[0], sn.cols[1]),
                               sn.struct]) for sn in sns]

    pool_alloc = -(-symb.pool_size // 128) * 128
    n_pool_rows = pool_alloc // 128

    tril_cache: Dict[int, tuple] = {}
    plans: Dict[int, LevelEAPlan] = {}
    for li, lev in enumerate(symb.levels):
        n_elems = np.asarray(lev.child_src).size
        if n_elems < min_elems:
            continue
        S = lev.front_size
        Sl = -(-S // 128) * 128
        nblk = Sl // 128
        dr_l: List[np.ndarray] = []
        lane_l: List[np.ndarray] = []
        srcf_l: List[np.ndarray] = []
        ci_l: List[np.ndarray] = []
        for p in np.asarray(lev.sn_ids):
            p = int(p)
            slot = int(sn_slot[p])
            for ci in sns[p].children:
                ch = sns[ci]
                nr = len(ch.struct)
                if nr == 0:
                    continue
                rel = np.searchsorted(sn_rows[p], ch.struct)
                nsc = ch.cols[1] - ch.cols[0]
                Sc = int(sn_S[ci])
                if nr not in tril_cache:
                    tril_cache[nr] = np.tril_indices(nr)
                ai, bi = tril_cache[nr]
                srcf_l.append(sn_off[ci] + (nsc + ai) * Sc + (nsc + bi))
                pr = rel[ai]
                pc = rel[bi]
                dr_l.append((slot * S + pr) * nblk + (pc >> 7))
                lane_l.append(pc & 127)
                ci_l.append(np.full(ai.shape[0], ci, np.int64))
        if not dr_l:
            continue
        dr = np.concatenate(dr_l)
        lane = np.concatenate(lane_l)
        srcf = np.concatenate(srcf_l)
        ci_a = np.concatenate(ci_l)

        # round assignment: the k-th distinct child feeding a destination
        # chunk-row goes to round k (one run per row per round)
        order = np.lexsort((ci_a, dr))
        d_s, c_s = dr[order], ci_a[order]
        m = d_s.shape[0]
        newgrp = np.ones(m, bool)
        newgrp[1:] = (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])
        gid = np.cumsum(newgrp) - 1
        newdr = np.ones(m, bool)
        newdr[1:] = d_s[1:] != d_s[:-1]
        gstart = np.maximum.accumulate(np.where(newdr, gid, 0))
        rnd = gid - gstart
        lane_s, src_s = lane[order], srcf[order]

        # scratch block: one extra (BR,128) block appended after the data
        scratch_blk = (lev.sn_ids.shape[0] * S * Sl) // 128 // block_rows
        rounds: List[EARound] = []
        # tail rounds → XLA scatter spill, in pool-flat coordinates
        spill = np.flatnonzero(rnd >= max_rounds)
        sd, sl_, ss = d_s[spill], lane_s[spill], src_s[spill]
        slot = sd // (S * nblk)
        rem = sd % (S * nblk)
        spill_dst = (lev.offset + (slot * S + rem // nblk) * S
                     + (rem % nblk) * 128 + sl_).astype(np.int64)
        spill_src = ss.astype(np.int64)
        for r in range(min(int(rnd.max()) + 1, max_rounds)):
            sel = np.flatnonzero(rnd == r)
            drs, lanes, srcs = d_s[sel], lane_s[sel], src_s[sel]
            blocks = np.unique(drs // block_rows)
            ns = blocks.shape[0]
            ns_pad = _bucket(ns)
            blkpos = np.searchsorted(blocks, drs // block_rows)
            rowc = blkpos * block_rows + drs % block_rows
            nrows = ns_pad * block_rows
            base = np.full(ns * block_rows, np.iinfo(np.int64).max)
            np.minimum.at(base, rowc, srcs)
            has = base < np.iinfo(np.int64).max
            w = np.where(has, base // 128, 0)
            wpair = np.zeros((nrows, 2), np.int32)
            wpair[:ns * block_rows, 0] = w
            wpair[:ns * block_rows, 1] = np.minimum(w + 1, n_pool_rows - 1)
            idx = np.full((nrows, 128), -1, np.int16)
            idx[rowc, lanes] = (srcs - w[rowc] * 128).astype(np.int16)
            dstblk = np.full(ns_pad, scratch_blk, np.int32)
            dstblk[:ns] = blocks.astype(np.int32)
            rounds.append(EARound(dstblk, wpair, idx))
        plans[li] = LevelEAPlan(Sl, rounds, spill_dst, spill_src)

    if not plans:
        return None
    return EAPlans(plans, pool_alloc)


def plans_device(plans: EAPlans, device=None) -> EAPlans:
    """Move all plan arrays onto the device (as jit-argument leaves)."""
    import jax
    import jax.numpy as jnp
    put = ((lambda a: jax.device_put(a, device)) if device is not None
           else jnp.asarray)
    levels = {
        li: LevelEAPlan(lp.Sl, [
            EARound(put(r.dstblk), put(r.wpair), put(r.idx))
            for r in lp.rounds], put(lp.spill_dst), put(lp.spill_src))
        for li, lp in plans.levels.items()}
    return EAPlans(levels, plans.pool_alloc)
