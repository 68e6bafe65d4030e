"""SUMMA distributed GEMM over the ('mc','mr') mesh.

TPU-native re-design of the reference's SUMMA stack
(``src/blas_like/level3/Gemm.cpp:274-345``, ``Gemm/NN.hpp`` variants A/B/C/Dot
+ Cannon + multistream): here the variants map to

  * ``xla``        — ``jnp.einsum`` under sharding constraints; GSPMD inserts
                     the SUMMA communication pattern itself.
  * ``stationary_c`` — explicit ``shard_map``: all-gather A along 'mr' and B
                     along 'mc', one big local MXU matmul.  The analog of
                     SUMMA-Dot: comm volume k·(m/h + n/w) per device.
  * ``stationary_a``/``stationary_b`` — keep the largest operand in place,
                     all-gather the smaller one and reduce-scatter the product
                     (``AxpyContract``'s reduce-scatter, ``AxpyContract.hpp:75``).
  * ``pipelined``  — ring ppermute over 'mr': one A-panel in flight per step,
                     matmul overlapped with the permute (the collective-matmul
                     pattern; replaces the reference's multistream SUMMA
                     ``Gemm/NN_Multistream.hpp`` + Aluminum nonblocking comms).

A size heuristic mirrors ``Gemm/NN.hpp:582-599``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.grid import Grid


def _pad_to(x: jnp.ndarray, m: int, n: int) -> jnp.ndarray:
    pm, pn = m - x.shape[0], n - x.shape[1]
    if pm == 0 and pn == 0:
        return x
    return jnp.pad(x, ((0, pm), (0, pn)))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def gemm_xla(A: jnp.ndarray, B: jnp.ndarray, grid: Grid) -> jnp.ndarray:
    """GSPMD path: constrain operands/result to [MC,MR] and let XLA partition
    the contraction."""
    mesh = grid.mesh
    sh = NamedSharding(mesh, P("mc", "mr"))
    A = jax.lax.with_sharding_constraint(A, sh)
    B = jax.lax.with_sharding_constraint(B, sh)
    C = jnp.matmul(A, B, preferred_element_type=A.dtype)
    return jax.lax.with_sharding_constraint(C, sh)


def _stationary_c_local(a_blk, b_blk):
    # a_blk: (m/h, k/w) on ('mc','mr'); b_blk: (k/h, n/w)
    a_row = jax.lax.all_gather(a_blk, "mr", axis=1, tiled=True)   # (m/h, k)
    b_col = jax.lax.all_gather(b_blk, "mc", axis=0, tiled=True)   # (k, n/w)
    return jnp.matmul(a_row, b_col, preferred_element_type=a_blk.dtype)


def _stationary_a_local(a_blk, b_blk):
    # Keep A in place: gather B fully replicated along both axes in stages,
    # compute partial C[m/h, n] contributions per 'mr' rank over its k-slice,
    # then reduce-scatter along 'mr' to land C as ('mc','mr').
    b_rep = jax.lax.all_gather(b_blk, "mc", axis=0, tiled=True)   # (k/w? no: k/h→k, n/w)
    # b_rep: (k, n/w) gathered over 'mc'; now gather over 'mr' to full n
    b_full = jax.lax.all_gather(b_rep, "mr", axis=1, tiled=True)  # (k, n)
    k_w = a_blk.shape[1]
    idx = jax.lax.axis_index("mr")
    b_slice = jax.lax.dynamic_slice_in_dim(b_full, idx * k_w, k_w, 0)
    part = jnp.matmul(a_blk, b_slice, preferred_element_type=a_blk.dtype)  # (m/h, n) partial over 'mr'
    return jax.lax.psum_scatter(part, "mr", scatter_dimension=1, tiled=True)


def _stationary_b_local(a_blk, b_blk):
    # Keep B in place (reference SUMMA-B, ``Gemm/NN.hpp:227``): gather A
    # fully, each 'mc' rank multiplies its k-slice against its B block and
    # the partials reduce-scatter along 'mc' back to the [MC,MR] layout.
    a_rep = jax.lax.all_gather(a_blk, "mr", axis=1, tiled=True)   # (m/h, k)
    a_full = jax.lax.all_gather(a_rep, "mc", axis=0, tiled=True)  # (m, k)
    k_h = b_blk.shape[0]
    idx = jax.lax.axis_index("mc")
    a_slice = jax.lax.dynamic_slice_in_dim(a_full, idx * k_h, k_h, 1)
    part = jnp.matmul(a_slice, b_blk,
                      preferred_element_type=a_blk.dtype)  # (m, n/w)
    return jax.lax.psum_scatter(part, "mc", scatter_dimension=0, tiled=True)


def _pipelined_local(a_blk, b_blk, w: int):
    """Ring collective-matmul: C_loc = Σ_t Apanel_t @ Bpanel_t with the next
    A-panel ppermuted while the current matmul runs (XLA overlaps the
    independent ops)."""
    b_col = jax.lax.all_gather(b_blk, "mc", axis=0, tiled=True)   # (k, n/w)
    k_w = a_blk.shape[1]
    my = jax.lax.axis_index("mr")
    perm = [(i, (i - 1) % w) for i in range(w)]  # shift left along the ring

    def step(t, carry):
        a_cur, acc = carry
        # panel index currently resident: (my + t) mod w
        src = (my + t) % w
        b_slice = jax.lax.dynamic_slice_in_dim(b_col, src * k_w, k_w, 0)
        a_next = jax.lax.ppermute(a_cur, "mr", perm)
        acc = acc + jnp.matmul(a_cur, b_slice,
                               preferred_element_type=acc.dtype)
        return (a_next, acc)

    acc0 = jnp.zeros((a_blk.shape[0], b_col.shape[1]), dtype=a_blk.dtype)
    acc0 = jax.lax.pcast(acc0, ("mc", "mr"), to="varying")  # device-varying for scan
    _, acc = jax.lax.fori_loop(0, w, step, (a_blk, acc0), unroll=True)
    return acc


def gemm_summa(A: jnp.ndarray, B: jnp.ndarray, grid: Grid,
               alg: str = "stationary_c") -> jnp.ndarray:
    """Explicit shard_map SUMMA.  A: (m,k), B: (k,n), both laid out [MC,MR];
    returns C (m,n) as [MC,MR].  Pads to mesh-divisible shapes internally."""
    mesh = grid.mesh
    h, w = grid.height, grid.width
    m, k = A.shape
    k2, n = B.shape
    assert k == k2, (A.shape, B.shape)
    # SUMMA needs k divisible by both axes (A splits k over 'mr', B over 'mc').
    mp, kp, np_ = _round_up(m, h), _round_up(k, h * w), _round_up(n, w)
    Ap, Bp = _pad_to(A, mp, kp), _pad_to(B, kp, np_)
    spec = P("mc", "mr")

    if alg == "stationary_c":
        local = _stationary_c_local
        out_spec = spec
    elif alg == "stationary_a":
        local = _stationary_a_local
        out_spec = spec
    elif alg == "stationary_b":
        local = _stationary_b_local
        out_spec = spec
    elif alg == "pipelined":
        local = functools.partial(_pipelined_local, w=w)
        out_spec = spec
    else:
        raise ValueError(f"unknown SUMMA algorithm {alg!r}")

    fn = shard_map(local, mesh=mesh, in_specs=(spec, spec),
                   out_specs=out_spec)
    Cp = fn(jax.lax.with_sharding_constraint(Ap, NamedSharding(mesh, spec)),
            jax.lax.with_sharding_constraint(Bp, NamedSharding(mesh, spec)))
    if out_spec != spec:
        Cp = jax.lax.with_sharding_constraint(Cp, NamedSharding(mesh, spec))
    return Cp[:m, :n]


def choose_algorithm(m: int, n: int, k: int, grid: Grid,
                     itemsize: int = 4,
                     pipeline_bytes: int = 64 << 20) -> str:
    """Size heuristic in the spirit of ``Gemm/NN.hpp:582-599``: keep the
    largest operand stationary; switch the stationary-C gather to the
    ring-pipelined collective matmul when the per-device gathered panels
    exceed ``pipeline_bytes`` (the panel then streams one ring step at a
    time and the permute overlaps the matmul — the multistream analog,
    ``Gemm/NN_Multistream.hpp``)."""
    p = grid.size
    if p == 1:
        return "xla"
    h, w = grid.height, grid.width
    weight_a, weight_b, weight_c = m * k, k * n, m * n
    if weight_c >= weight_a and weight_c >= weight_b:
        # stationary-C gathers an (m/h, k) strip of A per device; past the
        # VMEM/HBM comfort threshold the ring pipeline wins (one k/w panel
        # resident instead of k)
        if (m // max(h, 1)) * k * itemsize > pipeline_bytes:
            return "pipelined"
        return "stationary_c"
    if weight_b >= weight_a:
        return "stationary_b"
    return "stationary_a"
