"""Tiled Pallas MXU matmul (the reference's local-GEMM slot: cuBLAS via
``gpu_blas::Gemm``, §2.6 item 4).

XLA's fused dot is already near-SoL for plain matmuls; this kernel is the
substrate for fused epilogues (masked rank-k updates, triangular scaling)
that XLA cannot fuse across custom-call boundaries, and the template for the
supernodal front kernels."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _matmul_kernel(a_ref, b_ref, o_ref, acc_ref, *, k_tiles):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    acc_ref[:, :] += jnp.dot(a_ref[:, :], b_ref[:, :],
                             preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == k_tiles - 1)
    def _():
        o_ref[:, :] = acc_ref[:, :].astype(o_ref.dtype)


def matmul(a: jnp.ndarray, b: jnp.ndarray, tile_m: int = 512,
           tile_n: int = 512, tile_k: int = 512) -> jnp.ndarray:
    """C = A·B with f32 accumulation on the MXU."""
    m, k = a.shape
    k2, n = b.shape
    assert k == k2

    def fit(t, d):
        t = min(t, d)
        while d % t:
            t //= 2
        return max(t, 1)

    tm, tn, tk = fit(tile_m, m), fit(tile_n, n), fit(tile_k, k)
    k_tiles = k // tk
    grid = (m // tm, n // tn, k_tiles)
    return pl.pallas_call(
        functools.partial(_matmul_kernel, k_tiles=k_tiles),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), a.dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=(m * k + k * n + m * n) * a.dtype.itemsize,
            transcendentals=0),
    )(a, b)


def masked_rank_k_update(c: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray,
                         alpha=1.0, lower: bool = True) -> jnp.ndarray:
    """Fused ``Trrk``: one triangle of C += α·A·B with the mask applied in
    the epilogue (the Cholesky/LDL trailing-update kernel shape)."""
    m, k = a.shape
    n = c.shape[1]

    def fit(t, d):
        t = min(t, d)
        while d % t:
            t //= 2
        return max(t, 1)

    tm, tn = fit(256, m), fit(256, n)

    def kernel(c_ref, a_ref, b_ref, o_ref):
        i, j = pl.program_id(0), pl.program_id(1)
        prod = jnp.dot(a_ref[:, :], b_ref[:, :],
                       preferred_element_type=jnp.float32)
        rows = i * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 0)
        cols = j * tn + jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1)
        mask = rows >= cols if lower else rows <= cols
        o_ref[:, :] = jnp.where(mask,
                                c_ref[:, :] + alpha * prod.astype(c.dtype),
                                c_ref[:, :])

    return pl.pallas_call(
        kernel,
        grid=(m // tm, n // tn),
        in_specs=[
            pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(c.shape, c.dtype),
    )(c, a, b)
