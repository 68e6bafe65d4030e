"""Pallas elementwise/structural kernels (reference ``src/hydrogen/blas/gpu``
CUDA kernels: Axpy.cu, Copy.cu, Fill.cu, Hadamard.cu, Scale.cu,
Transpose.cu → §2.6 item 3).

XLA already fuses elementwise chains optimally on the VPU, so the jnp forms
are the production path; the Pallas kernels exist for (a) parity with the
reference's kernel tier, (b) fusion across custom-kernel boundaries where XLA
cannot see (e.g. epilogues of other Pallas calls), and (c) the transpose,
which on TPU is a relayout the Mosaic compiler schedules better when tiled
explicitly for large aspect ratios."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile_grid(shape, tm=256, tn=256):
    m, n = shape
    tm = min(tm, m) if m % 8 == 0 else m
    tn = min(tn, n) if n % 128 == 0 else n
    while m % tm:
        tm //= 2
    while n % tn:
        tn //= 2
    tm, tn = max(tm, 1), max(tn, 1)
    return (m // tm, n // tn), (tm, tn)


def _ew_call(kernel, out_dtype, *arrays, scalars=()):
    a = arrays[0]
    grid, (tm, tn) = _tile_grid(a.shape)
    specs = [pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                          memory_space=pltpu.VMEM) for _ in arrays]
    return pl.pallas_call(
        functools.partial(kernel, *scalars),
        grid=grid,
        in_specs=specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(a.shape, out_dtype),
    )(*arrays)


def axpy(alpha, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """y + α·x (reference ``Axpy.cu``)."""
    def kernel(x_ref, y_ref, o_ref):
        o_ref[:, :] = y_ref[:, :] + alpha * x_ref[:, :]
    return _ew_call(lambda *a: kernel(*a), y.dtype, x, y)


def scale(alpha, x: jnp.ndarray) -> jnp.ndarray:
    """α·x (reference ``Scale.cu``)."""
    def kernel(x_ref, o_ref):
        o_ref[:, :] = alpha * x_ref[:, :]
    return _ew_call(lambda *a: kernel(*a), x.dtype, x)


def hadamard(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """x ∘ y (reference ``Hadamard.cu``)."""
    def kernel(x_ref, y_ref, o_ref):
        o_ref[:, :] = x_ref[:, :] * y_ref[:, :]
    return _ew_call(lambda *a: kernel(*a), x.dtype, x, y)


def fill(shape, value, dtype=jnp.float32) -> jnp.ndarray:
    """Constant fill (reference ``Fill.cu``)."""
    def kernel(o_ref):
        o_ref[:, :] = jnp.full_like(o_ref[:, :], value)
    grid, (tm, tn) = _tile_grid(shape)
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
    )()


def copy(x: jnp.ndarray) -> jnp.ndarray:
    """Copy (reference ``Copy.cu``)."""
    def kernel(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :]
    return _ew_call(lambda *a: kernel(*a), x.dtype, x)


def transpose(x: jnp.ndarray) -> jnp.ndarray:
    """Tiled out-of-place transpose (reference ``Transpose.cu``)."""
    m, n = x.shape
    grid, (tm, tn) = _tile_grid((m, n), 256, 256)

    def kernel(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :].T

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tn, tm), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, m), x.dtype),
    )(x)
