"""LAPACK-like utilities (reference ``src/lapack_like/util``: Median, Sort,
PivotParity)."""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp

from ..core.distmatrix import DistMatrix, as_array

Arr = Union[jnp.ndarray, DistMatrix]


def median(x: Arr):
    return jnp.median(as_array(x))


def sort(x: Arr, descending: bool = False):
    s = jnp.sort(as_array(x).ravel())
    return s[::-1] if descending else s


def tagged_sort(x: Arr, descending: bool = False):
    """Sort returning (values, original indices) (reference ``TaggedSort``)."""
    v = as_array(x).ravel()
    idx = jnp.argsort(v)
    if descending:
        idx = idx[::-1]
    return v[idx], idx


def pivot_parity(pivots) -> int:
    """Parity of a LAPACK pivot sequence (reference ``PivotParity``)."""
    p = jnp.asarray(pivots)
    swaps = jnp.sum(jnp.where(p != jnp.arange(p.shape[0]), 1, 0))
    return swaps % 2
