"""FLAME-style partition helpers (reference ``src/core/FlamePart``:
Partition/Repartition/SlidePartition — the blocked-algorithm bookkeeping).

Functional equivalents over jnp arrays: each returns views (slices), and
``merge_*`` reassembles.  The recursive formulations in
:mod:`elemental_tpu.lapack` are the primary blocked pattern on TPU; these
helpers exist for algorithm authors porting FLAME-style loops."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def partition_down(A, m_top: int):
    """A → (A_T, A_B) with A_T holding ``m_top`` rows (``PartitionDown``)."""
    return A[:m_top], A[m_top:]


def partition_right(A, n_left: int):
    return A[:, :n_left], A[:, n_left:]


def partition_down_diagonal(A, k: int):
    """A → 2×2 quadrants split at diagonal index k (``PartitionDownDiagonal``)."""
    return (A[:k, :k], A[:k, k:],
            A[k:, :k], A[k:, k:])


def repartition_down(AT, AB, bsize: int):
    """(AT, AB) → (A0, A1, A2) exposing a ``bsize`` panel
    (``RepartitionDown``)."""
    return AT, AB[:bsize], AB[bsize:]


def repartition_right(AL, AR, bsize: int):
    return AL, AR[:, :bsize], AR[:, bsize:]


def repartition_down_diagonal(A, k: int, bsize: int):
    """3×3 blocks of A around the ``bsize`` diagonal panel at index k
    (``RepartitionDownDiagonal``): returns
    (A00, A01, A02, A10, A11, A12, A20, A21, A22)."""
    e = k + bsize
    return (A[:k, :k], A[:k, k:e], A[:k, e:],
            A[k:e, :k], A[k:e, k:e], A[k:e, e:],
            A[e:, :k], A[e:, k:e], A[e:, e:])


def slide_partition_down(A0, A1, A2):
    """Merge the processed panel back (``SlidePartitionDown``)."""
    return jnp.concatenate([A0, A1], axis=0), A2


def slide_partition_right(A0, A1, A2):
    return jnp.concatenate([A0, A1], axis=1), A2


def merge_2x2(A00, A01, A10, A11):
    top = jnp.concatenate([A00, A01], axis=1)
    bot = jnp.concatenate([A10, A11], axis=1)
    return jnp.concatenate([top, bot], axis=0)
