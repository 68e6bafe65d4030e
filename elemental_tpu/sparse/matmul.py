"""Sparse multiply kernels (reference MISSING tier: ``Multiply(NORMAL, α, A,
X, β, Y)`` spec'd by ``tests/blas_like/Multiply.cpp:19-46``; SpGEMM spec'd by
the IPM's Galerkin A·D·Aᵀ).

Design split (TPU-first):
  * SpMV/SpMM numeric — device (ELL gather-dot or CSR segment-sum; Pallas
    kernel in :mod:`elemental_tpu.kernels.spmv` for the SoL path).
  * SpGEMM symbolic — host NumPy merge (irregular, one-time); numeric — a
    device *plan* of (a_idx, b_idx → c_idx) triples executed as one
    segment-sum, so fixed-structure products (every IPM iteration) run fully
    on-device.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from .csr import CSRDevice, ELLMatrix, Graph, SparseMatrix
from .distsparse import DistMultiVec, DistSparseMatrix


def multiply(orientation: str, alpha, A, X, beta=0.0, Y=None):
    """Y := α·op(A)·X + β·Y for sparse A (reference ``Multiply`` signature,
    ``tests/blas_like/Multiply.cpp:19-46``).  Accepts SparseMatrix / Graph /
    ELLMatrix / DistSparseMatrix with dense X."""
    if isinstance(A, Graph):
        A = A.to_sparse()
    o = orientation.upper()[0]
    if isinstance(A, SparseMatrix):
        if o == "T":
            A = A.transpose()
        elif o in ("C", "A"):
            A = A.transpose().conj()
        dev = A.device_csr()   # flat 1-D gather form (TPU SoL; see csr.py)
        xv = X.data if isinstance(X, DistMultiVec) else jnp.asarray(X)
        prod = dev.matvec(xv) if xv.ndim == 1 else dev.matmat(xv)
    elif isinstance(A, DistSparseMatrix):
        xv = X.data if isinstance(X, DistMultiVec) else jnp.asarray(X)
        if o == "N":
            prod = A.matvec(xv) if xv.ndim == 1 else A.matmat(xv)
        else:
            # distributed transpose: the reversed halo exchange
            # (reference Multiply(TRANSPOSE, DistSparseMatrix, ...))
            if o in ("C", "A"):
                if A.host is None:
                    raise ValueError(
                        "adjoint DistSparse multiply requires the host CSR "
                        "(matrix was built/updated host-stripped)")
                A = A.change_nonzero_values(np.conj(A.host.vals))
            prod = (A.matvec_transpose(xv) if xv.ndim == 1
                    else A.matmat_transpose(xv))
    elif isinstance(A, (ELLMatrix, CSRDevice)):
        xv = jnp.asarray(X)
        prod = A.matvec(xv) if xv.ndim == 1 else A.matmat(xv)
    else:
        raise TypeError(f"unsupported sparse type {type(A)}")
    out = alpha * prod
    if Y is not None:
        yv = Y.data if isinstance(Y, DistMultiVec) else jnp.asarray(Y)
        out = out + beta * yv
    return out


# --------------------------------------------------------------------------
# SpGEMM
# --------------------------------------------------------------------------

@dataclasses.dataclass
class SpGEMMPlan:
    """Device plan for a fixed-structure product C = A·B: one fused
    gather-multiply-segment-sum."""

    c_struct: SparseMatrix      # structure of C (vals are from plan build)
    a_idx: jnp.ndarray          # (nmul,) indices into A.vals
    b_idx: jnp.ndarray          # (nmul,) indices into B.vals
    c_idx: jnp.ndarray          # (nmul,) indices into C.vals
    c_nnz: int

    def numeric(self, a_vals: jnp.ndarray, b_vals: jnp.ndarray) -> jnp.ndarray:
        prod = a_vals[self.a_idx] * b_vals[self.b_idx]
        return jax.ops.segment_sum(prod, self.c_idx,
                                   num_segments=self.c_nnz)


def spgemm_plan(A: SparseMatrix, B: SparseMatrix) -> SpGEMMPlan:
    """Symbolic SpGEMM (host): enumerate every scalar multiplication
    a_ik·b_kj and its destination c_ij, dedup destinations."""
    assert A.width == B.height
    a_rows = np.repeat(np.arange(A.height), A.row_nnz())
    # expand: for each A entry (i,k) pair with every B entry in row k
    b_rownnz = np.diff(B.rowptr)
    counts = b_rownnz[A.colind]               # per-A-entry multiplications
    nmul = int(counts.sum())
    a_idx = np.repeat(np.arange(A.nnz), counts)
    # b positions: for A-entry t with k=A.colind[t], positions B.rowptr[k] + 0..counts[t]-1
    starts = B.rowptr[A.colind]
    offsets = np.arange(nmul) - np.repeat(np.cumsum(counts) - counts, counts)
    b_idx = np.repeat(starts, counts) + offsets
    ci = a_rows[a_idx]
    cj = B.colind[b_idx]
    key = ci * B.width + cj
    uniq, inv = np.unique(key, return_inverse=True)
    c_rows = (uniq // B.width).astype(np.int64)
    c_cols = (uniq % B.width).astype(np.int64)
    c_struct = SparseMatrix.from_coo(A.height, B.width, c_rows, c_cols,
                                     np.zeros(uniq.shape[0], A.vals.dtype),
                                     sum_duplicates=False)
    # from_coo sorted (rows, cols) — uniq keys are already in that order
    return SpGEMMPlan(c_struct, jnp.asarray(a_idx), jnp.asarray(b_idx),
                      jnp.asarray(inv), int(uniq.shape[0]))


def spgemm(A: SparseMatrix, B: SparseMatrix) -> SparseMatrix:
    """C = A·B (host symbolic + device numeric)."""
    plan = spgemm_plan(A, B)
    c_vals = plan.numeric(jnp.asarray(A.vals), jnp.asarray(B.vals))
    return plan.c_struct.change_nonzero_values(np.asarray(c_vals))


@dataclasses.dataclass
class GalerkinPlan:
    """Fixed-structure A·diag(d)·Aᵀ (the IPM normal-equations product,
    BASELINE config #3 'Galerkin A·Aᵀ').  Structure computed once; per-
    iteration numeric is a single fused segment-sum on device."""

    c_struct: SparseMatrix
    a_idx: jnp.ndarray       # left factor entry
    at_idx: jnp.ndarray      # right factor entry (index into A.vals)
    d_idx: jnp.ndarray       # inner (column) index → diag entry
    c_idx: jnp.ndarray
    c_nnz: int

    def numeric(self, a_vals: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
        prod = a_vals[self.a_idx] * d[self.d_idx] * a_vals[self.at_idx]
        return jax.ops.segment_sum(prod, self.c_idx,
                                   num_segments=self.c_nnz)


def galerkin_plan(A: SparseMatrix) -> GalerkinPlan:
    """Plan C = A·diag(d)·Aᵀ.  Enumerates pairs of entries sharing a column:
    for column k with entries rows r₁..r_m, contributes to every (r_i, r_j)."""
    At = A.transpose()  # CSR of Aᵀ: rows = columns of A
    # per column k: list of (row, a_val_idx)
    col_nnz = At.row_nnz()
    # entry positions of A sorted by column: via transpose bookkeeping
    # Build arrays: for column k, A entries are At entries in row k, and the
    # original A.vals index of each is recoverable by matching (row, col).
    a_rows = np.repeat(np.arange(A.height), A.row_nnz())
    order = np.lexsort((a_rows, A.colind))     # sort A entries by (col, row)
    ent_col = A.colind[order]                  # = column of entry
    ent_row = a_rows[order]
    ent_aidx = order                           # index into A.vals
    # pairs within each column
    counts = col_nnz                            # entries per column
    pair_counts = counts * counts
    npair = int(pair_counts.sum())
    col_starts = np.cumsum(counts) - counts
    # enumerate all (i, j) pairs per column
    pk = np.repeat(np.arange(A.width), pair_counts)           # column id
    base = np.repeat(np.cumsum(pair_counts) - pair_counts, pair_counts)
    local = np.arange(npair) - base
    ccount = counts[pk]
    li = local // np.maximum(ccount, 1)
    lj = local % np.maximum(ccount, 1)
    left = ent_aidx[col_starts[pk] + li]
    right = ent_aidx[col_starts[pk] + lj]
    ci = ent_row[col_starts[pk] + li]
    cj = ent_row[col_starts[pk] + lj]
    key = ci * A.height + cj
    uniq, inv = np.unique(key, return_inverse=True)
    c_rows = (uniq // A.height).astype(np.int64)
    c_cols = (uniq % A.height).astype(np.int64)
    c_struct = SparseMatrix.from_coo(A.height, A.height, c_rows, c_cols,
                                     np.zeros(uniq.shape[0], A.vals.dtype),
                                     sum_duplicates=False)
    return GalerkinPlan(c_struct, jnp.asarray(left), jnp.asarray(right),
                        jnp.asarray(pk), jnp.asarray(inv),
                        int(uniq.shape[0]))


def syrk_sparse(A: SparseMatrix, d: Optional[np.ndarray] = None
                ) -> SparseMatrix:
    """C = A·diag(d)·Aᵀ via the Galerkin plan (d defaults to ones)."""
    plan = galerkin_plan(A)
    dv = jnp.asarray(d if d is not None
                     else np.ones(A.width, A.vals.dtype))
    vals = plan.numeric(jnp.asarray(A.vals), dv)
    return plan.c_struct.change_nonzero_values(np.asarray(vals))
