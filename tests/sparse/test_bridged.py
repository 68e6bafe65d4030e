"""Bridged unstructured SpMV tier (r5): gather → route → one-hot combine
(kernels/unstructured.plan_bridged_spmv; EXPERIMENTS.md §E5.6)."""

import numpy as np

import jax
import jax.numpy as jnp

from elemental_tpu.sparse import SparseMatrix, plan_spmv

RNG = np.random.default_rng(11)


def _random_csr(n, d):
    rows = np.repeat(np.arange(n), d)
    cols = RNG.integers(0, n, d * n)
    vals = RNG.standard_normal(d * n)
    return SparseMatrix.from_coo(n, n, rows, cols, vals)


def test_bridged_matvec_matches_scipy():
    A = _random_csr(1 << 13, 7)
    plan = plan_spmv(A, kind="bridged")
    assert plan.kind == "bridged"
    x = RNG.standard_normal(A.width).astype(np.float32)
    y = np.asarray(plan.gather.matvec(jnp.asarray(x), interpret=True))
    expect = A.to_scipy().astype(np.float32) @ x
    rel = np.abs(y - expect).max() / np.abs(expect).max()
    assert rel < 1e-5, rel


def test_bridged_rectangular_and_ragged():
    # non-multiple-of-bucket height and ragged row counts
    n, m = 5000, 9000
    nnz = 30000
    rows = RNG.integers(0, n, nnz)
    cols = RNG.integers(0, m, nnz)
    vals = RNG.standard_normal(nnz)
    A = SparseMatrix.from_coo(n, m, rows, cols, vals)
    plan = plan_spmv(A, kind="bridged")
    x = RNG.standard_normal(m).astype(np.float32)
    y = np.asarray(plan.gather.matvec(jnp.asarray(x), interpret=True))
    expect = A.to_scipy().astype(np.float32) @ x
    assert np.abs(y - expect).max() / np.abs(expect).max() < 1e-5


def test_route_rounds_random_runs():
    """Property test for the stream router: a random run-structured
    permutation (dst-contiguous blocks pulled from src-contiguous runs)
    must be applied exactly by the emitted rounds through
    ``ea_route_add`` (interpret mode)."""
    from elemental_tpu.kernels.extend_add import BLOCK_ROWS, ea_route_add
    from elemental_tpu.kernels.unstructured import _build_route_rounds

    # build a source stream of runs assigned round-robin to 5 buckets
    n_items = 6000
    runs = []
    pos = 0
    while pos < n_items:
        ln = int(RNG.integers(1, 120))
        ln = min(ln, n_items - pos)
        runs.append((pos, ln, int(RNG.integers(0, 5))))
        pos += ln
    # dst = bucket-major concatenation of runs (order of appearance)
    src_parts, dst_parts = [], []
    off = {b: 0 for b in range(5)}
    counts = {b: sum(ln for p, ln, bb in runs if bb == b)
              for b in range(5)}
    cap = max(1, -(-max(counts.values()) // 128)) * 128
    for p, ln, b in runs:
        src_parts.append(np.arange(p, p + ln))
        dst_parts.append(b * cap + off[b] + np.arange(ln))
        off[b] += ln
    # sort by dst (the planner contract)
    src = np.concatenate(src_parts)
    dst = np.concatenate(dst_parts)
    order = np.argsort(dst)
    src, dst = src[order], dst[order]

    n_src_rows = -(-n_items // 128)
    rounds = _build_route_rounds(src, dst, n_src_rows)

    stream = RNG.standard_normal(n_src_rows * 128).astype(np.float32)
    stream[n_items:] = 0.0
    p128 = jnp.asarray(stream.reshape(-1, 128))
    n_dst = 5 * cap
    seg = jnp.zeros((n_dst // 128 + BLOCK_ROWS, 128), jnp.float32)
    for db, wp, ix in rounds:
        seg = ea_route_add(seg, p128[jnp.asarray(wp)], jnp.asarray(ix),
                           jnp.asarray(db), interpret=True)
    got = np.asarray(seg)[:-BLOCK_ROWS].reshape(-1)
    expect = np.zeros(n_dst, np.float32)
    expect[dst] = stream[src]
    np.testing.assert_array_equal(got, expect)
