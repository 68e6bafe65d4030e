"""Benchmark driver: CSR/ELL SpMV nnz/s on one chip (BASELINE config #1/#2
headline metric; target ≥70% of HBM speed-of-light).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
where vs_baseline is achieved/(0.70·SoL): ≥1.0 means the BASELINE target is
met on this chip.

Roofline model (ELL fp32): each nnz streams 4B value + 4B column index from
HBM; the source vector x (≤4 MB) is resident on-chip across the row sweep and
y writes amortize over row length — ~8.8 B/nnz effective.  v5e HBM ≈ 819 GB/s
⇒ SoL ≈ 93 Gnnz/s.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


HBM_BW = {  # GB/s per chip
    "v5e": 819.0, "v5 lite": 819.0, "v4": 1228.0, "v5p": 2765.0,
    "v6e": 1640.0,
}


def detect_bw():
    kind = jax.devices()[0].device_kind.lower()
    for k, bw in HBM_BW.items():
        if k in kind:
            return bw * 1e9
    return 819.0e9


def main():
    from elemental_tpu.matrices import sparse_laplacian_2d

    n1 = 1024  # 1M unknowns, ~5.2M nnz, 5-point stencil
    A = sparse_laplacian_2d(n1, n1, scaled=False)
    cols_np, vals_np, _ = A.host_ell(pad_align=8)

    dev = jax.devices()[0]
    cols = jax.device_put(cols_np, dev)
    vals = jax.device_put(vals_np.astype(np.float32), dev)
    x = jax.device_put(
        np.random.default_rng(0).standard_normal(A.width).astype(np.float32),
        dev)

    @jax.jit
    def spmv(cols, vals, x):
        return jnp.sum(vals * x[cols], axis=1)

    # warmup + correctness
    y = spmv(cols, vals, x)
    y.block_until_ready()
    # correctness spot check against host CSR on a slice
    yh = np.asarray(y[:n1])
    expect = A.to_scipy()[:n1] @ np.asarray(x)
    rel = np.abs(yh - expect).max() / max(1e-30, np.abs(expect).max())
    assert rel < 1e-4, f"SpMV wrong: rel={rel}"

    reps = 50
    # timed loop: chain dependent SpMVs so XLA can't overlap independent runs
    @jax.jit
    def sweep(cols, vals, x):
        def body(i, acc):
            return spmv(cols, vals, acc) * 1e-3  # keep magnitudes bounded
        return jax.lax.fori_loop(0, reps, body, x)

    out = sweep(cols, vals, x)
    out.block_until_ready()
    t0 = time.perf_counter()
    out = sweep(cols, vals, x)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps

    nnz = A.nnz
    nnz_per_s = nnz / dt
    bw = detect_bw()
    bytes_per_nnz = 8.0 + 4.0 * A.height / max(nnz, 1)  # vals+cols + y writes
    sol = bw / bytes_per_nnz
    target = 0.70 * sol
    print(json.dumps({
        "metric": "spmv_ell_fp32_nnz_per_s",
        "value": round(nnz_per_s, 1),
        "unit": "nnz/s",
        "vs_baseline": round(nnz_per_s / target, 4),
    }))


if __name__ == "__main__":
    main()
