"""Benchmark driver: sparse SpMV nnz/s on one chip (BASELINE configs #1/#2
headline metric; target ≥70% of HBM speed-of-light).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline = achieved/(0.70·SoL): ≥1.0 meets the BASELINE target.

Kernel: the halo-panel Pallas stencil SpMV (elemental_tpu.kernels.spmv) on a
1024×1024 2-D Laplacian (n=1.05M, nnz=5.2M) — BASELINE's "2D Laplacian from
examples/matrices" instance.

Timing methodology: the host↔device tunnel carries a fixed ~tens-of-ms
dispatch latency, so we time dependent-chain sweeps of R₁ and R₂ iterations
(device-side fori_loop, value fetched to host) and report the *marginal* time
(t₂−t₁)/(R₂−R₁) — the sustained per-SpMV device time, which is also what a
direct-attached deployment sees.

Roofline: per nnz the kernel streams 4 B of weight plane; x panel (resident
in VMEM) + output amortize to ~1.7 B/nnz for the 5-point stencil ⇒
~5.7 B/nnz ⇒ SoL ≈ 144 Gnnz/s on v5e (819 GB/s).
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
    import dataclasses

    from elemental_tpu.matrices import sparse_laplacian_2d
    from elemental_tpu.sparse import to_dia
    from elemental_tpu.kernels import spmv as K

    n1 = 1024
    A = sparse_laplacian_2d(n1, n1, scaled=False)
    dia = to_dia(A)
    # fold a 1/8 scaling into the weights so the dependent chain is
    # numerically neutral (spectral radius < 1) with zero extra passes
    plan = K.plan_stencil_spmv(dia.offsets,
                               (np.asarray(dia.diags) / 8.0).astype(np.float32),
                               A.height, cols=1024)
    dev = jax.devices()[0]
    plan = plan.device(dev)
    x = jax.device_put(
        np.random.default_rng(0).standard_normal(A.width).astype(np.float32),
        dev)

    spmv = lambda v: K.stencil_spmv(plan, v)

    # correctness gate vs host CSR
    y = jax.jit(spmv)(x)
    expect = (A.to_scipy() / 8.0) @ np.asarray(x)
    rel = np.abs(np.asarray(y) - expect).max() / np.abs(expect).max()
    assert rel < 1e-4, f"SpMV wrong: rel={rel}"

    def sweep_time(reps):
        fn = jax.jit(lambda x: jnp.sum(jax.lax.fori_loop(
            0, reps, lambda i, acc: spmv(acc), x)))
        float(fn(x))  # compile + warm
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(x))  # scalar fetch ⇒ true completion
            best = min(best, time.perf_counter() - t0)
        return best

    r1, r2 = 50, 250
    t1, t2 = sweep_time(r1), sweep_time(r2)
    dt = max((t2 - t1) / (r2 - r1), 1e-9)

    nnz = A.nnz
    nnz_per_s = nnz / dt
    bw = detect_bw()
    bytes_per_nnz = 4.0 + 2.0 * 4.0 * A.height / max(nnz, 1)  # W + x/out
    sol = bw / bytes_per_nnz
    target = 0.70 * sol
    print(json.dumps({
        "metric": "spmv_stencil_fp32_nnz_per_s",
        "value": round(nnz_per_s, 1),
        "unit": "nnz/s",
        "vs_baseline": round(nnz_per_s / target, 4),
    }))


if __name__ == "__main__":
    main()
