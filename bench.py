"""Benchmark driver (BASELINE targets; VERDICT r2 #3 hardening).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Architecture: the parent process (no jax import) runs each stage in a
SUBPROCESS with a hard timeout, so a wedged device or pathological compile
can never hang the driver; a stage that dies or reports a physically
impossible number (above the chip's speed of light) is retried once and
otherwise dropped.  The headline metric stays the stencil SpMV
(``spmv_stencil_fp32_nnz_per_s``, vs 70 % of HBM SoL); the other stages ride
in ``extra``.

Timing methodology (inside stages): every measurement forces a VALUE
readback (``float(...)``) — through the axon tunnel ``block_until_ready``
returns before device completion, so readback is the only trustworthy
fence (measured this round).  Fast kernels use dependent-chain sweeps of
R₁/R₂ device-side iterations and report the marginal time; the sweep pair
is re-run until two estimates agree within 10 %.  Multi-dispatch pipelines
(where a device loop would change the compiled code) use R pipelined
dispatches + one readback.

Roofline notes per stage are in the stage functions.
"""

import json
import os
import subprocess
import sys
import time

HBM_BW = {  # GB/s per chip
    "v5e": 819.0, "v5 lite": 819.0, "v4": 1228.0, "v5p": 2765.0,
    "v6e": 1640.0,
}
PEAK_BF16 = {"v5e": 197e12, "v5 lite": 197e12, "v4": 275e12,
             "v5p": 459e12, "v6e": 918e12}


def detect_bw():
    import jax
    kind = jax.devices()[0].device_kind.lower()
    for k, bw in HBM_BW.items():
        if k in kind:
            return bw * 1e9, PEAK_BF16.get(k, 197e12)
    return 819.0e9, 197e12


def _stable_marginal(sweep, r1, r2, tol=0.10, max_tries=5, sol=None):
    """Marginal (t2−t1)/(r2−r1), repeated until two estimates agree within
    tol and the result is physically possible (≤ SoL when given)."""
    ests = []
    for _ in range(max_tries):
        t1, t2 = sweep(r1), sweep(r2)
        dt = (t2 - t1) / (r2 - r1)
        if dt <= 0 or (sol is not None and 1.0 / dt > 1.5 * sol):
            continue  # jitter crossed or impossible — retry
        ests.append(dt)
        if len(ests) >= 2 and abs(ests[-1] - ests[-2]) <= tol * ests[-1]:
            return ests[-1]
    if ests:
        return min(ests)
    return None


# --------------------------------------------------------------------------
# stages (run inside subprocesses)
# --------------------------------------------------------------------------

def stage_stencil():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from elemental_tpu.matrices import sparse_laplacian_2d
    from elemental_tpu.sparse import to_dia
    from elemental_tpu.kernels import spmv as K

    n1 = 1024
    A = sparse_laplacian_2d(n1, n1, scaled=False)
    dia = to_dia(A)
    plan = K.plan_stencil_spmv(
        dia.offsets, (np.asarray(dia.diags) / 8.0).astype(np.float32),
        A.height, cols=1024)
    dev = jax.devices()[0]
    plan = plan.device(dev)
    x = jax.device_put(np.random.default_rng(0).standard_normal(
        A.width).astype(np.float32), dev)

    # correctness gate vs host CSR
    y = jax.jit(lambda plan, x: K.stencil_spmv(plan, x))(plan, x)
    expect = (A.to_scipy() / 8.0) @ np.asarray(x)
    rel = np.abs(np.asarray(y) - expect).max() / np.abs(expect).max()
    assert rel < 1e-4, f"SpMV wrong: rel={rel}"

    # chain sweep with the plan CLOSED OVER: Pallas kernel operands run
    # FASTER as jaxpr constants (measured 160 vs 114 Gnnz/s as-argument on
    # v5e — the constants cliff is specific to XLA gather/scatter
    # emitters, not Pallas calls); readback forces completion
    fn = {}

    def sweep(reps):
        if reps not in fn:
            fn[reps] = jax.jit(lambda x: jnp.sum(jax.lax.fori_loop(
                0, reps, lambda i, acc: K.stencil_spmv(plan, acc), x)))
        f = fn[reps]
        float(f(x))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(x))
            best = min(best, time.perf_counter() - t0)
        return best

    bw, _ = detect_bw()
    bytes_per_nnz = 4.0 + 2.0 * 4.0 * A.height / max(A.nnz, 1)
    sol = bw / bytes_per_nnz          # nnz/s at speed of light
    dt = _stable_marginal(sweep, 50, 250, sol=sol / A.nnz)
    if dt is None:
        return None
    nnz_per_s = A.nnz / dt
    return {"metric": "spmv_stencil_fp32_nnz_per_s",
            "value": round(nnz_per_s, 1), "unit": "nnz/s",
            "vs_baseline": round(nnz_per_s / (0.70 * sol), 4),
            "sol_frac": round(nnz_per_s / sol, 4)}


def stage_unstructured():
    """Uniform-random CSR (defeats RCM), n=2^20, 10 nnz/row: the Pallas
    windowed-gather + argument-passed sorted segment_sum pipeline.  Timing:
    R pipelined dispatches + final readback (a device-side loop would
    recompile the XLA half onto its in-loop scalar path)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from elemental_tpu.sparse import SparseMatrix
    from elemental_tpu.kernels.unstructured import plan_gather_spmv

    n = 1 << 20
    rng = np.random.default_rng(0)
    rows = np.repeat(np.arange(n), 10)
    cols = rng.integers(0, n, 10 * n)
    vals = rng.standard_normal(10 * n)
    A = SparseMatrix.from_coo(n, n, rows, cols, vals)
    plan = plan_gather_spmv(A)
    dev = jax.devices()[0]
    plan = jax.device_put(plan, dev)
    import dataclasses
    plan = dataclasses.replace(plan, vals=plan.vals.astype(jnp.float32))
    x = jax.device_put(rng.standard_normal(n).astype(np.float32), dev)

    mv = jax.jit(lambda plan, x: plan.matvec(x))
    y = mv(plan, x)
    expect = A.to_scipy().astype(np.float32) @ np.asarray(x)
    rel = np.abs(np.asarray(y) - expect).max() / np.abs(expect).max()
    assert rel < 1e-3, f"unstructured SpMV wrong: rel={rel}"

    def pipeline(reps):
        s = 0.0
        float(jnp.sum(mv(plan, x)))      # warm + fence
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = mv(plan, x)
        float(jnp.sum(out))              # single fence for the pipeline
        return time.perf_counter() - t0

    bw, _ = detect_bw()
    sol = bw / 12.0                       # 12 B/nnz accounting (BASELINE)
    dt = _stable_marginal(pipeline, 4, 12, sol=sol / A.nnz)
    if dt is None:
        return None
    nnz_per_s = A.nnz / dt
    return {"metric": "spmv_unstructured_fp32_nnz_per_s",
            "value": round(nnz_per_s, 1), "unit": "nnz/s",
            "vs_baseline": round(nnz_per_s / (0.70 * sol), 4),
            "sol_frac": round(nnz_per_s / sol, 4)}


def stage_gemm():
    """SUMMA local-tier MXU MFU, bf16 and fp32 (Gemm_Suite.cpp:30-38
    analog; single chip — the mesh path is exercised by the dryrun)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    _, peak_bf16 = detect_bw()
    out = {}
    for name, dtype, peak in [("bf16", jnp.bfloat16, peak_bf16),
                              ("fp32", jnp.float32, peak_bf16 / 4)]:
        m = 4096
        a = jnp.asarray(np.random.default_rng(0).standard_normal(
            (m, m)).astype(np.float32)).astype(dtype)

        def sweep(reps):
            f = jax.jit(lambda a: jnp.sum(jax.lax.fori_loop(
                0, reps, lambda i, acc: (a @ acc) * (1.0 / m), a,
            ).astype(jnp.float32)))
            float(f(a))
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                float(f(a))
                best = min(best, time.perf_counter() - t0)
            return best

        flops = 2 * m ** 3
        dt = _stable_marginal(sweep, 10, 40, sol=peak / flops)
        if dt is not None:
            out[f"gemm_{name}_tflops"] = round(flops / dt / 1e12, 2)
            out[f"gemm_{name}_mfu"] = round(flops / dt / peak, 4)
    return {"metric": "gemm_mfu", "value": out.get("gemm_bf16_mfu", 0.0),
            "unit": "frac_peak", "vs_baseline": out.get("gemm_bf16_mfu", 0.0),
            **out} if out else None


def stage_sparse_ldl():
    """Multifrontal LDL factor GFlop/s on a 3-D Laplacian
    (SparseLDL.cpp:143-196 analog)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from elemental_tpu.matrices import sparse_laplacian_3d
    from elemental_tpu.sparse_direct import SparseLDLFactorization

    A = sparse_laplacian_3d(24, 24, 24, scaled=False)
    f = SparseLDLFactorization(spd=True)
    f.initialize(A, cutoff=64)
    f.factor()                      # warm: builds + compiles
    b = np.random.default_rng(0).standard_normal(A.height)
    x = f.solve(b)
    r = np.linalg.norm(A.to_scipy() @ np.asarray(x) - b) / np.linalg.norm(b)
    assert r < 1e-4, f"LDL residual {r}"
    gf = f.factor_gflops()

    vals = jnp.asarray(A.vals, f._dtype)
    reg = jnp.zeros(A.height)

    def pipeline(reps):
        pool = None
        f._factor_jit(f.symb, vals, reg)   # warm
        t0 = time.perf_counter()
        for _ in range(reps):
            pool, d = f._factor_jit(f.symb, vals, reg)
        float(jnp.sum(d))
        return time.perf_counter() - t0

    dt = _stable_marginal(pipeline, 2, 6)
    if dt is None:
        return None
    return {"metric": "sparse_ldl_factor_gflops",
            "value": round(gf / dt, 2), "unit": "GFlop/s",
            "vs_baseline": round(gf / dt, 2),
            "factor_seconds": round(dt, 4), "residual": float(r)}


STAGES = {"stencil": stage_stencil, "unstructured": stage_unstructured,
          "gemm": stage_gemm, "sparse_ldl": stage_sparse_ldl}


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--stage":
        res = STAGES[sys.argv[2]]()
        print("BENCH_RESULT " + json.dumps(res))
        return

    # orchestrator: each stage in a subprocess with a hard timeout
    tb = float(os.environ.get("BENCH_TIMEOUT", "0"))
    budget = {"stencil": 900, "unstructured": 900, "gemm": 600,
              "sparse_ldl": 900}
    if tb:
        budget = {k: tb for k in budget}
    results = {}
    for name, fn in STAGES.items():
        for attempt in range(2):
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--stage", name],
                    capture_output=True, text=True, timeout=budget[name])
                for line in proc.stdout.splitlines():
                    if line.startswith("BENCH_RESULT "):
                        res = json.loads(line[len("BENCH_RESULT "):])
                        if res is not None:
                            results[name] = res
                        break
                if name in results:
                    break
            except subprocess.TimeoutExpired:
                continue

    head = results.get("stencil")
    if head is None:
        head = {"metric": "spmv_stencil_fp32_nnz_per_s", "value": 0.0,
                "unit": "nnz/s", "vs_baseline": 0.0,
                "error": "stage failed or timed out"}
    head["extra"] = {k: v for k, v in results.items() if k != "stencil"}
    print(json.dumps(head))


if __name__ == "__main__":
    main()
