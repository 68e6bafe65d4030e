"""Benchmark driver (BASELINE targets; VERDICT r3 #1 integrity hardening).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Architecture: the parent process (no jax import) runs each stage in a
SUBPROCESS with a hard timeout, so a wedged device or pathological compile
can never hang the driver.  Integrity rules (r3 verdict):

* Every stage declares a PHYSICAL bound (chip speed of light for its
  quantity); a measurement above the bound is REJECTED, never published —
  first at sample level (``_stable_marginal`` drops impossible samples),
  then by a final hard gate before the stage returns.
* A stage that fails records ``{"error": ...}`` in the output ``extra`` —
  a missing metric can never pass unnoticed again.
* Residual gates are dtype-derived (``core/policy.residual_bound``:
  ``100·eps(effective dtype)·n``, the reference ``Cholesky.cpp:41-44``
  formula), so stages survive fp32-on-TPU.

Timing methodology (inside stages): every measurement forces a VALUE
readback (``float(...)``) — through the axon tunnel ``block_until_ready``
returns before device completion, so readback is the only trustworthy
fence (measured r3).  Fast kernels use dependent-chain sweeps of R₁/R₂
device-side iterations and report the MEDIAN of ≥3 agreeing marginal
times (t(R₂)−t(R₁))/(R₂−R₁); the chain lengths are sized so the marginal
window is ≥50 ms, amortizing tunnel jitter (the r3 GEMM stage measured
MFU 1.09 > 1 with 10/40-rep chains — under-measurement, not speed).

Roofline notes per stage are in the stage functions.
"""

import json
import os
import statistics
import subprocess
import sys
import time
import traceback

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


def _stable_marginal(sweep, r1, r2, tol=0.07, need=3, max_tries=8,
                     sol=None):
    """Median of ``need`` agreeing marginals (t2−t1)/(r2−r1).

    A sample implying a rate ABOVE the physical bound ``sol`` (per-rep
    speed of light, seconds) is discarded — impossible numbers are
    measurement error by definition.  Returns None when no agreeing
    physically-possible estimate emerges."""
    ests = []
    for _ in range(max_tries):
        t1, t2 = sweep(r1), sweep(r2)
        dt = (t2 - t1) / (r2 - r1)
        if dt <= 0 or (sol is not None and dt < sol):
            continue  # jitter crossed or impossible — retry
        ests.append(dt)
        if len(ests) >= need:
            med = statistics.median(ests)
            close = [e for e in ests if abs(e - med) <= tol * med]
            if len(close) >= need:
                return statistics.median(close)
    if len(ests) >= 2:
        med = statistics.median(ests)
        if sol is None or med >= sol:
            return med
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
    dt = _stable_marginal(sweep, 100, 1100, sol=A.nnz / sol)
    if dt is None:
        return {"error": "no stable physically-possible marginal"}
    nnz_per_s = A.nnz / dt
    assert nnz_per_s <= sol, f"impossible: {nnz_per_s:.3g} > SoL {sol:.3g}"
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
    from elemental_tpu.sparse import SparseMatrix, plan_spmv

    n = 1 << 20
    rng = np.random.default_rng(0)
    rows = np.repeat(np.arange(n), 10)
    cols = rng.integers(0, n, 10 * n)
    vals = rng.standard_normal(10 * n)
    A = SparseMatrix.from_coo(n, n, rows, cols, vals)
    plan = plan_spmv(A)
    dev = jax.devices()[0]
    plan = plan.device(dev, dtype=jnp.float32)
    x = jax.device_put(rng.standard_normal(n).astype(np.float32), dev)

    mv = jax.jit(lambda plan, x: plan.matvec(x))
    y = mv(plan, x)
    expect = A.to_scipy().astype(np.float32) @ np.asarray(x)
    rel = np.abs(np.asarray(y) - expect).max() / np.abs(expect).max()
    assert rel < 1e-3, f"unstructured SpMV wrong: rel={rel}"

    def pipeline(reps):
        float(jnp.sum(mv(plan, x)))      # warm + fence
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = mv(plan, x)
        float(jnp.sum(out))              # single fence for the pipeline
        return time.perf_counter() - t0

    bw, _ = detect_bw()
    sol = bw / 12.0                       # 12 B/nnz accounting (BASELINE)
    dt = _stable_marginal(pipeline, 4, 12, sol=A.nnz / sol)
    if dt is None:
        return {"error": "no stable physically-possible marginal"}
    nnz_per_s = A.nnz / dt
    assert nnz_per_s <= sol, f"impossible: {nnz_per_s:.3g} > SoL {sol:.3g}"
    return {"metric": "spmv_unstructured_fp32_nnz_per_s",
            "value": round(nnz_per_s, 1), "unit": "nnz/s",
            "kind": plan.kind,
            "vs_baseline": round(nnz_per_s / (0.70 * sol), 4),
            "sol_frac": round(nnz_per_s / sol, 4)}


def stage_gemm():
    """SUMMA local-tier MXU MFU, bf16 and fp32 (Gemm_Suite.cpp:30-38
    analog; single chip — the mesh path is exercised by the dryrun).

    r3 shipped MFU 1.09 (impossible) from 10/40-rep chains: the ~20 ms
    marginal window was inside tunnel-jitter range.  Now the window is
    ≥300 matmuls (≥200 ms bf16), the marginal must agree 3× within 7 %,
    samples above peak are discarded, and the final value is hard-gated
    at 1.0× peak."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    _, peak_bf16 = detect_bw()
    out = {}
    errors = {}
    # fp32 matmuls under precision='highest' lower to the SIX-pass bf16
    # scheme on TPU (each operand split into 3 bf16 terms; the x_hi·y_hi,
    # x_hi·y_lo, x_lo·y_hi, x_hi·y_mid, x_mid·y_hi, x_mid·y_mid products
    # are needed for full f32 accuracy — 'high' is the 3-pass variant) —
    # the physical bound for that scheme is peak/6.  r4 published "fp32
    # MFU 0.476" against a peak/3 bound; the measured 31.2 TFLOPs is 0.95
    # of the correct 6-pass bound, i.e. the kernel was already at speed
    # of light and the bound was wrong (ADVICE r4; VERDICT r4 weak #4).
    for name, dtype, peak, prec in [
            ("bf16", jnp.bfloat16, peak_bf16, "default"),
            ("fp32", jnp.float32, peak_bf16 / 6, "highest")]:
        m = 4096
        a = jnp.asarray(np.random.default_rng(0).standard_normal(
            (m, m)).astype(np.float32)).astype(dtype)

        fn = {}

        def mm(a, acc):
            return jnp.matmul(a, acc, precision=prec) * (1.0 / m)

        def sweep(reps):
            if reps not in fn:
                fn[reps] = jax.jit(lambda a: jnp.sum(jax.lax.fori_loop(
                    0, reps, lambda i, acc: mm(a, acc), a,
                ).astype(jnp.float32)))
            f = fn[reps]
            float(f(a))
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                float(f(a))
                best = min(best, time.perf_counter() - t0)
            return best

        flops = 2 * m ** 3
        dt = _stable_marginal(sweep, 50, 350, sol=flops / peak)
        if dt is None:
            errors[name] = "no stable physically-possible marginal"
            continue
        mfu = flops / dt / peak
        assert mfu <= 1.0, f"impossible {name} MFU {mfu:.4f} > 1"
        out[f"gemm_{name}_tflops"] = round(flops / dt / 1e12, 2)
        out[f"gemm_{name}_mfu"] = round(mfu, 4)
    if errors:
        out["errors"] = errors
    if "gemm_bf16_mfu" not in out:
        return {"error": "bf16 measurement failed", **out}
    return {"metric": "gemm_mfu", "value": out["gemm_bf16_mfu"],
            "unit": "frac_peak", "vs_baseline": out["gemm_bf16_mfu"],
            **out}


def stage_sparse_ldl():
    """Multifrontal LDL factor GFlop/s on a 3-D Laplacian
    (SparseLDL.cpp:143-196 analog).  The residual gate is dtype-derived
    (core/policy.residual_bound) so the stage survives fp32-on-TPU."""
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
    r = float(np.linalg.norm(A.to_scipy() @ np.asarray(x) - b)
              / np.linalg.norm(b))
    bound = f.residual_bound()
    assert r < bound, f"LDL residual {r} > {bound}"
    gf = f.factor_gflops()

    vals = jnp.asarray(A.vals, f._dtype)
    reg = jnp.zeros(A.height, f._dtype)

    def pipeline(reps):
        f._run_factor(vals, reg)   # warm
        d = None
        t0 = time.perf_counter()
        for _ in range(reps):
            pool, d = f._run_factor(vals, reg)
        float(jnp.sum(d))
        return time.perf_counter() - t0

    _, peak_bf16 = detect_bw()
    peak_fp32 = peak_bf16 / 4
    dt = _stable_marginal(pipeline, 2, 6, sol=gf * 1e9 / peak_fp32)
    if dt is None:
        return {"error": "no stable physically-possible marginal",
                "residual": r, "residual_bound": bound}
    gfs = gf / dt
    assert gfs * 1e9 <= peak_fp32, f"impossible {gfs} GF/s > fp32 peak"
    return {"metric": "sparse_ldl_factor_gflops",
            "value": round(gfs, 2), "unit": "GFlop/s",
            "vs_baseline": round(gfs, 2),
            "factor_seconds": round(dt, 4), "residual": r,
            "residual_bound": round(bound, 6)}


def stage_condense():
    """HermitianTridiag n=4096 (blocked latrd panels + rank-2nb MXU
    trailing updates, ``lapack/condense.py``): wall seconds + effective
    GFlop/s against the 4/3·n³ reduction flop count (reference per-stage
    eigensolver timings, ``HermitianEig.cpp:943-1056``)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from elemental_tpu.lapack import hermitian_tridiag

    n = 4096
    rng = np.random.default_rng(0)
    a = rng.standard_normal((n, n)).astype(np.float32)
    A = jnp.asarray(a + a.T)

    f = jax.jit(lambda A: hermitian_tridiag("L", A, want_q=False)[:2])
    d, e = f(A)
    # correctness: eigenvalue agreement vs host LAPACK on the tridiagonal
    import scipy.linalg as sla
    w_t = sla.eigvalsh_tridiagonal(np.asarray(d, np.float64),
                                   np.asarray(e, np.float64),
                                   select="i", select_range=(n - 5, n - 1))
    w_a = np.linalg.eigvalsh(np.asarray(A, np.float64))[-5:]
    scale = np.abs(w_a).max()
    err = np.abs(w_t - w_a).max() / scale
    from elemental_tpu.core.policy import residual_bound
    bound = residual_bound(A.dtype, n)   # 100·eps(f32)·n ≈ 0.049 at n=4096
    assert err < bound, f"tridiag eigenvalues off: {err} > {bound}"

    def sweep(reps):
        float(jnp.sum(f(A)[0]))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = f(A)
            float(jnp.sum(out[0]))
            best = min(best, time.perf_counter() - t0)
        return best

    flops = 4.0 / 3.0 * n ** 3
    _, peak_bf16 = detect_bw()
    # condensations run under precision='highest'-free matmuls: physical
    # bound = the bf16-pipeline peak (v5e executes f32 MXU work there)
    dt = _stable_marginal(sweep, 1, 3, sol=flops / peak_bf16)
    if dt is None:
        return {"error": "no stable physically-possible marginal"}
    gfs = flops / dt / 1e9
    assert gfs * 1e9 <= peak_bf16, f"impossible {gfs} GF/s > peak"
    out = {"metric": "hermitian_tridiag_gflops", "value": round(gfs, 2),
           "unit": "GFlop/s", "vs_baseline": round(gfs, 2),
           "seconds": round(dt, 4), "eig_err": float(err)}

    # blocked Bidiag + Hessenberg.  The r4 "15× bidiag-vs-tridiag gap"
    # (53 @2048 vs 813 @4096) was mostly a SIZE mismatch: measured r5
    # size-matched on v5e — tridiag 267 vs bidiag 50 GF/s at n=2048,
    # tridiag 703 vs bidiag 168 at n=4096.  The remaining ~4-5× is the
    # labrd panel's reuse ceiling: each bidiag column runs TWO
    # unsymmetric trailing GEMVs (A·v and Aᵀ·u — 2 full passes over the
    # trailing matrix, AI ≈ 1 flop/byte, HBM-bound) where latrd runs one
    # symmetric Hemv sharing a single pass; bidiag is now benched at
    # n=4096 alongside tridiag.
    from elemental_tpu.lapack.condense import (_bidiag_blocked,
                                               _hessenberg_blocked,
                                               bidiag, hessenberg)
    n2 = 4096
    a2 = jnp.asarray(rng.standard_normal((n2, n2)).astype(np.float32))

    def time_call(f, *args, reps=(1, 3)):
        jax.tree.map(lambda t: float(jnp.sum(jnp.real(t))), f(*args))
        def sweep2(r):
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                out = None
                for _ in range(r):
                    out = f(*args)
                jax.tree.map(lambda t: float(jnp.sum(jnp.real(t))), out)
                best = min(best, time.perf_counter() - t0)
            return best
        return _stable_marginal(sweep2, *reps)

    # hessenberg at n=4096 (blocked dispatch regime; see condense.py's
    # measured crossover at ~3k)
    fh = jax.jit(lambda a: _hessenberg_blocked(a, nb=32))
    dt_h = time_call(fh, A)
    if dt_h:
        out["hessenberg_gflops"] = round(10 / 3 * n ** 3 / dt_h / 1e9, 2)
        out["hessenberg_seconds"] = round(dt_h, 4)
    fb = jax.jit(lambda a: _bidiag_blocked(a, nb=32))
    dt_b = time_call(fb, a2)
    if dt_b:
        out["bidiag_gflops"] = round(8 / 3 * n2 ** 3 / dt_b / 1e9, 2)
        out["bidiag_seconds"] = round(dt_b, 4)
    return out


STAGES = {"stencil": stage_stencil, "unstructured": stage_unstructured,
          "gemm": stage_gemm, "sparse_ldl": stage_sparse_ldl,
          "condense": stage_condense}


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--stage":
        try:
            res = STAGES[sys.argv[2]]()
        except Exception:  # noqa: BLE001 — recorded, never silent
            res = {"error": traceback.format_exc(limit=3).strip()[-600:]}
        print("BENCH_RESULT " + json.dumps(res))
        return

    # orchestrator: each stage in a subprocess with a hard timeout;
    # EVERY stage appears in the output — as a metric or as an error
    tb = float(os.environ.get("BENCH_TIMEOUT", "0"))
    budget = {"stencil": 900, "unstructured": 900, "gemm": 900,
              "sparse_ldl": 900, "condense": 900}
    if tb:
        budget = {k: tb for k in budget}
    results = {}
    only = os.environ.get("BENCH_STAGES")
    names = list(STAGES) if not only else only.split(",")
    for name in names:
        for attempt in range(2):
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--stage", name],
                    capture_output=True, text=True, timeout=budget[name])
                res = None
                for line in proc.stdout.splitlines():
                    if line.startswith("BENCH_RESULT "):
                        res = json.loads(line[len("BENCH_RESULT "):])
                        break
                if res is None:
                    res = {"error": "stage died: "
                           + proc.stderr.strip()[-400:]}
                results[name] = res
                if "error" not in res:
                    break
            except subprocess.TimeoutExpired:
                results[name] = {"error":
                                 f"timeout after {budget[name]}s"}

    head = results.get("stencil")
    if head is None or "error" in head:
        head = {"metric": "spmv_stencil_fp32_nnz_per_s", "value": 0.0,
                "unit": "nnz/s", "vs_baseline": 0.0,
                "error": (head or {}).get("error", "stage missing")}
    head["extra"] = {k: v for k, v in results.items() if k != "stencil"}
    print(json.dumps(head))


if __name__ == "__main__":
    main()
