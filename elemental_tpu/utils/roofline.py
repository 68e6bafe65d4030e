"""Roofline audit helpers (BASELINE requirement: "every kernel
roofline-audited vs per-chip speed of light").

Usage::

    from elemental_tpu.utils.roofline import audit, chip_specs
    report = audit(fn, args, flops=..., bytes_accessed=...)
    # report.sol_fraction, report.achieved_flops, report.bound

Timing uses the marginal-chain methodology (see bench.py): dependent sweeps
of two lengths remove fixed dispatch latency.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class ChipSpec:
    name: str
    hbm_bw: float          # B/s
    peak_f32: float        # FLOP/s (MXU, f32 via 3-pass ≈ bf16/8?) — use
    peak_bf16: float       # FLOP/s


CHIPS = {
    "v5e": ChipSpec("v5e", 819e9, 98.3e12 / 2, 196.6e12),
    "v5 lite": ChipSpec("v5e", 819e9, 98.3e12 / 2, 196.6e12),
    "v4": ChipSpec("v4", 1228e9, 137.5e12 / 2, 275e12),
    "v5p": ChipSpec("v5p", 2765e9, 229.5e12, 459e12),
    "v6e": ChipSpec("v6e", 1640e9, 459e12 / 2, 918e12),
}


def chip_specs() -> ChipSpec:
    kind = jax.devices()[0].device_kind.lower()
    for k, spec in CHIPS.items():
        if k in kind:
            return spec
    return CHIPS["v5e"]


@dataclasses.dataclass
class RooflineReport:
    seconds: float
    achieved_flops: float
    achieved_bw: float
    bound: str              # 'memory' or 'compute'
    sol_seconds: float
    sol_fraction: float

    def __str__(self):
        return (f"{self.seconds * 1e6:.1f} us | "
                f"{self.achieved_flops / 1e12:.2f} TFLOP/s, "
                f"{self.achieved_bw / 1e9:.0f} GB/s | {self.bound}-bound, "
                f"{100 * self.sol_fraction:.1f}% of SoL")


def marginal_time(fn: Callable, x0, r1: int = 20, r2: int = 100,
                  tries: int = 3) -> float:
    """Per-application device time of ``fn`` via dependent-chain slope."""
    def sweep(reps):
        f = jax.jit(lambda x: jnp.sum(jax.lax.fori_loop(
            0, reps, lambda i, acc: fn(acc), x)))
        float(f(x0))
        best = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            float(f(x0))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = sweep(r1), sweep(r2)
    return max((t2 - t1) / (r2 - r1), 1e-12)


def audit(fn: Callable, x0, flops: float, bytes_accessed: float,
          dtype=jnp.float32, chain: bool = True,
          seconds: Optional[float] = None) -> RooflineReport:
    """Roofline-audit a self-composable kernel (fn: x → x-like)."""
    spec = chip_specs()
    if seconds is None:
        seconds = marginal_time(fn, x0) if chain else _simple_time(fn, x0)
    peak = spec.peak_bf16 if dtype == jnp.bfloat16 else spec.peak_f32
    t_mem = bytes_accessed / spec.hbm_bw
    t_cmp = flops / peak
    sol = max(t_mem, t_cmp)
    return RooflineReport(
        seconds=seconds,
        achieved_flops=flops / seconds,
        achieved_bw=bytes_accessed / seconds,
        bound="memory" if t_mem >= t_cmp else "compute",
        sol_seconds=sol,
        sol_fraction=sol / seconds,
    )


def _simple_time(fn, x0, reps: int = 20) -> float:
    out = fn(x0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(x0)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps
