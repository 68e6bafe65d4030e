"""Redistribution between different process grids (mirror of
``tests/core/DifferentGrids.cpp`` / ``examples``): round-trip a matrix
between a 2x4, a 4x2, and a 1x1 grid and check bit-exactness."""
import _path  # noqa: F401
import numpy as np
import jax
import elemental_tpu as el
from elemental_tpu.core.environment import output
from elemental_tpu.core.redistribute import translate_between_grids


def main():
    try:
        devs = jax.devices("cpu")
    except RuntimeError:
        devs = jax.devices()
    if len(devs) < 8:
        output("different_grids: needs 8 devices "
               "(set XLA_FLAGS=--xla_force_host_platform_device_count=8)")
        devs = devs * (8 // max(1, len(devs)))
    g24 = el.Grid(devices=devs[:8], height=2)
    g42 = el.Grid(devices=devs[:8], height=4)
    g11 = el.Grid(devices=devs[:1], height=1)
    rng = np.random.default_rng(16)
    a = rng.standard_normal((48, 40))
    A = el.distribute(a, el.MC, el.MR, g24)
    B = translate_between_grids(A, g42)
    C = translate_between_grids(B, g11)
    D = translate_between_grids(C, g24)
    assert np.array_equal(np.asarray(el.core.as_array(D)), a)
    output("different_grids: 2x4 -> 4x2 -> 1x1 -> 2x4 round-trip bit-exact")


if __name__ == "__main__":
    main()
