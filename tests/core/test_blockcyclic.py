"""Block-cyclic (BLOCK wrap) layout: ScaLAPACK ownership + conversions."""

import numpy as np
import pytest

from elemental_tpu.core.blockcyclic import BlockCyclicMatrix, block_cyclic_perm


def test_perm_matches_scalapack_ownership():
    n, nb, p = 96, 8, 4
    perm = block_cyclic_perm(n, nb, p)
    # storage position k belongs to device k // (n/p); check the ScaLAPACK
    # owner formula holds for every global index
    per = n // p
    for k in range(n):
        dev = k // per
        g = perm[k]
        assert (g // nb) % p == dev


def test_roundtrip_and_element_conversion(grid8):
    rng = np.random.default_rng(0)
    a = rng.standard_normal((70, 45))
    B = BlockCyclicMatrix.from_array(a, grid8, mb=8, nb=4)
    np.testing.assert_array_equal(B.to_array(), a)
    assert B.owner(0, 0) == (0, 0)
    assert B.owner(8, 0) == (1, 0)       # second row-block -> next grid row
    assert B.owner(0, 4) == (0, 1)
    E = B.to_element()
    np.testing.assert_allclose(np.asarray(
        __import__("elemental_tpu").core.as_array(E)), a)
    B2 = BlockCyclicMatrix.from_element(E, mb=8, nb=4)
    np.testing.assert_allclose(B2.to_array(), a)


def test_gemm_through_conversion(grid8):
    import elemental_tpu as el
    rng = np.random.default_rng(1)
    a = rng.standard_normal((48, 32))
    b = rng.standard_normal((32, 40))
    A = BlockCyclicMatrix.from_array(a, grid8, mb=8, nb=8)
    Bm = BlockCyclicMatrix.from_array(b, grid8, mb=8, nb=8)
    C = el.ops.gemm("N", "N", 1.0, A.to_element(), Bm.to_element())
    np.testing.assert_allclose(C.to_numpy(), a @ b, rtol=1e-10)
