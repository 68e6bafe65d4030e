"""Lattice-reduction tier tests (reference drivers
``examples/interface/{LLL,LLLSingular,LatticeImageAndKernel,
ZDependenceSearch,AlgebraicRelationSearch}.py``)."""

import numpy as np
import pytest

from elemental_tpu.lapack import (algebraic_relation_search,
                                  lattice_image_and_kernel, lll,
                                  z_dependence_search)
from elemental_tpu.matrices import ajtai_type_basis, knapsack_type_basis
from elemental_tpu.core import random_ as rng


@pytest.mark.parametrize("variant", ["weak", "normal", "deep"])
@pytest.mark.parametrize("delta", [0.5, 0.75, 0.98])
def test_lll_is_unimodular_and_size_reduced(variant, delta):
    r = np.random.default_rng(0)
    B = np.round(r.uniform(0, 10, (16, 16)))
    Br, U, R, info = lll(B, delta, variant=variant)
    # same lattice: Br = B·U with |det U| = 1
    assert np.abs(Br - B @ U).max() < 1e-6
    assert abs(abs(np.linalg.det(U)) - 1.0) < 1e-6
    # reduction made progress (for the stronger deltas the first vector is
    # in practice no longer than the shortest original basis vector)
    if delta >= 0.75:
        assert np.linalg.norm(Br[:, 0]) <= np.linalg.norm(
            B, axis=0).min() + 1e-9
    # R is the GS factor of the reduced basis: BrᵀBr = RᵀR
    G = Br.T @ Br
    assert np.abs(G - R.T @ R).max() < 1e-6 * max(1.0, np.abs(G).max())
    # achieved eta ≤ 0.51 + slack for the full-reduction variants
    if variant != "weak":
        assert info.eta <= 0.52


def test_lll_presort_variants_agree_on_lattice():
    r = np.random.default_rng(1)
    B = np.round(r.uniform(0, 10, (12, 12)))
    vol = abs(np.linalg.det(B))
    for presort, smallest in [(True, True), (True, False), (False, False)]:
        Br, U, _, _ = lll(B, presort=presort, smallest_first=smallest)
        assert abs(abs(np.linalg.det(Br)) - vol) < 1e-4 * vol


def test_lll_singular_detects_nullity():
    r = np.random.default_rng(2)
    B = np.round(r.uniform(0, 5, (10, 7)))
    B[:, 6] = 3 * B[:, 0] - B[:, 2]
    B[:, 5] = B[:, 1] + B[:, 3]
    img, ker, info = lattice_image_and_kernel(B)
    assert info.nullity == 2
    assert ker.shape[1] == 2
    assert np.abs(B @ ker).max() < 1e-6
    assert img.shape[1] == 5


def test_z_dependence_search_recovers_hidden_relation():
    r = np.random.default_rng(3)
    n = 15
    z = r.uniform(10, 15, n)
    a_hidden = np.round(r.uniform(-5, 5, n - 1))
    z[-1] = a_hidden @ z[:-1]
    a, res, _ = z_dependence_search(z, n_sqrt=1e8)
    assert res < 1e-4
    assert np.abs(a).max() > 0


def test_z_dependence_search_complex():
    r = np.random.default_rng(4)
    n = 10
    z = r.uniform(8, 12, n) + 1j * r.uniform(8, 12, n)
    a_hidden = np.round(r.uniform(-4, 4, n - 1))
    z[-1] = a_hidden @ z[:-1]
    a, res, _ = z_dependence_search(z, n_sqrt=1e8)
    assert res < 1e-3


def test_algebraic_relation_search_finds_min_polys():
    # √2 → x² − 2; golden ratio → x² − x − 1
    c, res, _ = algebraic_relation_search(np.sqrt(2.0), 2, 1e8)
    assert res < 1e-6
    c = c // np.gcd.reduce(np.abs(c[c != 0]))
    assert set(np.abs(c)) <= {0, 1, 2}
    phi = (1 + np.sqrt(5)) / 2
    c2, res2, _ = algebraic_relation_search(phi, 2, 1e8)
    assert res2 < 1e-6


def test_lll_on_reference_lattice_bases():
    rng.seed(11)
    K = np.asarray(knapsack_type_basis(10, 1000.0))
    Br, U, _, info = lll(K)
    assert np.abs(Br - K @ U).max() < 1e-6
    A = np.asarray(ajtai_type_basis(8, 0.5))
    Br2, U2, _, _ = lll(A)
    assert abs(abs(np.linalg.det(U2)) - 1.0) < 1e-6
