"""IO tests: MatrixMarket round-trip + MPS parsing of the reference's netlib
instances (read directly from the read-only reference data dir)."""

import os

import numpy as np
import pytest

from elemental_tpu.sparse import (SparseMatrix, read_matrix_market, read_mps,
                                  write_matrix_market)

REF_DATA = "/root/reference/data/optimization"

RNG = np.random.default_rng(23)


def test_matrix_market_roundtrip(tmp_path):
    m, n, nnz = 12, 9, 30
    A = SparseMatrix.from_coo(m, n, RNG.integers(0, m, nnz),
                              RNG.integers(0, n, nnz),
                              RNG.standard_normal(nnz))
    path = str(tmp_path / "a.mtx")
    write_matrix_market(path, A)
    B = read_matrix_market(path)
    np.testing.assert_allclose(B.to_dense(), A.to_dense(), rtol=1e-15)


@pytest.mark.skipif(not os.path.isdir(REF_DATA),
                    reason="reference data not mounted")
@pytest.mark.parametrize("name,nrows,ncols", [
    ("afiro", 27, 32),       # netlib afiro: 27 rows, 32 cols
    ("adlittle", 56, 97),
])
def test_read_netlib_mps(name, nrows, ncols):
    lp = read_mps(os.path.join(REF_DATA, f"{name}.mps"))
    total_rows = lp.A_eq.height + lp.A_le.height
    assert total_rows == nrows, (lp.A_eq.height, lp.A_le.height)
    assert lp.c.shape[0] == ncols
    assert lp.A_eq.width == ncols and lp.A_le.width == ncols
    # scipy cross-check of the parse via linprog on the small instances
    import scipy.optimize as sopt
    res = sopt.linprog(lp.c, A_ub=lp.A_le.to_dense(), b_ub=lp.b_le,
                       A_eq=lp.A_eq.to_dense() if lp.A_eq.height else None,
                       b_eq=lp.b_eq if lp.A_eq.height else None,
                       bounds=list(zip(
                           [None if np.isneginf(l) else l for l in lp.lower],
                           [None if np.isposinf(u) else u for u in lp.upper])),
                       method="highs")
    assert res.success
    known = {"afiro": -464.75314, "adlittle": 225494.96}
    np.testing.assert_allclose(res.fun, known[name], rtol=1e-5)
