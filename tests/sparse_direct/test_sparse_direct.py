

def test_chunked_level_solve(monkeypatch):
    import numpy as np
    """Oversized level batches route the batched triangular solve through
    lax.map chunks (r4: XLA's InvertDiagBlocksLowerTriangular overflows
    scoped VMEM past ~2M batch elements) — forced here via a tiny
    threshold, must match the unchunked result exactly."""
    import jax.numpy as jnp
    from elemental_tpu.matrices import sparse_laplacian_2d
    from elemental_tpu.sparse_direct import SparseLDLFactorization
    from elemental_tpu.sparse_direct.numeric import LDLFactorization
    A = sparse_laplacian_2d(12, 12, scaled=False)
    f = SparseLDLFactorization(spd=True)
    f.initialize(A, cutoff=16)
    f.factor()
    b = np.random.default_rng(3).standard_normal(A.height)
    x_ref = np.asarray(f.solve(b))
    monkeypatch.setattr(LDLFactorization, "TRI_SOLVE_CHUNK_ELEMS", 64)
    f2 = SparseLDLFactorization(spd=True)
    f2.initialize(A, cutoff=16)
    f2.factor()
    x_ch = np.asarray(f2.solve(b))
    np.testing.assert_allclose(x_ch, x_ref, rtol=1e-12, atol=1e-12)
