

def test_viewer_owner_subgrid(grid8):
    """Viewers/owners grids (reference Grid(viewers, owners, height),
    Grid.hpp:59): a sub-grid owns the data; devices outside it are
    viewers; translate_between_grids moves data owner-set -> owner-set
    (the viewing-comm Translate analog)."""
    import numpy as np
    from elemental_tpu.core import MC, MR, distribute, translate_between_grids
    from elemental_tpu.core.distmatrix import as_array
    sub = grid8.subgrid(4, height=2)
    assert sub.size == 4 and len(sub.viewers) == 4
    assert sub.in_grid(sub.devices.ravel()[0])
    assert not sub.in_grid(sub.viewers[0])
    a = np.random.default_rng(0).standard_normal((32, 24)).astype(np.float32)
    A = distribute(a, MC, MR, sub)
    B = translate_between_grids(A, grid8)
    assert B.grid is grid8
    np.testing.assert_allclose(np.asarray(as_array(B)), a, rtol=0, atol=0)
    C = translate_between_grids(B, sub)
    np.testing.assert_allclose(np.asarray(as_array(C)), a, rtol=0, atol=0)


def test_dense_queue_update_pull(grid8):
    """Dense remote updates (reference AbstractDistMatrix
    QueueUpdate/ProcessQueues/QueuePull, AbstractDistMatrix.hpp:162-171)."""
    import numpy as np
    from elemental_tpu.core import MC, MR, distribute
    a = np.zeros((8, 6), np.float32)
    A = distribute(a, MC, MR, grid8)
    A.queue_update(1, 2, 3.5)
    A.queue_update(1, 2, 0.5)       # duplicates sum (COO semantics)
    A.queue_update(7, 5, -2.0)
    A2 = A.process_queues()
    out = A2.to_numpy()
    assert out[1, 2] == 4.0 and out[7, 5] == -2.0
    A2.queue_pull(1, 2)
    A2.queue_pull(7, 5)
    vals = A2.process_pull_queue()
    assert list(vals) == [4.0, -2.0]
