"""LLL on a SINGULAR basis (mirror of ``examples/interface/LLLSingular.py``):
the reference's rank-3 4×4 integer matrix reduced across
variant × presort × δ sweeps — a correct LLL must expose the rank
deficiency as zero columns while keeping B·U = B_red with U unimodular."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.lapack import lll


def main():
    args = Args()
    args.process_input()
    # the reference's matrix (rank 2: columns 2 and 4 are integer
    # combinations of the first two)
    B = np.array([[-6, 9, -15, -18],
                  [4, -6, 10, 12],
                  [10, -15, 18, 35],
                  [-24, 36, -46, -82]], float)
    rank = np.linalg.matrix_rank(B)
    assert rank == 2, rank
    tried = 0
    for variant in ("weak", "normal", "deep"):
        for presort, smallest in ((True, True), (True, False),
                                  (False, False)):
            for delta in (0.5, 0.75, 0.95, 0.98):
                Br, U, R, info = lll(B, delta=delta, variant=variant,
                                     presort=presort,
                                     smallest_first=smallest)
                Br, U = np.asarray(Br), np.asarray(U)
                # B·U = B_red and U unimodular (lattice preserved)
                assert np.allclose(B @ U, Br, atol=1e-8)
                assert abs(abs(np.linalg.det(U)) - 1.0) < 1e-6
                # rank deficiency surfaces as n − rank zero columns
                zero_cols = int((np.abs(Br).max(axis=0) < 1e-8).sum())
                assert zero_cols >= B.shape[1] - rank, (variant, delta, Br)
                tried += 1
    output(f"LLL singular: {tried} (variant, presort, δ) combinations — "
           f"rank-{rank} input always reduces with ≥{B.shape[1] - rank} "
           f"zero columns, U unimodular")


if __name__ == "__main__":
    main()
