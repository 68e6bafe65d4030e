"""Matrix generators (reference ``src/matrices/**``, ~60 generators:
deterministic/classical, misc, pde, sparse_toeplitz, integral, random).

Dense generators return ``jnp`` arrays (wrap with ``distribute`` for a mesh);
PDE generators also have sparse overloads returning :class:`SparseMatrix` —
the overloads that are MISSING from the reference tree
(``src/matrices/deterministic/pde/Laplacian.cpp:17-56`` is dense-only) but
required by its sparse tests/examples (``examples/lapack_like/Helmholtz.cpp``).
"""

from .deterministic import (cauchy, circulant, demmel, diagonal, dynamic_regularization_counter,
                            egorov, ehrenfest, fiedler, forsythe, fourier,
                            gcd_matrix, gear, gkms, grcar, hankel, hanowa,
                            hilbert, identity, jordan, kahan, kms, lauchli,
                            lehmer, lotkin, minij, ones, onetwoone, parter,
                            pei, redheffer, riemann, ris, toeplitz,
                            triangle, trefethen_embree, walsh, wilkinson,
                            zeros)
from .pde import (helmholtz_1d, helmholtz_2d, helmholtz_3d, helmholtz_pml_2d,
                  laplacian_1d, laplacian_2d, laplacian_3d,
                  sparse_helmholtz_2d, sparse_helmholtz_3d,
                  sparse_laplacian_1d, sparse_laplacian_2d,
                  sparse_laplacian_3d)
from .random_gen import (bernoulli, gaussian, haar, hermitian_uniform_spectrum,
                         normal_uniform_spectrum, rademacher, uniform, wigner)
