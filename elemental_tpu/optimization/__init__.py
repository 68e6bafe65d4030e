"""Conic optimization tier (reference MISSING ``src/optimization``: IPM
LP/QP/SOCP + application solvers, spec from ``examples/interface/*.py``)."""

from .lp import (Approach, LPCtrl, LPResult, lp_affine, lp_direct,
                 mps_to_standard, solve_mps)
from .qp import qp_affine, qp_box, qp_direct
from .socp import (Cones, SOCPResult, in_cone, max_step, soc_apply,
                   soc_dets, soc_identity, soc_inverse, soc_min_eig,
                   socp_affine)
from .solvers import (basis_pursuit, basis_pursuit_complex, bpdn,
                      chebyshev_point, dantzig_selector, elastic_net,
                      lasso, lav, nnls, portfolio, rnnls,
                      robust_least_squares, svm, total_variation)
