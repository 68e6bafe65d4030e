"""Interior-point LP on a netlib MPS instance (mirror of reference
``examples/interface/LPDirect.py``).

Run:  python examples/lp_direct.py --mps /root/reference/data/optimization/afiro.mps
"""

import _path  # noqa: F401
from elemental_tpu.core.environment import Args, output
from elemental_tpu.optimization import Approach, LPCtrl, solve_mps
from elemental_tpu.sparse import read_mps


def main():
    args = Args()
    args.input("mps", "path to an MPS file",
               "/root/reference/data/optimization/afiro.mps")
    args.input("approach", "mehrotra | ipf", "mehrotra")
    args.input("tol", "convergence tolerance", 1e-8)
    args.process_input()

    lp = read_mps(args["mps"])
    output(f"LP '{lp.name}': {lp.c.shape[0]} vars, "
           f"{lp.A_eq.height} eq + {lp.A_le.height} ineq rows")
    ctrl = LPCtrl(approach=args["approach"], tol=args["tol"],
                  max_iters=200, verbose=True)
    res, x = solve_mps(lp, ctrl)
    output(f"objective = {res.objective:.8g}  "
           f"({res.iterations} iterations, converged={res.converged})")


if __name__ == "__main__":
    main()
