"""Long-only Markowitz portfolio (mirror of
``examples/interface/LongOnlyPortfolio.py``)."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.optimization import portfolio


def main():
    args = Args()
    args.input("n", "assets", 12)
    args.process_input()
    rng = np.random.default_rng(12)
    F = rng.standard_normal((args["n"], 4))
    Sigma = F @ F.T + 0.1 * np.eye(args["n"])
    mu = rng.standard_normal(args["n"]) * 0.1
    x = portfolio(Sigma, mu, gamma=1.0)
    output(f"portfolio: sum(x) = {x.sum():.6f}, min(x) = {x.min():.2e}, "
           f"risk = {x @ Sigma @ x:.4g}")
    assert abs(x.sum() - 1) < 1e-6 and x.min() > -1e-7


if __name__ == "__main__":
    main()
