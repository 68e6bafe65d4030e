"""Complex basis pursuit (mirror of ``examples/interface/BPComplex.py``):
min ‖x‖₁ over ℂ s.t. Ax = b — realified into an SOCP with n order-3
Lorentz cones (t_i ≥ |x_i|)."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.optimization import basis_pursuit_complex


def main():
    args = Args()
    args.input("m", "rows", 12)
    args.input("n", "cols", 30)
    args.input("k", "true sparsity", 3)
    args.process_input()
    m, n, k = args["m"], args["n"], args["k"]
    rng = np.random.default_rng(11)
    A = (rng.standard_normal((m, n))
         + 1j * rng.standard_normal((m, n))) / np.sqrt(2 * m)
    x_true = np.zeros(n, complex)
    sup = rng.choice(n, k, replace=False)
    x_true[sup] = rng.standard_normal(k) + 1j * rng.standard_normal(k)
    b = A @ x_true

    x = basis_pursuit_complex(A, b)
    feas = np.linalg.norm(A @ x - b) / (1 + np.linalg.norm(b))
    assert feas < 1e-3, feas
    # BP recovers the sparse generator for k ≪ m (ℓ1 certificate): the
    # recovered ℓ1 norm can never exceed the generator's
    l1 = np.abs(x).sum()
    l1_true = np.abs(x_true).sum()
    assert l1 <= l1_true * (1 + 1e-2), (l1, l1_true)
    output(f"complex BP: ‖x‖₁ {l1:.6g} (generator {l1_true:.6g}), "
           f"feasibility {feas:.2e}")


if __name__ == "__main__":
    main()
