"""LCF-notation graph builder (mirror of ``examples/interface/LCF.py``):
build the Levi, dodecahedral, and truncated-octahedral graphs from their
Lewis-Coxeter-Frucht codes with the Graph Queue/Process protocol, then
verify 3-regularity and render a spy plot."""
import _path  # noqa: F401
import numpy as np
from elemental_tpu.core.environment import Args, output
from elemental_tpu.io import spy
from elemental_tpu.sparse import Graph


def lcf_graph(lcf) -> Graph:
    n = len(lcf)
    s = np.arange(n)
    srcs = np.concatenate([s, s, s, (s + lcf) % n])
    tgts = np.concatenate([(s - 1) % n, (s + 1) % n, (s + lcf) % n, s])
    return Graph.from_edges(n, n, srcs, tgts)


def main():
    args = Args()
    args.process_input()
    levi = np.array([-13, -9, 7, -7, 9, 13] * 5)
    dodec = np.array([10, 7, 4, -4, -7, 10, -4, 7, -7, 4] * 2)
    trunc_oct = np.array([3, -7, 7, -3] * 6)
    for name, code in [("Levi", levi), ("dodecahedral", dodec),
                       ("truncated octahedral", trunc_oct)]:
        G = lcf_graph(code)
        deg = np.diff(G.rowptr)
        assert (deg == 3).all(), f"{name}: not 3-regular: {deg}"
        # symmetric adjacency
        S = G.to_sparse().to_scipy()
        assert (S != S.T).nnz == 0
        fig = spy(G.to_sparse(), title=f"{name} graph")
        output(f"{name} graph: {G.num_sources} vertices, "
               f"{G.num_edges // 2} undirected edges, 3-regular"
               + ("" if fig is None else " (spy rendered)"))


if __name__ == "__main__":
    main()
