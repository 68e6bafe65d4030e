"""Fill-reducing orderings (reference ``src/lapack_like/factor/LDL/sparse/
symbolic/NestedDissection.cpp`` — recursive graph bisection with AMD leaves
(``:17-56``, SuiteSparse ``El_amd_order``), plus ``NaturalNestedDissection``
for analytic grids).

Host-side symbolic work (SURVEY §7 'hard parts': keep it off the hot path,
cache the plans).  A native C++ minimum-degree kernel is provided in
``elemental_tpu/native`` and used when built; the NumPy implementation below
is the portable fallback.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..sparse.csr import Graph, SparseMatrix


def _adjacency(A) -> List[np.ndarray]:
    """Symmetrized adjacency lists without self-loops."""
    if isinstance(A, SparseMatrix):
        g = A.graph()
    else:
        g = A
    g = g.symmetrize()
    n = g.num_sources
    adj = []
    for i in range(n):
        nb = g.neighbors(i)
        adj.append(nb[nb != i])
    return adj


def minimum_degree(A, dense_cutoff: Optional[int] = None) -> np.ndarray:
    """(Approximate) minimum-degree ordering: eliminate the node of least
    degree, connect its neighbours into a clique (the SuiteSparse AMD slot;
    quotient-graph AMD in native C++ when available)."""
    from . import native as _native
    adj = _adjacency(A)
    n = len(adj)
    if _native.available():
        return _native.minimum_degree(adj)
    neigh = [set(a.tolist()) for a in adj]
    alive = np.ones(n, bool)
    degs = np.array([len(s) for s in neigh], dtype=np.int64)
    perm = np.empty(n, np.int64)
    for k in range(n):
        cand = np.nonzero(alive)[0]
        v = cand[np.argmin(degs[cand])]
        perm[k] = v
        alive[v] = False
        nbrs = [u for u in neigh[v] if alive[u]]
        for u in nbrs:
            s = neigh[u]
            s.discard(v)
            for w in nbrs:
                if w != u:
                    s.add(w)
            degs[u] = len(s)
        neigh[v] = set()
    return perm


def _pseudo_peripheral(adj: List[np.ndarray], nodes: np.ndarray) -> int:
    """BFS-based pseudo-peripheral node within the ``nodes`` subgraph."""
    inset = np.zeros(len(adj), bool)
    inset[nodes] = True
    start = int(nodes[0])
    for _ in range(3):
        # BFS from start
        dist = {start: 0}
        frontier = [start]
        last = start
        while frontier:
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if inset[v] and v not in dist:
                        dist[v] = dist[u] + 1
                        nxt.append(int(v))
            if nxt:
                last = nxt[-1]
            frontier = nxt
        if last == start:
            break
        start = last
    return start


def bisect(adj: List[np.ndarray], nodes: np.ndarray
           ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Split a subgraph into (left, right, separator) by BFS level sets from
    a pseudo-peripheral node (the reference's graph-bisection step)."""
    inset = np.zeros(len(adj), bool)
    inset[nodes] = True
    src = _pseudo_peripheral(adj, nodes)
    # level sets
    level = {src: 0}
    frontier = [src]
    order = [src]
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if inset[v] and v not in level:
                    level[v] = level[u] + 1
                    nxt.append(int(v))
                    order.append(int(v))
        frontier = nxt
    # disconnected remainder: put in left half
    unreached = [int(v) for v in nodes if int(v) not in level]
    half = (len(order) + len(unreached)) // 2
    left = order[:half]
    # separator = boundary of left inside right
    leftset = set(left)
    right = [v for v in order[half:]]
    sep = []
    keep_right = []
    for v in right:
        if any((u in leftset) for u in adj[v] if inset[u]):
            sep.append(v)
        else:
            keep_right.append(v)
    left.extend(unreached)
    return (np.array(left, np.int64), np.array(keep_right, np.int64),
            np.array(sep, np.int64))


def nested_dissection(A, cutoff: int = 64) -> np.ndarray:
    """Recursive nested dissection (reference ``NestedDissection.cpp:79``):
    bisect until subgraphs are below ``cutoff``, order leaves by minimum
    degree, separators last.  Returns a permutation (new ← old)."""
    adj = _adjacency(A)
    n = len(adj)
    perm_out: List[int] = []

    def sub_md(nodes: np.ndarray) -> List[int]:
        if len(nodes) <= 1:
            return [int(v) for v in nodes]
        # restrict to the subgraph and run minimum degree
        loc = {int(v): i for i, v in enumerate(nodes)}
        sub = [np.array([loc[int(u)] for u in adj[int(v)]
                         if int(u) in loc], np.int64) for v in nodes]
        sub_adj_graph = Graph.from_edges(
            len(nodes), len(nodes),
            np.concatenate([np.full(len(s), i) for i, s in enumerate(sub)])
            if any(len(s) for s in sub) else np.array([], np.int64),
            np.concatenate(sub) if any(len(s) for s in sub)
            else np.array([], np.int64))
        p = minimum_degree(sub_adj_graph)
        return [int(nodes[i]) for i in p]

    def recurse(nodes: np.ndarray) -> List[int]:
        if len(nodes) <= cutoff:
            return sub_md(nodes)
        left, right, sep = bisect(adj, nodes)
        if len(sep) == 0 or len(left) == 0 or len(right) == 0:
            return sub_md(nodes)
        return recurse(left) + recurse(right) + [int(v) for v in sep]

    perm_out = recurse(np.arange(n))
    return np.asarray(perm_out, np.int64)


def natural_nested_dissection(dims: Tuple[int, ...],
                              cutoff: int = 8) -> np.ndarray:
    """Analytic nested dissection for regular grids (reference
    ``NaturalNestedDissection.cpp``): recursively split the longest axis at a
    separator plane."""
    idx = np.arange(int(np.prod(dims))).reshape(dims)

    def recurse(block: np.ndarray) -> List[int]:
        if block.size <= cutoff:
            return block.ravel().tolist()
        ax = int(np.argmax(block.shape))
        if block.shape[ax] < 3:
            return block.ravel().tolist()
        mid = block.shape[ax] // 2
        sl_l = [slice(None)] * block.ndim
        sl_s = [slice(None)] * block.ndim
        sl_r = [slice(None)] * block.ndim
        sl_l[ax] = slice(0, mid)
        sl_s[ax] = slice(mid, mid + 1)
        sl_r[ax] = slice(mid + 1, None)
        return (recurse(block[tuple(sl_l)]) + recurse(block[tuple(sl_r)])
                + block[tuple(sl_s)].ravel().tolist())

    return np.asarray(recurse(idx), np.int64)


def _sym_pattern_csr(A) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetrized CSR pattern, no self loops (native-kernel input form)."""
    import scipy.sparse as sp
    if isinstance(A, SparseMatrix):
        s = A.to_scipy()
    else:  # Graph
        s = A.to_sparse().to_scipy()
    s = s.tocsr()
    pat = sp.csr_matrix(
        (np.ones(s.nnz, np.int8), s.indices, s.indptr), shape=s.shape)
    pat = (pat + pat.T).tocsr()
    pat.setdiag(0)
    pat.eliminate_zeros()
    return pat.indptr.astype(np.int64), pat.indices.astype(np.int64)


def reverse_cuthill_mckee(A) -> np.ndarray:
    """RCM band-reducing ordering (bandwidth → DIA-kernel friendliness).
    Uses the native C++ kernel (``native/symbolic.cpp: el_rcm``) when built;
    NumPy BFS fallback below."""
    from . import native
    if native.has_rcm():
        rowptr, colind = _sym_pattern_csr(A)
        return native.rcm(rowptr, colind)
    adj = _adjacency(A)
    n = len(adj)
    visited = np.zeros(n, bool)
    order: List[int] = []
    degs = np.array([len(a) for a in adj])
    while len(order) < n:
        remaining = np.nonzero(~visited)[0]
        start = int(remaining[np.argmin(degs[remaining])])
        queue = [start]
        visited[start] = True
        while queue:
            u = queue.pop(0)
            order.append(u)
            nbrs = sorted((int(v) for v in adj[u] if not visited[v]),
                          key=lambda v: degs[v])
            for v in nbrs:
                visited[v] = True
            queue.extend(nbrs)
    return np.asarray(order[::-1], np.int64)
