"""Vertex relabeling strategies for compression / locality.

Role of gms/representations/graphs/permuters/ (permuters.h:25-44
PermuterVariant): degree-based orderings plus 12 CPLEX ILP/LP "optimal gap"
variants. The degree orderings are implemented exactly; the CPLEX family
(an optional dependency even in the reference — cmake/FindCPLEX.cmake) is
covered by three non-ILP gap minimizers over the same objective (mean
log2 neighbor-id gap, `average_gap_bits`): `gap_bfs` (BFS locality),
`rcm` (reverse Cuthill–McKee), and `gap_barycenter` (iterative barycenter
local search keeping the best measured sweep). Permutations compose with
the k-bit/varint coders in compressed.py, whose footprint the gap
structure determines.
"""

from __future__ import annotations

import numpy as np

from gms_tpu.graphs.csr import CSRGraph

VARIANTS = (
    "identity", "random",
    "degree_asc", "degree_desc",
    "in_degree_asc", "in_degree_desc",
    "out_degree_asc", "out_degree_desc",
    "gap_bfs", "rcm", "gap_barycenter",
)


def permutation_map(g: CSRGraph, variant: str, *, seed: int = 0) -> np.ndarray:
    """new_id[v] for the given variant (Permuter::permutation_map role)."""
    n = g.num_nodes
    deg = g.degrees
    if variant == "identity":
        return np.arange(n, dtype=np.int32)
    if variant == "random":
        return np.random.default_rng(seed).permutation(n).astype(np.int32)
    if variant in ("degree_asc", "in_degree_asc", "out_degree_asc"):
        order = np.lexsort((np.arange(n), deg))
    elif variant in ("degree_desc", "in_degree_desc", "out_degree_desc"):
        order = np.lexsort((np.arange(n), -deg))
    elif variant == "gap_bfs":
        order = _bfs_order(g)
    elif variant == "rcm":
        order = _rcm_order(g)
    elif variant == "gap_barycenter":
        order = _barycenter_order(g)
    else:
        raise ValueError(f"unknown permuter variant {variant!r}")
    new_id = np.empty(n, dtype=np.int32)
    new_id[order] = np.arange(n, dtype=np.int32)
    return new_id


def apply_permutation(g: CSRGraph, variant: str, *, seed: int = 0) -> CSRGraph:
    return g.relabel(permutation_map(g, variant, seed=seed))


def _bfs_order(g: CSRGraph) -> np.ndarray:
    """BFS visit order from the max-degree vertex per component: neighbors
    get adjacent ids, shrinking the delta gaps the varint/k-bit coders pay
    for (the objective of the reference's CPLEX gap orderings)."""
    n = g.num_nodes
    seen = np.zeros(n, dtype=bool)
    order = np.empty(n, dtype=np.int64)
    pos = 0
    by_deg = np.argsort(-g.degrees, kind="stable")
    from collections import deque

    for root in by_deg:
        if seen[root]:
            continue
        q = deque([int(root)])
        seen[root] = True
        while q:
            v = q.popleft()
            order[pos] = v
            pos += 1
            for w in g.out_neigh(v):
                if not seen[w]:
                    seen[w] = True
                    q.append(int(w))
    return order


def _rcm_order(g: CSRGraph) -> np.ndarray:
    """Reverse Cuthill–McKee: BFS from a low-degree peripheral vertex with
    degree-sorted neighbor expansion, order reversed. The classic non-ILP
    member of the reference's gap-minimizing family (permuters.h:25-44) —
    clusters each neighborhood's labels, shrinking coder gaps."""
    n = g.num_nodes
    seen = np.zeros(n, dtype=bool)
    order = np.empty(n, dtype=np.int64)
    pos = 0
    deg = g.degrees
    from collections import deque

    for root in np.argsort(deg, kind="stable"):  # min-degree roots
        if seen[root]:
            continue
        q = deque([int(root)])
        seen[root] = True
        while q:
            v = q.popleft()
            order[pos] = v
            pos += 1
            nbrs = g.out_neigh(v)
            nbrs = nbrs[~seen[nbrs]]
            for w in nbrs[np.argsort(deg[nbrs], kind="stable")]:
                seen[w] = True
                q.append(int(w))
    return order[::-1].copy()


def _barycenter_order(g: CSRGraph, *, sweeps: int = 10) -> np.ndarray:
    """Iterative barycenter local search: each sweep re-ranks every vertex by
    the mean position of its neighbors. The practical stand-in for the
    reference's 12 CPLEX ILP/LP 'optimal gap' orderings (an optional solver
    dependency there — FindCPLEX.cmake): same objective (small neighbor-id
    gaps), hill-climbed instead of solved exactly. Seeded from gap_bfs;
    keeps the best sweep by measured average_gap_bits."""
    n = g.num_nodes
    order = _bfs_order(g)
    pos = np.empty(n, dtype=np.float64)
    best_order = order.copy()
    best = _gap_bits_for_order(g, order)
    for _ in range(sweeps):
        pos[order] = np.arange(n)
        bary = np.zeros(n, dtype=np.float64)
        for v in range(n):
            row = g.out_neigh(v)
            bary[v] = pos[row].mean() if len(row) else pos[v]
        order = np.argsort(bary, kind="stable")
        cur = _gap_bits_for_order(g, order)
        if cur < best:
            best, best_order = cur, order.copy()
    return best_order


def _gap_bits_for_order(g: CSRGraph, order: np.ndarray) -> float:
    new_id = np.empty(g.num_nodes, dtype=np.int64)
    new_id[order] = np.arange(g.num_nodes)
    total, count = 0.0, 0
    for v in range(g.num_nodes):
        row = np.sort(new_id[g.out_neigh(v)])
        if len(row) == 0:
            continue
        gaps = np.diff(np.concatenate([[-1], row]))
        total += float(np.log2(np.maximum(gaps, 1) + 1).sum())
        count += len(row)
    return total / max(count, 1)


def average_gap_bits(g: CSRGraph) -> float:
    """Mean log2 neighbor-gap — the coder-footprint figure of merit."""
    total, count = 0.0, 0
    for v in range(g.num_nodes):
        row = g.out_neigh(v).astype(np.int64)
        if len(row) == 0:
            continue
        gaps = np.diff(np.concatenate([[row[0]], row]))
        gaps[0] = row[0] + 1
        total += float(np.log2(np.maximum(gaps, 1) + 1).sum())
        count += len(row)
    return total / max(count, 1)
