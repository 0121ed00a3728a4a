"""Subgraph isomorphism — VF2-equivalent batched backtracking, TPU-native.

Role of gms/algorithms/non_set_based/subgraphiso/ (842 LoC):
  * State / candidate-pair generation / feasibility rules
    (vf2/util/vf2State.hpp:17-80, candidateGeneration.hpp,
    feasibilityRules.hpp);
  * sequential solver returning the FIRST found mapping
    (vf2/sequential/vf2.hpp:40-83);
  * parallel solver: OpenMP tasks + taskgroup cancellation
    (vf2/parallel/vf2.hpp:40-106);
  * verification by mapped-edge-set comparison — induced: equality,
    else pattern ⊆ target (util/subgraphiso_verification.hpp:11-60).

TPU-first re-design: the DFS with per-task state copies becomes breadth-wise
expansion of a flat buffer of partial mappings.

  item = int32[P] — target ids for pattern positions 0..d-1 in a static
  connected search order (max-degree start, then most-placed-neighbors).

Level step d: candidates = neighbor row of the anchor parent (first mapped
pattern-neighbor) gathered per item; feasibility is a batched mask —
distinctness, adjacency to every mapped pattern-neighbor (searchsorted
membership), non-adjacency for induced mode, and the degree lookahead
deg(c) >= deg_P(d) — then prefix-sum compaction (count-then-emit).
Root-candidate chunks run sequentially so `limit` can stop early, the role
of the reference's taskgroup cancellation.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from gms_tpu.graphs.csr import CSRGraph
from gms_tpu.graphs.tiles import PaddedGraph, SENTINEL
from gms_tpu.algorithms.k_clique import _bucket

# head-to-head pattern set shared by scripts/measure_reference.py (which
# writes them as .el files for the reference binary's --param pattern-file
# grammar) and bench.py's vf2 extra metric — keep the two sides identical
VF2_PATTERNS = {
    "k4": ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)),
    "p4": ((0, 1), (1, 2), (2, 3)),
    "c5": ((0, 1), (1, 2), (2, 3), (3, 4), (4, 0)),
}


def _search_order(pattern: CSRGraph):
    """Connected search order + per-position (parents, nonparents)."""
    P = pattern.num_nodes
    deg = pattern.degrees
    placed: list[int] = []
    remaining = set(range(P))
    adj = [set(pattern.out_neigh(v).tolist()) for v in range(P)]
    while remaining:
        if not placed:
            nxt = max(remaining, key=lambda v: (deg[v], -v))
        else:
            nxt = max(
                remaining,
                key=lambda v: (sum(1 for u in placed if u in adj[v]), deg[v], -v),
            )
        placed.append(nxt)
        remaining.discard(nxt)
    pos_of = {v: i for i, v in enumerate(placed)}
    parents, nonparents = [], []
    for i, v in enumerate(placed):
        ps = tuple(sorted(pos_of[u] for u in adj[v] if pos_of[u] < i))
        nps = tuple(j for j in range(i) if j not in ps)
        parents.append(ps)
        nonparents.append(nps)
    return placed, parents, nonparents


@functools.partial(
    jax.jit, static_argnames=("d", "parents", "nonparents", "induced")
)
def _feasible(M, cand, nbr, deg1, bmp, pdeg_d, *, d: int, parents: tuple,
              nonparents: tuple, induced: bool):
    """bool[N, Dc]: candidate c extends mapping M at position d.

    pdeg_d is a TRACED scalar (one compile per level, not per degree value).
    bmp: uint32[V, vw] id-space bitmap adjacency, or a [1, 1] dummy —
    when real, every membership test is ONE word probe instead of a
    log(D)-pass binary search over the padded row (13 gather passes over
    [N, Dc] at scale 14 — the r05 VF2 head-to-head profile)."""
    ok = cand != SENTINEL
    ok &= M[:, 0][:, None] >= 0  # dead (padding) rows emit nothing
    ok &= jnp.take(deg1, cand, mode="clip") >= pdeg_d
    for j in range(d):
        ok &= cand != M[:, j][:, None]
    use_bmp = bmp.shape[0] > 1
    if use_bmp:
        V, vw = bmp.shape
        flat = bmp.reshape(-1)

        def vm(rows_idx, queries):
            q = jnp.clip(queries, 0, 32 * vw - 1)
            r = jnp.clip(rows_idx, 0, V - 1)
            w = jnp.take(flat, r[:, None] * vw + (q >> 5))
            return ((w >> (q & 31).astype(jnp.uint32)) & 1) == 1

        for p in parents:
            ok &= vm(M[:, p], cand)
        if induced:
            for p in nonparents:
                ok &= ~vm(M[:, p], cand)
        return ok

    def member(rows, queries):
        idx = jnp.minimum(jnp.searchsorted(rows, queries), rows.shape[0] - 1)
        return rows[idx] == queries
    vm2 = jax.vmap(member)
    for p in parents:
        rows = jnp.take(nbr, M[:, p], axis=0, mode="clip")
        ok &= vm2(rows, cand)
    if induced:
        for p in nonparents:
            rows = jnp.take(nbr, M[:, p], axis=0, mode="clip")
            ok &= ~vm2(rows, cand)
    return ok


@functools.partial(jax.jit, static_argnames=("d", "cap"))
def _emit(M, cand, ok, *, d: int, cap: int):
    """Compact children M' (position d := cand) into a cap-sized buffer.

    One variadic bitonic sort (key + the P child columns as payloads)
    replaces the [N*Dc, P]-row gather + scatter — row-granular DMA on
    ~300k 16-byte rows was most of a level's cost (the bron_kerbosch.py
    r05 compaction lesson); the sort moves rows through vector
    registers. Valid children land first in key order; the cap-slice is
    taken after the sort."""
    N, P = M.shape
    Dc = cand.shape[1]
    ND = N * Dc
    flat_ok = ok.reshape(ND)                      # item-major (n, c)
    n_out = jnp.sum(flat_ok, dtype=jnp.int32)
    iota = jnp.arange(ND, dtype=jnp.int32)
    key = jnp.where(flat_ok, iota, ND + iota)
    cols = [jnp.broadcast_to(M[:, j][:, None], (N, Dc)).reshape(ND)
            if j != d else cand.reshape(ND) for j in range(P)]
    sorted_ops = jax.lax.sort((key, *cols), num_keys=1)
    comp = jnp.stack(sorted_ops[1:], axis=1)      # [ND, P], valid first
    live = (jnp.arange(ND, dtype=jnp.int32) < n_out)[:, None]
    comp = jnp.where(live, comp, -1)
    M_out = jax.lax.slice_in_dim(comp, 0, min(cap, ND), axis=0)
    if cap > ND:
        M_out = jnp.concatenate(
            [M_out, jnp.full((cap - ND, P), -1, jnp.int32)], axis=0)
    return M_out, n_out.astype(jnp.int64)


def _host_find_first(g: CSRGraph, order, parents, nonparents, pdeg, *,
                     induced: bool, budget: int):
    """Budgeted host DFS find-first. The reference regime for TRIVIAL
    instances: a match reachable within a few thousand feasibility checks
    finishes in ~ms on the CPU, while a single remote-chip dispatch costs
    ~20ms (r05 head-to-head: reference K4 0.028s vs 3.5s device — pure
    dispatch latency). Returns (mapping int32[P] in position space | None,
    budget_exhausted). budget_exhausted=True means the instance actually
    backtracks — hand it to the device search, which wins 41-53x there."""
    indptr = g.indptr
    indices = g.indices
    deg = g.degrees
    P = len(order)

    def row(v):
        return indices[indptr[v]:indptr[v + 1]]

    def is_nbr(a, c):
        r = row(a)
        i = np.searchsorted(r, c)
        return i < len(r) and r[i] == c

    mapping = np.full(P, -1, np.int64)
    cand_lists: list = [np.nonzero(deg >= pdeg[0])[0]] + [None] * (P - 1)
    pos = [0] * P
    steps = 0
    d = 0
    while d >= 0:
        lst = cand_lists[d]
        advanced = False
        while pos[d] < len(lst):
            c = int(lst[pos[d]])
            pos[d] += 1
            steps += 1
            if steps > budget:
                return None, True
            if deg[c] < pdeg[d]:
                continue
            if (mapping[:d] == c).any():
                continue
            if not all(is_nbr(int(mapping[p]), c) for p in parents[d]):
                continue
            if induced and any(is_nbr(int(mapping[p]), c)
                               for p in nonparents[d]):
                continue
            mapping[d] = c
            if d == P - 1:
                return mapping.astype(np.int32), False
            d += 1
            cand_lists[d] = (row(int(mapping[parents[d][0]]))
                             if parents[d]
                             else np.arange(g.num_nodes, dtype=np.int64))
            pos[d] = 0
            advanced = True
            break
        if not advanced:
            mapping[d] = -1
            d -= 1
    return None, False  # search space exhausted: no mapping exists


def subgraph_isomorphism(
    g: CSRGraph,
    pattern: CSRGraph,
    *,
    induced: bool = False,
    limit: int | None = 1,
    root_chunk: int = 4096,
    item_budget: int = 1 << 18,
    host_budget: int = 200_000,
) -> np.ndarray:
    """Find mappings of `pattern` into `g`.

    Returns int32[k, P]: row r maps pattern vertex j -> result[r, j].
    limit=1 reproduces the reference's find-first semantics
    (vf2.hpp:53-83); limit=None enumerates all (a superset capability).

    Memory is bounded: the frontier of partial mappings is processed as a
    LIFO stack of slices (the k_clique work-stack discipline, replacing the
    reference's per-task state copies in vf2/parallel/vf2.hpp:40-106) —
    any level's expansion buffer holds at most ~item_budget children, and
    depth-first slice order makes limit=1 stop early without expanding the
    whole breadth frontier.
    """
    P = pattern.num_nodes
    if P == 0 or g.num_nodes < P:
        return np.zeros((0, P), np.int32)
    order, parents, nonparents = _search_order(pattern)
    pdeg = pattern.degrees[order]
    col_order0 = np.asarray(order)
    if limit == 1 and host_budget > 0:
        # hybrid dispatch: trivial instances resolve on the host in ~ms
        # (a single device dispatch costs ~20ms through the tunnel);
        # instances that exhaust the budget genuinely backtrack and go to
        # the device search
        m, exhausted = _host_find_first(
            g, order, parents, nonparents, pdeg,
            induced=induced, budget=host_budget)
        if m is not None:
            out = np.empty((1, P), np.int32)
            out[0, col_order0] = m
            return out
        if not exhausted:
            return np.zeros((0, P), np.int32)
    pg = PaddedGraph.from_csr(g)
    deg1 = jnp.concatenate([pg.deg, jnp.zeros(1, jnp.int32)])
    nbr = pg.nbr
    col_order = np.asarray(order)
    # id-space bitmap adjacency for one-word membership probes, gated by
    # footprint (~V^2/8 bytes); beyond ~1GB _feasible falls back to the
    # binary-search path via a [1, 1] dummy
    vw = (g.num_nodes + 31) // 32
    if g.num_nodes * vw * 4 <= (1 << 30):
        bmp_np = np.zeros((max(g.num_nodes, 1), vw), np.uint32)
        uu = np.repeat(np.arange(g.num_nodes, dtype=np.int64),
                       g.degrees.astype(np.int64))
        vv = g.indices.astype(np.int64)
        np.bitwise_or.at(bmp_np, (uu, vv >> 5),
                         np.uint32(1) << (vv & 31).astype(np.uint32))
        bmp = jnp.asarray(bmp_np)
    else:
        bmp = jnp.zeros((1, 1), jnp.uint32)

    roots = np.nonzero(g.degrees >= pdeg[0])[0].astype(np.int32)
    found: list[np.ndarray] = []
    total = 0
    # LIFO stack of (partial-mapping slice, next level d); push root chunks
    # reversed so low root ids expand first (deterministic find-first order)
    stack: list[tuple] = []
    for start in reversed(range(0, len(roots), root_chunk)):
        chunk = roots[start : start + root_chunk]
        M0 = (jnp.full((len(chunk), P), -1, jnp.int32)
              .at[:, 0].set(jnp.asarray(chunk)))
        stack.append((M0, 1))

    while stack:
        M, d = stack.pop()
        if d == P:
            full = np.asarray(M)
            full = full[(full >= 0).all(axis=1)]
            if len(full):
                out = np.empty_like(full)
                out[:, col_order] = full  # positions -> pattern-vertex cols
                found.append(out)
                total += len(full)
                if limit is not None and total >= limit:
                    break
            continue
        # slice the input so this level's emit buffer stays <= ~item_budget
        Dc = nbr.shape[1] if parents[d] else max(256, nbr.shape[1])
        rows_max = _bucket(max(1, item_budget // max(Dc, 1)))
        if M.shape[0] > rows_max:
            for s0 in reversed(range(0, M.shape[0], rows_max)):
                stack.append((M[s0 : s0 + rows_max], d))
            continue
        if parents[d]:
            cand = jnp.take(nbr, M[:, parents[d][0]], axis=0, mode="clip")
            out = _level(M, cand, nbr, deg1, bmp, d, parents[d],
                         nonparents[d], int(pdeg[d]), induced)
            if out.shape[0]:
                stack.append((out, d + 1))
        else:
            # disconnected pattern: candidates = all vertices, blockwise
            V = g.num_nodes
            blk = max(256, nbr.shape[1])
            for b0 in reversed(range(0, V, blk)):
                ids = np.arange(b0, min(b0 + blk, V), dtype=np.int32)
                ids_pad = np.full(blk, np.int32(SENTINEL))
                ids_pad[: len(ids)] = ids
                cand = jnp.broadcast_to(jnp.asarray(ids_pad), (M.shape[0], blk))
                out = _level(M, cand, nbr, deg1, bmp, d, parents[d],
                             nonparents[d], int(pdeg[d]), induced)
                if out.shape[0]:
                    stack.append((out, d + 1))
    if not found:
        return np.zeros((0, P), np.int32)
    res = np.concatenate(found, axis=0)
    return res[:limit] if limit is not None else res


def _level(M, cand, nbr, deg1, bmp, d, parents, nonparents, pdeg_d,
           induced):
    ok = _feasible(M, cand, nbr, deg1, bmp, jnp.int32(pdeg_d), d=d,
                   parents=parents, nonparents=nonparents, induced=induced)
    nc = int(jnp.sum(ok, dtype=jnp.int64))
    if nc == 0:
        return jnp.zeros((0, M.shape[1]), jnp.int32)
    # keep the bucketed capacity (dead rows are -1-filled and inert) so
    # level shapes stay power-of-two and compilations are bounded
    M_out, _off = _emit(M, cand, ok, d=d, cap=_bucket(nc))
    return M_out


def verify_mapping(
    g: CSRGraph, pattern: CSRGraph, mapping: np.ndarray, *, induced: bool = False
) -> bool:
    """Edge-set check (subgraphiso_verification.hpp:11-60): induced ->
    mapped target edges == pattern edges; else pattern ⊆ target."""
    mapping = np.asarray(mapping)
    if len(set(mapping.tolist())) != len(mapping):
        return False
    tadj = [set(g.out_neigh(v).tolist()) for v in range(g.num_nodes)]
    for a in range(pattern.num_nodes):
        pa = set(pattern.out_neigh(a).tolist())
        for b in range(pattern.num_nodes):
            if a == b:
                continue
            has_p = b in pa
            has_t = int(mapping[b]) in tadj[int(mapping[a])]
            if has_p and not has_t:
                return False
            if induced and has_t and not has_p:
                return False
    return True


# ---------------------------------------------------------------------------
# host oracle: plain recursive backtracking (independent of the device path)
# ---------------------------------------------------------------------------

def subgraph_isomorphism_oracle(
    g: CSRGraph, pattern: CSRGraph, *, induced: bool = False
) -> list[tuple]:
    """All mappings pattern->g as tuples (target id per pattern vertex)."""
    P = pattern.num_nodes
    tadj = [set(g.out_neigh(v).tolist()) for v in range(g.num_nodes)]
    padj = [set(pattern.out_neigh(v).tolist()) for v in range(P)]
    out = []

    def rec(mapping: dict):
        if len(mapping) == P:
            out.append(tuple(mapping[j] for j in range(P)))
            return
        a = len(mapping)
        for c in range(g.num_nodes):
            if c in mapping.values():
                continue
            ok = True
            for b, t in mapping.items():
                has_p = b in padj[a]
                has_t = t in tadj[c]
                if has_p and not has_t:
                    ok = False
                    break
                if induced and has_t and not has_p:
                    ok = False
                    break
            if ok:
                mapping[a] = c
                rec(mapping)
                del mapping[a]

    rec({})
    return out
