"""k-clique counting — kClist-style DAG recursion, TPU-native.

Role of the reference's two k-clique components:
  * set-based recursive count (gms/algorithms/set_based/k_clique_count/
    k_clique_count_set_based.h:5-28): recursive neighborhood intersection
    with |isect| >= k-2 pruning;
  * non-set-based kClist (gms/algorithms/non_set_based/k_clique_list/
    kernels/kclisting.h:18-190, parallelizationStrategy/parallelize.h:38-121):
    degeneracy-DAG orientation, per-root induced subgraph, recursive listing.

TPU-first re-design (not a translation): the recursion becomes breadth-wise
level expansion over *flat item buffers*.

  1. Orient by (approximate) degeneracy rank -> DAG whose max out-degree is
     bounded by the core number; pad to W lanes.
  2. Per root chunk, build LOCAL adjacency bitmaps on device:
     adj[b, i, :] = bitset over local indices j with DAG edge nbr_i -> nbr_j
     (the role of SubGraphBuilder, SubGraphBuilder.h:24-60 — but one batched
     searchsorted+bitpack, not per-thread scratch arrays).
  3. An item = a partial clique = (root-chunk index, candidate bitset S).
     One expansion step maps every item to its children {S & adj[i] : i in S}
     — a lax.scan over local index i of word-AND + popcount + prefix-sum
     compaction into a fresh item buffer (count-then-emit: capacity is the
     exact un-pruned child total, read back once per level).
  4. After k-2 expansions, count += sum(popcount(S)) — exact int64.

A clique is counted exactly once: children are DAG-successors, so each clique
is generated along its unique topological order (no /k! correction, mirroring
kClist's orientation argument).

Pruning matches the reference: a child survives only if |S'| is still large
enough to complete a k-clique (k_clique_count_set_based.h:10 `>= k-2`).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from gms_tpu.graphs.csr import CSRGraph
from gms_tpu.graphs.tiles import PaddedGraph, SENTINEL, round_up
from gms_tpu.preprocessing import degeneracy, orient

DEFAULT_ROOT_CHUNK = 1024


def _bucket(n: int) -> int:
    """Round item capacity up to a power of two (limits recompilation)."""
    return 1 << max(8, int(np.ceil(np.log2(max(n, 1)))))


# ---------------------------------------------------------------------------
# device kernels
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("w_words",))
def build_local_adj(nbr, roots, *, w_words: int):
    """Per-root local DAG adjacency bitmaps + initial candidate bitsets.

    nbr:   int32[V_pad, D] oriented padded adjacency (rows sorted asc)
    roots: int32[C] root vertex ids (may contain padding ids; their rows
           must be empty/SENTINEL so S0 comes out 0). Caller contract:
           every root's out-degree fits in 32*w_words local slots.

    Returns (adj uint32[C, W, w_words], S0 uint32[C, w_words]) where bit j
    of adj[b, i] says nbr[roots[b], j] ∈ N(nbr[roots[b], i]) — W = 32*w_words.

    Built as a lax.scan over the local index i so peak memory is one
    [C, D] neighbor-row gather per step (never [C, W, D]), which keeps the
    build feasible when neighbors are hubs with huge rows.
    """
    W = 32 * w_words
    r_nbr_full = jnp.take(nbr, roots, axis=0, mode="clip")     # [C, D]
    r_nbr = jax.lax.slice_in_dim(r_nbr_full, 0, min(W, r_nbr_full.shape[1]),
                                 axis=1)
    if r_nbr.shape[1] < W:
        r_nbr = jnp.concatenate(
            [r_nbr, jnp.full((r_nbr.shape[0], W - r_nbr.shape[1]), SENTINEL,
                             jnp.int32)], axis=1)
    valid = r_nbr != SENTINEL                                  # [C, W]
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    C = r_nbr.shape[0]

    def member_row(row, queries):
        idx = jnp.minimum(jnp.searchsorted(row, queries), row.shape[0] - 1)
        return row[idx] == queries

    def step(_, i):
        rows_i = jnp.take(nbr, r_nbr[:, i], axis=0, mode="clip")  # [C, D]
        m = jax.vmap(member_row)(rows_i, r_nbr)                   # [C, W]
        m = m & valid & valid[:, i][:, None]
        packed = jnp.sum(
            m.reshape(C, w_words, 32).astype(jnp.uint32) * weights,
            axis=2, dtype=jnp.uint32)                              # [C, WW]
        return None, packed

    _, adj_cols = jax.lax.scan(step, None, jnp.arange(W, dtype=jnp.int32))
    adj = jnp.transpose(adj_cols, (1, 0, 2))                   # [C, W, WW]
    S0 = jnp.sum(
        valid.reshape(C, w_words, 32).astype(jnp.uint32) * weights,
        axis=2, dtype=jnp.uint32,
    )
    return adj, S0


@functools.partial(jax.jit, static_argnames=("cap", "need"))
def expand_level(S, root_idx, adj, *, cap: int, need: int):
    """One breadth-wise expansion of all items.

    S:        uint32[N, WW] candidate bitsets (zero rows emit nothing)
    root_idx: int32[N] index into `adj`'s first axis
    adj:      uint32[C, W, WW]
    cap:      output capacity (must be >= true child count; caller passes the
              exact un-pruned total)
    need:     child survives iff popcount(child) >= need

    Returns (S_out uint32[cap, WW], root_out int32[cap], n_children int64,
    child_pc_sum int64 — Σ popcount over emitted children, i.e. the final
    count when the children are the last level). Unfilled slots are zero
    bitsets (inert in later levels).

    Implementation is fully dense: materialize the [N, W] child tensor in
    one broadcast AND, then compact surviving children with a single
    stable argsort (valid-first keys) + gather — no sequential scatter
    loop, which is the op TPUs are worst at.
    """
    N, WW = S.shape
    W = adj.shape[1]

    rows = jnp.take(adj, jnp.maximum(root_idx, 0), axis=0)      # [N, W, WW]
    child = S[:, None, :] & rows                                # [N, W, WW]
    # bit i of S: does item expand along local vertex i?
    widx = jax.lax.broadcasted_iota(jnp.int32, (W,), 0)
    words = jnp.take(S, widx >> 5, axis=1)                      # [N, W]
    has = ((words >> (widx & 31).astype(jnp.uint32)[None, :]) & 1) == 1
    pc = jnp.sum(jax.lax.population_count(child), axis=2, dtype=jnp.int32)
    ok = has & (pc >= need)                                     # [N, W]
    pcs = jnp.sum(jnp.where(ok, pc, 0), dtype=jnp.int64)
    n_children = jnp.sum(ok, dtype=jnp.int64)

    flat_ok = ok.reshape(N * W)
    idx = jnp.arange(N * W, dtype=jnp.int32)
    key = jnp.where(flat_ok, idx, idx + N * W)                  # valid first
    order = jnp.argsort(key)[:cap]
    sel_ok = jnp.take(flat_ok, order)
    S_out = jnp.where(sel_ok[:, None],
                      jnp.take(child.reshape(N * W, WW), order, axis=0),
                      jnp.uint32(0))
    R_flat = jnp.broadcast_to(root_idx[:, None], (N, W)).reshape(N * W)
    R_out = jnp.where(sel_ok, jnp.take(R_flat, order), 0)
    return S_out, R_out, n_children, pcs


@jax.jit
def total_popcount(S):
    return jnp.sum(jax.lax.population_count(S), dtype=jnp.int64)


# ---------------------------------------------------------------------------
# host orchestration
# ---------------------------------------------------------------------------

def kclique_count(
    g: CSRGraph,
    k: int,
    *,
    rank: np.ndarray | None = None,
    root_chunk: int = DEFAULT_ROOT_CHUNK,
) -> int:
    """Exact number of k-cliques in the undirected graph g.

    Equivalent output to kClist node-parallel counting
    (k_clique_list_danisch_node_parallel.cc); each clique counted once.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if k == 1:
        return g.num_nodes
    if k == 2:
        return g.num_edges_undirected
    if rank is None:
        rank, _ = degeneracy.degeneracy_ordering_rank(g)
    dag = orient.orient(g, rank)
    pg = PaddedGraph.from_csr(dag, lane=32)
    W = pg.d_pad
    WW = W // 32

    deg = np.asarray(dag.degrees)
    roots = np.nonzero(deg >= k - 1)[0].astype(np.int32)
    if len(roots) == 0:
        return 0

    nbr = pg.nbr
    total = 0
    pad_id = np.int32(pg.v_pad)  # clip-gathers to the last (all-SENTINEL) row
    # Item-buffer discipline: fixed slice size and fixed output capacity
    # (slice * W is the worst-case un-pruned fanout), so expand_level
    # compiles exactly once per recursion level — and expanding a slice
    # can never overflow. LIFO slicing bounds peak item memory: the TPU
    # analog of kClist's per-thread DFS bounding its working set
    # (breadth for vectorization, depth for memory).
    slice_items = max(256, _bucket((1 << 21) // max(W, 1)) // 2)
    cap = slice_items * W
    for start in range(0, len(roots), root_chunk):
        chunk = roots[start : start + root_chunk]
        C = len(chunk)
        if C < root_chunk:
            chunk = np.concatenate(
                [chunk, np.full(root_chunk - C, pad_id, dtype=np.int32)]
            )
        adj, S0 = build_local_adj(nbr, jnp.asarray(chunk), w_words=WW)
        if k == 3:
            # one expansion with need=1 yields the count directly
            _s, _r, _n, pcs = expand_level(
                S0, jnp.arange(root_chunk, dtype=jnp.int32), adj,
                cap=root_chunk * W, need=1)
            total += int(pcs)
            continue
        stack = [(k - 1, S0, jnp.arange(root_chunk, dtype=jnp.int32))]
        while stack:
            remaining, S, R = stack.pop()
            if S.shape[0] > slice_items:
                # LIFO slicing keeps peak item memory bounded
                for s0 in range(0, S.shape[0], slice_items):
                    stack.append((remaining, S[s0 : s0 + slice_items],
                                  R[s0 : s0 + slice_items]))
                continue
            if S.shape[0] < slice_items and S.shape[0] != root_chunk:
                pad = slice_items - S.shape[0]
                S = jnp.concatenate([S, jnp.zeros((pad, WW), jnp.uint32)])
                R = jnp.concatenate([R, jnp.zeros((pad,), jnp.int32)])
            S2, R2, n2, pcs = expand_level(
                S, R, adj, cap=S.shape[0] * W, need=remaining - 1
            )
            if remaining == 2:
                # children are the last level; their popcounts ARE the count
                total += int(pcs)
                continue
            n2 = int(n2)
            if n2 == 0:
                continue
            # trim to the bucketed live prefix (slots beyond n2 are zero)
            keep = min(_bucket(n2), S2.shape[0])
            stack.append((remaining - 1, S2[:keep], R2[:keep]))
    return total


# ---------------------------------------------------------------------------
# independent host oracle (role of verification/kclisting_original.h)
# ---------------------------------------------------------------------------

def kclique_count_oracle(g: CSRGraph, k: int) -> int:
    """Serial numpy DFS over the degeneracy DAG — independent recount."""
    if k == 1:
        return g.num_nodes
    if k == 2:
        return g.num_edges_undirected
    rank, _ = degeneracy.degeneracy_ordering_rank(g)
    dag = orient.orient(g, rank)
    adj = [dag.out_neigh(v) for v in range(dag.num_nodes)]

    def rec(cands: np.ndarray, depth: int) -> int:
        if depth == k - 1:
            return len(cands)
        total = 0
        for v in cands:
            nxt = np.intersect1d(cands, adj[int(v)], assume_unique=True)
            if len(nxt) >= k - depth - 2:
                total += rec(nxt, depth + 1)
        return total

    return sum(rec(adj[v], 1) for v in range(dag.num_nodes) if len(adj[v]) >= k - 1)
