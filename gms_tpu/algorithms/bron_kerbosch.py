r"""Maximal clique enumeration — Bron-Kerbosch, TPU-native.

Role of the reference's MCE family (gms/algorithms/set_based/
maximal_clique_enum/):
  * BkSimple (sequential/simple.h:13-61) — textbook no-pivot BK; here the
    host oracle `bron_kerbosch_simple`.
  * BkTomita pivoting (sequential/tomita.h:11-40: pivot = argmax
    |cand ∩ N(u)| over u ∈ cand ∪ fini).
  * BkEppstein / BkEppsteinPar (sequential/eppstein.h:13-40,
    parallel/eppsteinPAR.h:17-66): degeneracy-ordered roots, per-root
    cand/fini split (cand = higher-ranked neighbors, fini = lower-ranked).
  * per-root induced subgraphs (parallel/EppsteinSubGraph.h:122-167,
    sub_graph/roaring_sub_graph.h:13-132).

TPU-first re-design: the recursion tree is explored breadth-wise over flat
item buffers of fixed-shape bitmap tiles.

  item = (root-chunk index, R, cand, fini)  — three uint32[WW] bitsets over
  the root's LOCAL universe N(root) (max degree wide, tiered by root degree).

One device "level" step does, for every item at once:
  1. finished = (cand == ∅); maximal iff also fini == ∅ → count / emit (root,R);
  2. Tomita pivot: lax.scan argmax over local u ∈ cand ∪ fini of
     popcount(cand & adj[u]);
  3. ext = cand \ adj[pivot]; children emitted in local-index order i ∈ ext:
        R' = R ∪ {i},  cand' = (cand \ ext_{<i}) ∩ adj[i],
        fini' = (fini ∪ ext_{<i}) ∩ adj[i]
     compacted by prefix-sum into the next item buffer (count-then-emit).

Each maximal clique is produced exactly once: its lowest-ranked vertex is its
root (Eppstein argument), and within a root the Tomita recursion is
duplicate-free. Counts are exact int64.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from gms_tpu.graphs.csr import CSRGraph
from gms_tpu.graphs.tiles import PaddedGraph, SENTINEL
from gms_tpu.preprocessing import degeneracy
from gms_tpu.algorithms.k_clique import build_local_adj, total_popcount, _bucket

DEFAULT_ROOT_CHUNK = 256


def _word_masks_below(i, ww: int):
    """uint32[WW] mask of all bit positions < i."""
    w = jax.lax.broadcasted_iota(jnp.int32, (ww,), 0)
    full = jnp.where(w < (i >> 5), jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
    partial = jnp.where(
        w == (i >> 5),
        (jnp.uint32(1) << (i & 31).astype(jnp.uint32)) - 1,
        jnp.uint32(0),
    )
    return full | partial


@functools.partial(jax.jit, static_argnames=("cap", "emit"))
def bk_level(R, Cand, Fini, root_idx, adj, *, cap: int, emit: bool):
    """One breadth-wise BK step over all items.

    R/Cand/Fini: uint32[N, WW]; root_idx: int32[N]; adj: uint32[C, W, WW].
    Liveness is root_idx >= 0; dead/padded slots (root_idx == -1) are inert.

    Returns (n_maximal int64, out_roots, out_R, R', Cand', Fini', root', n_children).
    When emit=False, out_roots/out_R are zero-size placeholders.
    """
    N, WW = Cand.shape
    W = adj.shape[1]
    live = root_idx >= 0

    cand_empty = jnp.all(Cand == 0, axis=1)
    fini_empty = jnp.all(Fini == 0, axis=1)
    is_max = live & cand_empty & fini_empty
    n_maximal = jnp.sum(is_max, dtype=jnp.int64)

    if emit:
        pos = jnp.cumsum(is_max.astype(jnp.int64)) - 1
        dest = jnp.where(is_max, pos, N).astype(jnp.int64)
        out_roots = jnp.full((N,), -1, jnp.int32).at[dest].set(root_idx, mode="drop")
        out_R = jnp.zeros((N, WW), jnp.uint32).at[dest].set(R, mode="drop")
    else:
        out_roots = jnp.zeros((0,), jnp.int32)
        out_R = jnp.zeros((0, WW), jnp.uint32)

    active = live & ~cand_empty
    adj_of = lambda i: jnp.take(
        jnp.take(adj, i, axis=1), jnp.maximum(root_idx, 0), axis=0
    )  # [N, WW] rows adj[root, i]

    # --- Tomita pivot: argmax over u in cand ∪ fini of |cand ∩ adj[u]| ------
    def pivot_step(carry, u):
        best_score, best_u = carry
        member = ((jnp.take(Cand | Fini, u >> 5, axis=1)
                   >> (u & 31).astype(jnp.uint32)) & 1) == 1
        score = jnp.sum(
            jax.lax.population_count(Cand & adj_of(u)), axis=1, dtype=jnp.int32
        )
        score = jnp.where(member, score, -1)
        better = score > best_score
        return (jnp.where(better, score, best_score),
                jnp.where(better, u, best_u)), None

    (_, pivot), _ = jax.lax.scan(
        pivot_step,
        (jnp.full((N,), -1, jnp.int32), jnp.zeros((N,), jnp.int32)),
        jnp.arange(W, dtype=jnp.int32),
    )

    # per-item row adj[root_idx[n], pivot[n], :] (advanced indexing, not take)
    ext = Cand & ~adj[jnp.maximum(root_idx, 0), pivot]
    ext = jnp.where(active[:, None], ext, jnp.uint32(0))

    # --- children in local-index order ------------------------------------
    R_out = jnp.zeros((cap, WW), jnp.uint32)
    C_out = jnp.zeros((cap, WW), jnp.uint32)
    F_out = jnp.zeros((cap, WW), jnp.uint32)
    root_out = jnp.full((cap,), -1, jnp.int32)

    def child_step(carry, i):
        R_out, C_out, F_out, root_out, off = carry
        in_ext = ((jnp.take(ext, i >> 5, axis=1)
                   >> (i & 31).astype(jnp.uint32)) & 1) == 1
        below = _word_masks_below(i, WW)                    # [WW]
        processed = ext & below[None, :]
        a_i = adj_of(i)
        bit_i = (jnp.uint32(1) << (i & 31).astype(jnp.uint32))
        w_i = i >> 5
        onehot = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (WW,), 0) == w_i, bit_i, jnp.uint32(0)
        )
        childR = R | onehot[None, :]
        childC = (Cand & ~processed) & a_i
        childF = (Fini | processed) & a_i
        pos = jnp.cumsum(in_ext.astype(jnp.int64)) - 1
        dest = jnp.where(in_ext, off + pos, cap).astype(jnp.int64)
        R_out = R_out.at[dest].set(childR, mode="drop")
        C_out = C_out.at[dest].set(childC, mode="drop")
        F_out = F_out.at[dest].set(childF, mode="drop")
        root_out = root_out.at[dest].set(root_idx, mode="drop")
        off = off + jnp.sum(in_ext, dtype=jnp.int64)
        return (R_out, C_out, F_out, root_out, off), None

    (R_out, C_out, F_out, root_out, n_children), _ = jax.lax.scan(
        child_step,
        (R_out, C_out, F_out, root_out, jnp.int64(0)),
        jnp.arange(W, dtype=jnp.int32),
    )
    return n_maximal, out_roots, out_R, R_out, C_out, F_out, root_out, n_children


@functools.partial(jax.jit, static_argnames=("w_words", "cap"))
def bk_count_chunk(nbr, rank_pad, chunk, root_live, *, w_words: int, cap: int):
    """Count maximal cliques of one root chunk in ONE device dispatch.

    Replaces the per-level host readbacks (`int(total_popcount(Cand))`,
    `int(n_child)`) that serialized `bron_kerbosch`: the whole breadth-wise
    Tomita expansion runs to completion inside a `lax.while_loop` over a
    fixed item buffer of `cap` slots. If a level's child upper bound
    (Σ popcount(Cand) over live items — children are subsets of Cand bits)
    would exceed `cap`, the kernel stops and reports overflow; the host
    retries the chunk with doubled cap. Capacity is compiled shape, so
    overflow is a recompile, never a wrong answer — the same discipline as
    `parallel/multi.py:_sharded_kclique_step`.

    Because the result is a single (count, overflow) pair fetched lazily,
    chunks dispatched to different devices overlap (the async fan-out the
    reference gets from `omp for schedule(dynamic)`, eppsteinPAR.h:31).
    """
    WW = w_words
    C = chunk.shape[0]
    adj, _S0 = build_local_adj(nbr, chunk, w_words=w_words)
    Cand0, Fini0 = init_items(nbr, rank_pad, chunk, w_words=w_words)
    pad = cap - C
    Cand = jnp.concatenate([Cand0, jnp.zeros((pad, WW), jnp.uint32)])
    Fini = jnp.concatenate([Fini0, jnp.zeros((pad, WW), jnp.uint32)])
    R = jnp.zeros((cap, WW), jnp.uint32)
    root_idx = jnp.concatenate([
        jnp.where(root_live, jnp.arange(C, dtype=jnp.int32), -1),
        jnp.full((pad,), -1, jnp.int32),
    ])

    def cond(st):
        _R, _C, _F, root_idx, _total, overflow = st
        return jnp.any(root_idx >= 0) & ~overflow

    def body(st):
        R, Cand, Fini, root_idx, total, overflow = st
        live = root_idx >= 0
        ub = jnp.sum(
            jnp.where(live[:, None], jax.lax.population_count(Cand), 0),
            dtype=jnp.int64,
        )
        ovf = ub > cap
        n_max, _, _, R2, C2, F2, ri2, _nc = bk_level(
            R, Cand, Fini, root_idx, adj, cap=cap, emit=False
        )
        # on overflow the level's children may have been dropped — freeze
        # the count and exit via cond; the host retry discards this total
        return (R2, C2, F2, ri2,
                jnp.where(ovf, total, total + n_max), overflow | ovf)

    _, _, _, _, total, overflow = jax.lax.while_loop(
        cond, body,
        (R, Cand, Fini, root_idx, jnp.int64(0), jnp.bool_(False)),
    )
    return total, overflow


@functools.partial(jax.jit, static_argnames=("w_words",))
def init_items(nbr, rank_pad, roots, *, w_words: int):
    """Initial (R, cand, fini) per root: cand = higher-ranked neighbors,
    fini = lower-ranked (eppstein.h:23-33 / eppsteinPAR.h:39-45).
    Caller contract: every root's degree fits in 32*w_words local slots."""
    W = 32 * w_words
    r_nbr = jnp.take(nbr, roots, axis=0, mode="clip")          # [C, D]
    r_nbr = jax.lax.slice_in_dim(r_nbr, 0, min(W, r_nbr.shape[1]), axis=1)
    if r_nbr.shape[1] < W:
        r_nbr = jnp.concatenate(
            [r_nbr, jnp.full((r_nbr.shape[0], W - r_nbr.shape[1]), SENTINEL,
                             jnp.int32)], axis=1)
    valid = r_nbr != SENTINEL
    nbr_rank = jnp.take(rank_pad, r_nbr, axis=0, mode="clip")
    root_rank = jnp.take(rank_pad, roots, axis=0, mode="clip")
    higher = valid & (nbr_rank > root_rank[:, None])
    lower = valid & ~higher
    C = r_nbr.shape[0]
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    pack = lambda b: jnp.sum(
        b.reshape(C, w_words, 32).astype(jnp.uint32) * weights,
        axis=2, dtype=jnp.uint32,
    )
    return pack(higher), pack(lower)


def _plan_root_chunks(deg_all, roots_all, root_chunk: int, pad_id):
    """Degree-tiered root chunks: yields (chunk int32[cmax] padded with
    pad_id, w_words). The local universe is N(root), so the bitset width W
    must cover the chunk's max degree; sorting roots by degree keeps W (and
    the [C, W, W/32] adjacency) small for the bulk of the graph — the TPU
    form of the reference's per-root subgraph sizing
    (EppsteinSubGraphAdaptive.h boundary switch)."""
    order = np.argsort(deg_all[roots_all], kind="stable")
    roots_sorted = roots_all[order]
    # Hard per-dispatch adjacency budget (~128MB). build_local_adj's scan
    # materializes adj twice (scan stack + transpose), so the true peak is
    # ~2x this; the 256-floor _bucket MUST NOT be used here — it silently
    # multiplied hub chunks 16x and crashed the TPU worker at scale 16
    # (VERDICT r02 item 1: 4.3GB adjacency for the W=16384 chunk).
    mem_budget_words = 1 << 25
    start = 0
    while start < len(roots_sorted):
        d0 = int(deg_all[roots_sorted[start]])
        W = max(32, 1 << int(np.ceil(np.log2(max(d0, 1)))))
        WW = W // 32
        cmax = max(1, min(root_chunk,
                          1 << int(np.log2(max(mem_budget_words // (W * WW),
                                               1)))))
        stop = start
        while stop < len(roots_sorted) and stop - start < cmax and \
                deg_all[roots_sorted[stop]] <= W:
            stop += 1
        chunk = roots_sorted[start:stop]
        start = stop
        if len(chunk) < cmax:
            chunk = np.concatenate(
                [chunk, np.full(cmax - len(chunk), pad_id, dtype=np.int32)])
        yield chunk, WW


def bk_count_async(nbr, rank_pad, chunks, devices=None, *,
                   start_cap: int | None = None) -> int:
    """Dispatch `bk_count_chunk` for every (chunk, WW) job, round-robin over
    devices, fetching results ONCE after all dispatches (jax async dispatch
    overlaps the devices); overflowed chunks retry with doubled cap."""
    devices = list(devices) if devices is not None else [None]
    placed = {}  # device index -> (nbr, rank_pad) on that device

    def tables(di):
        if di not in placed:
            d = devices[di]
            if d is None:
                placed[di] = (nbr, rank_pad)
            else:
                placed[di] = (jax.device_put(nbr, d),
                              jax.device_put(rank_pad, d))
        return placed[di]

    def dispatch(di, chunk, WW, cap):
        nbr_d, rank_d = tables(di)
        d = devices[di]
        ch = jnp.asarray(chunk) if d is None else jax.device_put(
            jnp.asarray(chunk), d)
        live = ch != jnp.int32(nbr.shape[0])  # pad slots hold pad_id == v_pad
        return bk_count_chunk(nbr_d, rank_d, ch, live, w_words=WW, cap=cap)

    pending = []
    for i, (chunk, WW) in enumerate(chunks):
        cap = start_cap or _bucket(max(2 * len(chunk), 512))
        di = i % len(devices)
        pending.append((di, chunk, WW, cap,
                        dispatch(di, chunk, WW, cap)))
    total = 0
    while pending:
        nxt = []
        for di, chunk, WW, cap, (t, ovf) in pending:
            if bool(ovf):
                cap *= 2
                nxt.append((di, chunk, WW, cap,
                            dispatch(di, chunk, WW, cap)))
            else:
                total += int(t)
        pending = nxt
    return total


def bron_kerbosch(
    g: CSRGraph,
    *,
    rank: np.ndarray | None = None,
    ordering: str = "degeneracy",
    root_chunk: int = DEFAULT_ROOT_CHUNK,
    collect: bool = False,
    roots: np.ndarray | None = None,
):
    """Enumerate/count all maximal cliques of the undirected graph g.

    ordering ∈ {"degeneracy", "adg", "degree", "id"} — the reference's
    BK-GMS-{DEG, ADG, DGR, SG} variants (bron_kerbosch.h:16-52,
    maximal_clique_enum_bron_kerbosch.cc:31-93).

    Returns count (int) if collect=False, else (count, list[frozenset[int]]).
    roots limits the Eppstein root set (each maximal clique is reported at
    its lowest-ranked member, so disjoint root sets sum exactly — the
    device-parallel fan-out hook, parallel/multi.py).
    """
    n = g.num_nodes
    if n == 0:
        return (0, []) if collect else 0
    if rank is None:
        if ordering == "degeneracy":
            rank, _ = degeneracy.degeneracy_ordering_rank(g)
        elif ordering == "adg":
            rank = degeneracy.adg_ordering_rank(g)
        elif ordering == "degree":
            rank = degeneracy.degree_ordering_rank(g)
        elif ordering == "id":
            rank = np.arange(n, dtype=np.int32)
        else:
            raise ValueError(f"unknown ordering {ordering!r}")

    pg = PaddedGraph.from_csr(g, lane=32)
    rank_pad = np.full(pg.v_pad + 1, np.int32(np.iinfo(np.int32).max))
    rank_pad[:n] = rank
    rank_pad = jnp.asarray(rank_pad)
    nbr = pg.nbr
    nbr_host = np.asarray(pg.nbr) if collect else None

    total = 0
    cliques: list[frozenset] = []
    pad_id = np.int32(pg.v_pad)
    roots_all = (np.arange(n, dtype=np.int32) if roots is None
                 else np.asarray(roots, dtype=np.int32))
    deg_all = g.degrees

    if not collect:
        # count mode: one device dispatch per chunk (bk_count_chunk), all
        # chunks enqueued before any result is fetched
        return bk_count_async(
            nbr, rank_pad,
            _plan_root_chunks(deg_all, roots_all, root_chunk, pad_id))

    for chunk, WW in _plan_root_chunks(deg_all, roots_all, root_chunk, pad_id):
        cmax = len(chunk)
        adj, _S0 = build_local_adj(nbr, jnp.asarray(chunk), w_words=WW)
        Cand, Fini = init_items(nbr, rank_pad, jnp.asarray(chunk), w_words=WW)
        R = jnp.zeros((cmax, WW), jnp.uint32)
        root_idx = jnp.where(
            jnp.asarray(chunk) == pad_id, -1, jnp.arange(cmax, dtype=jnp.int32)
        )
        while True:
            ub = int(total_popcount(Cand))  # >= number of children emitted
            cap = _bucket(max(ub, 1))
            (n_max, out_roots, out_R, R, Cand, Fini, root_idx, n_child) = bk_level(
                R, Cand, Fini, root_idx, adj, cap=cap, emit=collect
            )
            total += int(n_max)
            if collect and int(n_max):
                orr = np.asarray(out_roots)[: int(n_max)]
                orR = np.asarray(out_R)[: int(n_max)]
                for rloc, bits in zip(orr, orR):
                    gid = int(chunk[rloc])
                    members = {gid}
                    row = nbr_host[gid]
                    for w in range(WW):
                        word = int(bits[w])
                        while word:
                            b = (word & -word).bit_length() - 1
                            members.add(int(row[w * 32 + b]))
                            word &= word - 1
                    cliques.append(frozenset(members))
            if int(n_child) == 0:
                break
    return (total, cliques) if collect else total


# ---------------------------------------------------------------------------
# host oracle — role of BkSimple (sequential/simple.h:13-61) + verifier.h
# ---------------------------------------------------------------------------

def bron_kerbosch_simple(g: CSRGraph) -> list[frozenset]:
    """Textbook no-pivot BK on the host; the correctness anchor."""
    adj = [set(g.out_neigh(v).tolist()) for v in range(g.num_nodes)]
    out: list[frozenset] = []

    def rec(R: set, P: set, X: set):
        if not P and not X:
            out.append(frozenset(R))
            return
        for v in sorted(P):
            rec(R | {v}, P & adj[v], X & adj[v])
            P = P - {v}
            X = X | {v}

    rec(set(), set(range(g.num_nodes)), set())
    return out


def is_clique(g: CSRGraph, clique) -> bool:
    adj = [set(g.out_neigh(v).tolist()) for v in range(g.num_nodes)]
    cl = list(clique)
    return all(b in adj[a] for i, a in enumerate(cl) for b in cl[i + 1 :])


def is_maximal(g: CSRGraph, clique) -> bool:
    adj = [set(g.out_neigh(v).tolist()) for v in range(g.num_nodes)]
    cl = set(clique)
    return not any(cl <= adj[v] for v in range(g.num_nodes) if v not in cl)
