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


def _cumsum_i32(x):
    """Exact int32 prefix-sum of a 0/1 [N] array via two-level MXU
    triangular matmuls. XLA's native 1-D cumsum lowers to ~15 shifted-add
    passes over the whole array on this chip (~234us at N=32k, measured in
    the r04 BK trace); two [*,128]x[128,128] f32 contractions are ~10x
    cheaper and exact (partials <= N < 2^24)."""
    N = x.shape[0]
    LANE = 128
    if N % LANE or N < 2 * LANE or N >= (1 << 24):
        return jnp.cumsum(x.astype(jnp.int32))
    R = N // LANE
    xf = x.astype(jnp.float32).reshape(R, LANE)
    triu = jnp.asarray(np.triu(np.ones((LANE, LANE), np.float32)))
    row_cs = jax.lax.dot_general(
        xf, triu, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [R, LANE]
    totals = row_cs[:, -1]
    offs = jnp.concatenate([jnp.zeros(1, jnp.float32),
                            jnp.cumsum(totals)[:-1]])
    return (row_cs + offs[:, None]).reshape(N).astype(jnp.int32)


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

    Membership strategy mirrors sets/ops.py: fused broadcast-compare for
    the common tier widths (dense VPU compare+any — ~100x the throughput
    of vmapped binary-search gathers on this chip, which made the r02
    builder the whole k-clique cost), falling back to a searchsorted scan
    when the per-pair compare tile W*D would blow the VPU budget (BK's
    hub tiers with W in the thousands).
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
    D = nbr.shape[1]

    if W * D <= 1 << 18 or C * W * D <= 1 << 27:
        # blocked dense compare: scan over i-blocks sized so the fused
        # [C, IB, W, D] equality tile stays ~2^27 elements. The second
        # condition admits wide-W tiers (whose C is planner-bounded):
        # the searchsorted fallback below is a W-step sequential scan,
        # and at W >= 2048 those steps exceeded the axon worker's ~60s
        # per-dispatch watchdog (the r04 star scale-12 crash).
        IB = max(1, min(W, (1 << 27) // max(C * W * D, 1)))
        while W % IB:
            IB -= 1
        blocks = r_nbr.reshape(C, W // IB, IB).transpose(1, 0, 2)

        def step(_, cols):                                     # cols [C, IB]
            rows = jnp.take(nbr, cols, axis=0, mode="clip")    # [C, IB, D]
            eq = rows[:, :, None, :] == r_nbr[:, None, :, None]
            m = jnp.any(eq, axis=3)                            # [C, IB, W]
            m = m & valid[:, None, :] & (cols != SENTINEL)[:, :, None]
            packed = jnp.sum(
                m.reshape(C, IB, w_words, 32).astype(jnp.uint32) * weights,
                axis=3, dtype=jnp.uint32)                      # [C, IB, WW]
            return None, packed

        _, adj_blocks = jax.lax.scan(step, None, blocks)       # [NB, C, IB, WW]
        adj = jnp.transpose(adj_blocks, (1, 0, 2, 3)).reshape(C, W, w_words)
    else:
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
        adj = jnp.transpose(adj_cols, (1, 0, 2))               # [C, W, WW]
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
# fused whole-chunk kernel: the entire k-2-level DFS in ONE device dispatch
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "w_words", "k", "cap", "batch", "iter_budget", "resume"))
def kclique_count_chunk(nbr, chunk, state, *, w_words: int, k: int,
                        cap: int, batch: int, iter_budget: int = 1 << 30,
                        resume: bool = False):
    """Count k-cliques rooted at `chunk` on a device-resident work stack.

    The role of kClist's per-thread DFS (kernels/kclisting.h:92-114 driven
    by parallelize.h:38-66 node-parallel / :100-118 edge-parallel): a
    LIFO work stack inside one `lax.while_loop`, so the host never sees
    per-level sizes. Item = (S uint32[WW] candidate bitset; meta packs the
    root index and `rem` vertices still needed), interleaved in ONE
    uint32[cap + B·W, WW+1] array. Each iteration pops `batch` items,
    expands every popped item along ALL W local vertices at once (dense
    [B, W, WW] AND + popcount), banks leaf counts (rem == 2:
    Σ_{i∈S} |S ∩ adj_i|, exact int64) and pushes surviving deeper
    children with one MXU-prefix-sum scatter (the r04 BK lesson: the
    searchsorted compaction ladder this replaces was 16 binary-search
    passes over the [B·W] table per iteration).

    Hub skew is a non-issue by construction: after a root item's first
    expansion its children (one per DAG edge) are independent pool items.

    Stack bound: pops take the most recently pushed (lowest-rem) items,
    so each rem level holds at most one batch's fan-out — peak size
    <= C + (k-2)·batch·W.

    Returns (total, overflow, done, state=(SM_stack, sp, total)). The
    outer loop stops after `iter_budget` pop rounds so a dispatch stays
    under the axon worker's ~60s execution watchdog; callers re-dispatch
    with resume=True and the returned state until done (pass a dummy
    state tuple when resume=False).
    """
    adj, S0 = build_local_adj(nbr, chunk, w_words=w_words)
    return kc_stack_machine(adj, S0, state, w_words=w_words, k=k, cap=cap,
                            batch=batch, iter_budget=iter_budget,
                            resume=resume)


@functools.partial(jax.jit, static_argnames=(
    "w_words", "k", "cap", "batch", "iter_budget", "resume"))
def kc_stack_machine(adj, S0, state, *, w_words: int, k: int, cap: int,
                     batch: int, iter_budget: int = 1 << 30,
                     resume: bool = False):
    """The device-resident work-stack of `kclique_count_chunk` as a pure
    function of the PREBUILT local DAG universe (adj uint32[C, W, WW],
    S0 uint32[C, WW]; pad roots must have S0 = 0). Split out so the
    memory-scaling sharded plan (parallel/sharding.py, k >= 6 path) can
    ring-build the local adjacency from table shards and reuse the
    identical kernel."""
    WW = w_words
    W = 32 * WW
    C = adj.shape[0]
    BW = batch * W
    K = WW + 1                 # stack row: S | meta (R*256 + rem)
    cap_total = cap + BW
    assert cap >= max(C, batch)

    if resume:
        SM, sp0, total0 = state
    else:
        del state
        pc0 = jnp.sum(jax.lax.population_count(S0), axis=1, dtype=jnp.int32)
        S0ok = jnp.where((pc0 >= k - 1)[:, None], S0, jnp.uint32(0))
        SM = jnp.zeros((cap_total, K), jnp.uint32)
        row0 = jnp.concatenate(
            [S0ok, (jnp.arange(C, dtype=jnp.uint32) * 256
                    + jnp.uint32(k - 1))[:, None]], axis=1)
        SM = jax.lax.dynamic_update_slice(SM, row0, (0, 0))
        sp0 = jnp.int32(C)
        total0 = jnp.int64(0)

    widx = jnp.arange(W, dtype=jnp.int32)

    def cond(st):
        _SM, sp, _t, ovf, n_it = st
        return (sp > 0) & ~ovf & (n_it < iter_budget)

    def body(st):
        SM, sp, total, ovf, n_it = st
        base = jnp.maximum(sp - batch, 0)
        idx = base + jnp.arange(batch, dtype=jnp.int32)
        live = idx < sp
        prows = jnp.take(SM, idx, axis=0, mode="clip")         # [B, K]
        S = jnp.where(live[:, None],
                      jax.lax.slice_in_dim(prows, 0, WW, axis=1),
                      jnp.uint32(0))
        meta = prows[:, WW].astype(jnp.int32)
        R = meta >> 8
        rem = jnp.where(live, meta & 255, 0)

        rows = jnp.take(adj, jnp.clip(R, 0, C - 1), axis=0)    # [B, W, WW]
        child = S[:, None, :] & rows
        words = jnp.take(S, widx >> 5, axis=1)                 # [B, W]
        has = ((words >> (widx & 31).astype(jnp.uint32)[None, :]) & 1) == 1
        pc = jnp.sum(jax.lax.population_count(child), axis=2,
                     dtype=jnp.int32)                          # [B, W]

        leaf = live & (rem == 2)
        total = total + jnp.sum(
            jnp.where(leaf[:, None] & has, pc, 0), dtype=jnp.int64)

        ok = live[:, None] & (rem[:, None] > 2) & has & (pc >= rem[:, None] - 1)
        flat_ok = ok.reshape(BW)
        cum = _cumsum_i32(flat_ok)
        n_child = cum[-1]
        new_sp = base + n_child
        ovf = ovf | (new_sp > cap)
        meta_child = jnp.broadcast_to(
            (R[:, None] * 256 + (rem[:, None] - 1)).astype(jnp.uint32),
            (batch, W))
        blk = jnp.concatenate(
            [child.reshape(BW, WW), meta_child.reshape(BW, 1)], axis=1)
        dest = jnp.where(flat_ok, base + cum - 1, jnp.int32(cap_total))
        SM = SM.at[dest].set(blk, mode="drop")
        return (SM, new_sp, total, ovf, n_it + 1)

    st = jax.lax.while_loop(
        cond, body, (SM, sp0, total0, jnp.bool_(False), jnp.int32(0)))
    SM, sp, total, overflow, _n_it = st
    done = (sp <= 0) | overflow
    return total, overflow, done, (SM, sp, total)


@functools.partial(jax.jit, static_argnames=(
    "w_words", "k", "cap", "batch", "push_cap", "iter_budget", "resume"))
def kc_fused_chunk(nbr, chunk, state, *, w_words: int, k: int, cap: int,
                   batch: int, push_cap: int, iter_budget: int = 1 << 30,
                   resume: bool = False):
    """k >= 6 counting on the adaptive-pop fused work-stack (the
    star_fused_chunk architecture, k_clique_star.py, minus the star
    bitset): item = (S candidate bitset | root*256 + rem), pops bounded
    by actual fan-out Σ|S| <= push_cap, children materialized only for
    real slots via the two-level index chain, pushes compacted by ONE
    band sort + contiguous dynamic_update_slice. rem==2 children
    contribute popcount(cS) to the exact int64 total inline (each bit a
    final member), so the last level never materializes. Replaces the
    r04 kc_stack_machine dense expansion on the single-chip path, whose
    per-round [B, W] full-width expansion + B*W-slot scatter and
    untiered global width made k=6 scale-13 a 42s / 7x-slower-than-
    reference kernel (kc_stack_machine remains the sharded plan's
    engine). Resumable segments (axon ~60s watchdog) as usual.

    Tiers with W <= 128 additionally count rem==4 children inline on the
    MXU: a child still needing 3 members completes with every DAG
    TRIANGLE inside cS, i.e. Σ M⊙(M@M) with M = A_root ∧ (cS × cS) as a
    0/1 bf16 [PC, W, W] batched contraction (kclisting.h:92-146's two
    deepest levels as systolic-array work). Exact: Q entries <= W and the
    per-item sum <= W^3 <= 2^21 stay integral in f32. This removes the
    rem==3 child generation — the bulk of all materialization at deep k
    (the r05 k=8 lesson: 16.5s -> ~2s at scale 12)."""
    from gms_tpu.algorithms.bron_kerbosch import (
        _onehot_masks, _band_compact)

    WW = w_words
    W = 32 * WW
    B = batch
    C = chunk.shape[0]
    PC = push_cap
    cap_total = cap + PC
    assert PC >= W and cap >= C
    K = WW + 1                 # stack row: S | meta (root*256 + rem)
    tri4 = W <= 128            # MXU rem==4 inline (see docstring)

    adj, S0 = build_local_adj(nbr, chunk, w_words=WW)
    widx = jnp.arange(W, dtype=jnp.int32)
    oiota = jnp.arange(PC, dtype=jnp.int32)
    adj_f = adj.reshape(C * W, WW)

    if resume:
        STK, n0, total0 = state
    else:
        del state
        pc0 = jnp.sum(jax.lax.population_count(S0), axis=1,
                      dtype=jnp.int32)
        init_ok = pc0 >= k - 1
        cidx = jnp.arange(C, dtype=jnp.int32)
        icum = jnp.cumsum(init_ok.astype(jnp.int32))
        n0 = icum[-1]
        STK = jnp.zeros((cap_total, K), jnp.uint32)
        row0 = jnp.concatenate(
            [jnp.where(init_ok[:, None], S0, jnp.uint32(0)),
             (cidx.astype(jnp.uint32) * 256 + jnp.uint32(k - 1))[:, None]],
            axis=1)
        STK = STK.at[jnp.where(init_ok, icum - 1,
                               jnp.int32(cap_total))].set(
            row0, mode="drop")
        total0 = jnp.int64(0)

    def cond(st):
        sp = st[1]
        ovf = st[3]
        n_it = st[4]
        return (sp > 0) & ~ovf & (n_it < iter_budget)

    def body(st):
        STK, sp, total, ovf, n_it = st
        rpos = jnp.arange(B, dtype=jnp.int32)
        idx = sp - 1 - rpos                                   # top-first
        inb = idx >= 0
        wstart = jnp.maximum(sp - B, 0)
        win = jax.lax.dynamic_slice(STK, (wstart, jnp.int32(0)), (B, K))
        prows = jnp.take(win, jnp.clip(idx - wstart, 0, B - 1), axis=0)
        S = jnp.where(inb[:, None],
                      jax.lax.slice_in_dim(prows, 0, WW, axis=1),
                      jnp.uint32(0))
        meta = prows[:, WW].astype(jnp.int32)
        R = meta >> 8
        rem = meta & 255
        has = inb[:, None] & (((jnp.take(S, widx >> 5, axis=1)
                                >> (widx & 31).astype(jnp.uint32)[None, :])
                               & 1) == 1)

        # adaptive pop: m = longest top prefix with Σ|S| <= push_cap
        nc = jnp.sum(has, axis=1, dtype=jnp.int32)
        crev = jnp.cumsum(nc)
        alive = inb & (crev <= PC)
        m = jnp.sum(alive, dtype=jnp.int32)
        base = sp - m
        has = has & alive[:, None]
        pex = jnp.where(alive, crev - nc, 0)
        n_child = jnp.sum(jnp.where(alive, nc, 0), dtype=jnp.int32)

        sorted_i = jnp.sort(jnp.where(has, widx[None, :], W), axis=1)
        starts = jnp.zeros((PC,), jnp.int32).at[
            jnp.where(alive & (nc > 0), pex, PC)].max(rpos, mode="drop")
        b_j = jax.lax.associative_scan(jnp.maximum, starts)
        valid_j = oiota < n_child
        pos_j = oiota - jnp.take(pex, b_j)
        i_j = jnp.take(sorted_i.reshape(B * W),
                       jnp.clip(b_j * W + pos_j, 0, B * W - 1))

        pS = jnp.take(S, b_j, axis=0)
        pR = jnp.take(R, b_j)
        prem = jnp.take(rem, b_j)
        fi = jnp.clip(pR, 0, C - 1) * W + jnp.clip(i_j, 0, W - 1)
        cS = pS & jnp.take(adj_f, fi, axis=0)
        pcS = jnp.sum(jax.lax.population_count(cS), axis=1,
                      dtype=jnp.int32)

        # rem==2 children finish with every remaining candidate (only
        # reachable for k == 4-equivalents; k >= 6 roots start at rem >= 5
        # and the rem==3 inline count below keeps rem==2 items off the
        # stack entirely)
        total = total + jnp.sum(
            jnp.where(valid_j & (prem == 2), pcS, 0), dtype=jnp.int64)

        # rem==3 children: each completes with any DAG EDGE inside cS, so
        # count Σ_{j∈cS} |cS ∩ adj_j| inline — this removes the
        # second-to-last level (the bulk of all pushes) from the stack at
        # the cost of one [PC, W, WW] row gather per round (the plan
        # bounds PC so this tensor stays ~2^25 words)
        rows3 = jnp.take(adj, jnp.clip(pR, 0, C - 1), axis=0)  # [PC, W, WW]
        in_cS = ((jnp.take(cS, widx >> 5, axis=1)
                  >> (widx & 31).astype(jnp.uint32)[None, :]) & 1) == 1
        if tri4:
            # rem==4 children complete with every DAG TRIANGLE inside cS:
            # M = A_root ∧ (cS × cS) as 0/1 bf16, tri = Σ M⊙(M@M) on the
            # MXU. k >= 6 roots start at rem >= 5, so rem 3/2 items never
            # exist — this branch replaces the e3/pcS banks entirely.
            Mw = jnp.where(in_cS[:, :, None], rows3 & cS[:, None, :],
                           jnp.uint32(0))                      # [PC, W, WW]
            Mb = ((jnp.take(Mw, widx >> 5, axis=2)
                   >> (widx & 31).astype(jnp.uint32)[None, None, :])
                  & 1).astype(jnp.bfloat16)                    # [PC, W, W]
            Q = jax.lax.dot_general(
                Mb, Mb, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)            # [PC, W, W]
            tri = jnp.sum(Mb.astype(jnp.float32) * Q,
                          axis=(1, 2))                         # [PC] exact
            total = total + jnp.sum(
                jnp.where(valid_j & (prem == 4),
                          tri.astype(jnp.int64), 0), dtype=jnp.int64)
            push = valid_j & (prem > 4) & (pcS >= prem - 1)
        else:
            e3 = jnp.sum(
                jnp.where(in_cS[:, :, None],
                          jax.lax.population_count(cS[:, None, :] & rows3),
                          0), axis=(1, 2), dtype=jnp.int32)    # [PC]
            total = total + jnp.sum(
                jnp.where(valid_j & (prem == 3), e3.astype(jnp.int64), 0),
                dtype=jnp.int64)
            push = valid_j & (prem > 3) & (pcS >= prem - 1)
        n_push = jnp.sum(push, dtype=jnp.int32)
        ovf = ovf | (base + n_push > cap)
        child_blk = jnp.concatenate(
            [cS, ((pR.astype(jnp.uint32) * 256)
                  + (prem - 1).astype(jnp.uint32))[:, None]], axis=1)
        band = jnp.where(push, oiota, PC + oiota)
        STK = jax.lax.dynamic_update_slice(
            STK, _band_compact(band, child_blk), (base, jnp.int32(0)))
        return (STK, base + n_push, total, ovf, n_it + 1)

    st = jax.lax.while_loop(
        cond, body, (STK, n0, total0, jnp.bool_(False), jnp.int32(0)))
    STK, sp, total, ovf, n_iter = st
    done = (sp <= 0) | ovf
    scalars = jnp.stack([total, ovf.astype(jnp.int64),
                         done.astype(jnp.int64), n_iter.astype(jnp.int64)])
    return scalars, (STK, sp, total)


# ---------------------------------------------------------------------------
# MXU path for k in {3, 4, 5}: per-root dense local DAG adjacency; the whole
# bottom of the recursion becomes ONE large-M matmul per root group
# ---------------------------------------------------------------------------
#
# For a root r with local DAG adjacency A (W x W 0/1, A[i, l] = 1 iff local
# DAG edge i->l, both in N+(r)):
#   k=3: count_r = Σ A                    (# local DAG edges)
#   k=4: count_r = Σ A ⊙ (A @ A)          (DAG triangles i<j<l, counted once)
#   k=5: count_r = Σ M ⊙ (M @ A) with M[(i,j), l] = A[i,j]·A[i,l]·A[j,l]
#        (DAG 4-cliques i<j<m<l: M row (i,j) is the candidate set of the
#        partial clique {r,i,j}; the contraction supplies m and the
#        elementwise mask supplies l).
# This is where kClist's levels 3/2/1 (kernels/kclisting.h:92-146) go on a
# TPU: the deepest, hottest levels become dense systolic-array work instead
# of pointer-chasing recursion. Shaping matters: stacking (i,j) into the
# matmul's M dimension gives [G·W², W] x [W, W]-class contractions, which
# this chip runs ~10x faster than many small batched [B, W, W] matmuls —
# and degree-tiered root chunks (plan_tier_chunks) keep W at the tier's
# max degree instead of the global one (cubic-cost padding, the r02
# 478-second mistake).
#
# Exactness: operands are 0/1 bf16; Q entries ≤ W ≤ 1024 accumulate in
# f32 (< 2^24, integral); per-row Σ_l ≤ W² ≤ 2^20 stays exact in f32; the
# cross-row reduction is int64.


@functools.partial(jax.jit,
                   static_argnames=("w_words", "k", "group", "i_block"))
def kclique_dense_chunk(nbr, chunk, *, w_words: int, k: int, group: int,
                        i_block: int | None = None):
    """Count k-cliques (k in {3,4,5}) rooted at `chunk` in ONE dispatch.

    chunk: int32[C] root ids (pad slots hold a pad id whose row is all
    SENTINEL, contributing 0), C a multiple of `group`. For k=5 the W³
    tensor M is built in `i_block`-row slices so wide tiers (W >= 512)
    stay within a fixed working-set budget.
    """
    WW = w_words
    W = 32 * WW
    C = chunk.shape[0]
    adj, _S0 = build_local_adj(nbr, chunk, w_words=WW)     # [C, W, WW]
    if k == 3:
        return jnp.sum(jax.lax.population_count(adj), dtype=jnp.int64)
    if i_block is None:
        i_block = W

    widx = jnp.arange(W, dtype=jnp.int32)
    shift = (widx & 31).astype(jnp.uint32)
    word = widx >> 5

    def unpack(bits):  # uint32[..., WW] -> bf16[..., W] of 0/1
        w = jnp.take(bits, word, axis=-1)
        return ((w >> shift) & 1).astype(jnp.bfloat16)

    # exactness: Q entries <= W accumulate exactly in f32 (< 2^24); the
    # per-row Σ_l mask*Q is bounded by W² — exact in f32 only for W <= 4096,
    # so wider tiers reduce via int32 products into an int64 sum instead
    # (ADVICE r03: silent f32 exactness loss at W >= 8192)
    def mask_dot_rows(Mk, Q):
        if W <= 4096:
            return jnp.sum(Mk.astype(jnp.float32) * Q, axis=2)
        return jnp.sum(Mk.astype(jnp.int32) * Q.astype(jnp.int32),
                       axis=2, dtype=jnp.int64)

    def step(total, bits):                                 # bits [G, W, WW]
        A = unpack(bits)                                   # [G, W, W]
        if k == 4:
            Q = jax.lax.dot_general(
                A, A, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)        # [G, W, W]
            rows = mask_dot_rows(A, Q)
            return total + jnp.sum(rows.astype(jnp.int64)), None
        Asl = A.reshape(group, W // i_block, i_block, W).transpose(1, 0, 2, 3)

        def inner(tot, Ai):                                # [G, I, W]
            M = (Ai[:, :, :, None] * Ai[:, :, None, :]) * A[:, None, :, :]
            M = M.reshape(group, i_block * W, W)           # [(i,j) rows, l]
            Q = jax.lax.dot_general(
                M, A, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            rows = mask_dot_rows(M, Q)
            return tot + jnp.sum(rows.astype(jnp.int64)), None

        total, _ = jax.lax.scan(inner, total, Asl)
        return total, None

    total, _ = jax.lax.scan(
        step, jnp.int64(0), adj.reshape(C // group, group, W, WW))
    return total


def plan_tier_chunks(deg_all, roots_all, pad_id, *, root_chunk: int = 4096,
                     mem_budget_words: int = 1 << 25, min_w: int = 32):
    """Degree-tiered root chunks: yields (chunk int32[cmax] padded with
    pad_id, w_words). Sorting roots by degree keeps the local width W (and
    everything cubic in it) at the tier's max degree instead of the global
    one — the TPU form of the reference's per-root subgraph sizing
    (EppsteinSubGraphAdaptive.h boundary switch / SubGraphBuilder.h:24-60).
    `mem_budget_words` caps the [C, W, W/32] local-adjacency build (whose
    scan stack makes the true peak ~2x this)."""
    order = np.argsort(deg_all[roots_all], kind="stable")
    roots_sorted = roots_all[order]
    start = 0
    while start < len(roots_sorted):
        d0 = int(deg_all[roots_sorted[start]])
        W = max(min_w, 1 << int(np.ceil(np.log2(max(d0, 1)))))
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


# ---------------------------------------------------------------------------
# host orchestration
# ---------------------------------------------------------------------------

def kclique_count(
    g: CSRGraph,
    k: int,
    *,
    rank: np.ndarray | None = None,
    root_chunk: int = DEFAULT_ROOT_CHUNK,
    batch: int | None = None,
) -> int:
    """Exact number of k-cliques in the undirected graph g.

    Equivalent output to kClist node-parallel counting
    (k_clique_list_danisch_node_parallel.cc); each clique counted once.
    All chunk kernels are enqueued before any result is fetched (async
    dispatch), so host<->device latency is paid once per retry round, not
    per chunk.
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
    pad_id = np.int32(pg.v_pad)  # clip-gathers to the last (all-SENTINEL) row
    dag_deg = np.asarray(dag.degrees)

    if k <= 5:
        # dense MXU path over degree-tiered chunks: all chunk scans
        # enqueued, ONE fetch at the end
        ME = 1 << 24  # per-step M-tensor element budget (32MB bf16)
        results = []
        for chunk, tWW in plan_tier_chunks(dag_deg, roots, pad_id,
                                           root_chunk=root_chunk):
            tW = 32 * tWW
            group = batch if batch is not None else max(1, ME // tW**3)
            group = int(np.gcd(group, len(chunk)))
            i_block = tW
            while (k == 5 and i_block > 1
                   and group * i_block * tW * tW > 2 * ME):
                i_block //= 2  # clamped >= 1 (ADVICE r03: underflow to 0)
            results.append(kclique_dense_chunk(
                nbr, jnp.asarray(chunk), w_words=tWW, k=k, group=group,
                i_block=i_block))
        return int(sum(int(t) for t in results))

    # k >= 6: adaptive-pop fused work-stack (kc_fused_chunk) over
    # DEGREE-TIERED root chunks, resumable segments, async waves with one
    # batched scalar fetch per wave — the r05 rebuild (the old path ran
    # every chunk at the GLOBAL pad width with full-width expansions and
    # a B*W-slot scatter: 42s at scale-13 k=6, 7x slower than the
    # reference; this path runs it in ~3s)
    dummy = (jnp.zeros((1, 1), jnp.uint32), jnp.int32(0), jnp.int64(0))

    def plan(WW_t):
        W_t = 32 * WW_t
        if W_t <= 128:
            # tri4 tiers (MXU rem==4 inline): the [PC, W, W] bf16 M
            # tensor bounds PC to ~2^24 elements; every popped item fans
            # >= 1 child so batch = push_cap loses nothing and avoids
            # sorting rows that can never pop
            pc = max(W_t, min(32768, (1 << 24) // max(W_t * W_t, 1)))
            b = batch if batch is not None else pc
        else:
            b = batch if batch is not None else 8192
            # the rem==3 inline edge count gathers [PC, W, WW] rows per
            # round; bound PC so that tensor stays ~2^25 words (wide hub
            # tiers trade pop width for not blowing HBM)
            pc = max(W_t, min(2 * b, (1 << 25) // max(W_t * WW_t, 1)))
        cap = max(root_chunk, (1 << 23) // (WW_t + 1))
        ib = max(2048, (1 << 21) // W_t)
        return b, pc, cap, ib

    def dispatch(chunk, WW_t, pl, st):
        b, pc, cap, ib = pl
        return kc_fused_chunk(
            nbr, jnp.asarray(chunk), dummy if st is None else st,
            w_words=WW_t, k=k, cap=cap, batch=b, push_cap=pc,
            iter_budget=ib, resume=st is not None)

    queue = [(chunk, WW_t, plan(WW_t), None)
             for chunk, WW_t in plan_tier_chunks(dag_deg, roots, pad_id,
                                                 root_chunk=root_chunk)]
    total = 0
    max_inflight = 8
    while queue:
        wave, queue = queue[:max_inflight], queue[max_inflight:]
        pending = [(c, WW_t, pl, dispatch(c, WW_t, pl, st))
                   for c, WW_t, pl, st in wave]
        blocks = jax.device_get([p[3][0] for p in pending])
        for (chunk, WW_t, pl, (sc_d, st)), sc in zip(pending, blocks):
            t, ovf, done = int(sc[0]), bool(sc[1]), bool(sc[2])
            if ovf:
                real = chunk[chunk != pad_id]
                if len(real) > 1:
                    h = len(real) // 2
                    for part in (real[:h], real[h:]):
                        sub = np.full(len(chunk), pad_id, chunk.dtype)
                        sub[: len(part)] = part
                        queue.append((sub, WW_t, pl, None))
                else:
                    b, pc, cap, ib = pl
                    queue.append((chunk, WW_t, (b, pc, cap * 2, ib), None))
                continue
            if not done:
                queue.append((chunk, WW_t, pl, st))
                continue
            total += t
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
