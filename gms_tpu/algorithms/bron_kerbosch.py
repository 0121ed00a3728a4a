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

TPU-first re-design (round 4 — the fused DAG-universe kernel):

For ANY root r, every maximal clique reported at r (its lowest-ranked
member, the Eppstein argument) lies inside {r} ∪ N⁺(r), so the expansion
universe is the DAG out-neighborhood — width bounded by the core number,
never the raw degree (the reference's per-root subgraph trick,
EppsteinSubGraph.h:122-167, with the X-set discipline moved into a
post-filter):
  1. enumerate the maximal cliques of G[N⁺(r)] with a Tomita-pivot
     recursion over uint32[WW] bitsets in the local universe;
  2. a leaf D is a global maximal clique {r} ∪ D unless some LOWER-ranked
     neighbor w of r extends it, i.e. D ⊆ N⁺(w) — a pure bitset check
     against precomputed cover rows (`_hub_cover_bits`). Higher-ranked
     extenders cannot exist (they would contradict subgraph maximality).

The ENTIRE per-chunk recursion runs in watchdog-bounded device dispatches
(`bk_fused_chunk`): a device-resident LIFO work stack inside nested
lax.while_loops adaptively pops items (bounded by actual fan-out so all
slot-wise ops run at push_cap, not batch·W), computes every popped item's
pivot with one [B, W, WW] popcount, compacts real children through a
per-item minor-axis sort + two-level index chain, and banks leaves into a
device buffer that the maximality filter flushes between inner-loop runs.
Each dispatch stops after `iter_budget` pop rounds (the axon worker kills
programs over ~60s) and returns resumable state; the host re-dispatches
in asynchronous waves with ONE batched scalar fetch per wave. This
replaced the r03 host-driven level loop (thousands of serialized ~20ms
tunnel round-trips; 56.9s warm at RMAT-12/deg-16 vs 0.83s now — the
2-core C++ reference does 0.92s, and at scale 14 it produces nothing in
2880s while this path finishes 165.4M cliques in 225s).

The leaf filter rejects only ~10-16% of candidate leaves on RMAT at bench
density (measured r04, scalars[4] diagnostic), so mid-tree X-domination
pruning — which would pay an [B, IN, WW] cover test every pop round — is
deliberately NOT done.

Each maximal clique is produced exactly once: its lowest-ranked vertex is
its root, and within a root the Tomita recursion is duplicate-free. Counts
are exact int64.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from gms_tpu.graphs.csr import CSRGraph
from gms_tpu.graphs.tiles import PaddedGraph, SENTINEL
from gms_tpu.preprocessing import degeneracy, orient
from gms_tpu.algorithms.k_clique import build_local_adj, _bucket, _cumsum_i32

DEFAULT_ROOT_CHUNK = 4096

# tuning-sweep hook for _bk_fused's per-chunk plan (scripts/microbench.py);
# empty in production
_PLAN_OVERRIDES: dict = {}


def _below_masks(W: int, WW: int):
    """Constant uint32[W, WW]: row i = mask of bit positions < i."""
    i = np.arange(W)
    w = np.arange(WW)
    full = (w[None, :] < (i[:, None] >> 5)).astype(np.uint64) * 0xFFFFFFFF
    part = np.where(w[None, :] == (i[:, None] >> 5),
                    (np.uint64(1) << (i[:, None] & 31).astype(np.uint64)) - 1,
                    0)
    return jnp.asarray((full | part).astype(np.uint32))


def _onehot_masks(W: int, WW: int):
    """Constant uint32[W, WW]: row i = bitset {i}."""
    widx = np.arange(W)
    oh = np.zeros((W, WW), np.uint32)
    oh[widx, widx >> 5] = np.uint32(1) << (widx & 31)
    return jnp.asarray(oh)


def _band_compact(band, blk):
    """Reorder blk's rows by ascending band key (within-band order
    preserved when the key embeds iota). Narrow rows ride the variadic
    bitonic sort as payload columns — row-granular gather/scatter pays a
    ~50-100ns-per-row DMA tax (half the r05 BK hot job) while the sort
    network moves rows through vector registers. Wide rows (> 32 columns:
    a 193-operand variadic sort at WW=64 was pathological to compile AND
    run — the r05 star scale-12 bench timeout) sort only the permutation
    and pay ONE row gather, amortized by the row width."""
    K = blk.shape[1]
    if K <= 32:
        sorted_cols = jax.lax.sort(
            (band, *(blk[:, c] for c in range(K))), num_keys=1)
        return jnp.stack(sorted_cols[1:], axis=1)
    iota = jnp.arange(band.shape[0], dtype=jnp.int32)
    _, perm = jax.lax.sort_key_val(band, iota)
    return jnp.take(blk, perm, axis=0)


def _scatter_compact_dest(ok_flat, cum, oob: int):
    """Stable-compaction destinations: valid element i goes to slot
    cum[i]-1, invalid ones to `oob` (dropped by mode='drop'). ONE scatter
    pass replaces the searchsorted-per-output-slot gather ladder whose 16
    binary-search passes were 86% of BK wall-clock in the r04 trace."""
    return jnp.where(ok_flat, cum - 1, jnp.int32(oob))


# ---------------------------------------------------------------------------
# direct-universe count kernel (cand over the FULL neighborhood) — kept as
# the `direct=True` variant; the default path is the fused DAG-universe
# kernel below, whose width is bounded by the core number instead of the
# max degree (the width that crashed the TPU worker at scale 12 / deg 16,
# VERDICT r03 weak item 2 — direct tiers are now fenced to W <= 1024).
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("w_words", "cap", "batch",
                                             "iter_budget"))
def bk_count_chunk(nbr, rank_pad, chunk, root_live, *, w_words: int,
                   cap: int, batch: int, iter_budget: int = 1 << 30):
    """Count maximal cliques of one root chunk in ONE device dispatch.

    A device-resident LIFO work stack: each iteration pops `batch` items
    (cand, fini, root), computes the Tomita pivot for every popped item
    with ONE vectorized [B, W, WW] popcount (tomita.h:11-40), forms all
    children along ext = cand \\ N(pivot) with precomputed below-i prefix
    masks, counts the maximal events (child cand = fini = ∅) and pushes
    only children with work left.

    Memory is PROVABLY bounded: depth ≤ max-clique size ≤ core+1, the
    stack keeps at most one batch's fan-out per depth level (LIFO), so
    peak ≤ C + depth·batch·|cand|max — the caller sizes `cap` from the
    core bound and SPLITS the chunk on overflow instead of doubling
    buffers. `iter_budget` bounds pop rounds per dispatch (the axon ~60s
    execution watchdog); hitting it sets `overflow`, and the caller's
    split path re-runs the halves — the fused DAG-universe path
    (`bk_fused_chunk`) is the default and resumes properly; this direct
    variant just stays crash-safe."""
    WW = w_words
    W = 32 * WW
    C = chunk.shape[0]
    BW = batch * W
    cap_total = cap + BW
    adj, _S0 = build_local_adj(nbr, chunk, w_words=w_words)
    Cand0, Fini0 = init_items(nbr, rank_pad, chunk, w_words=w_words)
    Cand0 = jnp.where(root_live[:, None], Cand0, jnp.uint32(0))
    Fini0 = jnp.where(root_live[:, None], Fini0, jnp.uint32(0))
    below = _below_masks(W, WW)                            # [W, WW]
    widx = jnp.arange(W, dtype=jnp.int32)
    out_iota = jnp.arange(BW, dtype=jnp.int32)

    # roots that are already maximal ({r} with no neighbors at all)
    c0_empty = jnp.all(Cand0 == 0, axis=1)
    total0 = jnp.sum(root_live & c0_empty & jnp.all(Fini0 == 0, axis=1),
                     dtype=jnp.int64)
    # push roots with work (cand nonempty), compacted to the stack base
    init_ok = root_live & ~c0_empty
    icum = jnp.cumsum(init_ok.astype(jnp.int32))
    isrc = jnp.minimum(
        jnp.searchsorted(icum, jnp.arange(C, dtype=jnp.int32) + 1), C - 1)
    ikeep = jnp.arange(C, dtype=jnp.int32) < icum[-1]
    CS = jnp.zeros((cap_total, WW), jnp.uint32)
    FS = jnp.zeros((cap_total, WW), jnp.uint32)
    MS = jnp.zeros((cap_total,), jnp.int32)
    CS = jax.lax.dynamic_update_slice(
        CS, jnp.where(ikeep[:, None], jnp.take(Cand0, isrc, axis=0), 0),
        (0, 0))
    FS = jax.lax.dynamic_update_slice(
        FS, jnp.where(ikeep[:, None], jnp.take(Fini0, isrc, axis=0), 0),
        (0, 0))
    MS = jax.lax.dynamic_update_slice(
        MS, jnp.where(ikeep, isrc, 0), (0,))

    def cond(st):
        _c, _f, _m, sp, _t, ovf, n_it = st
        return (sp > 0) & ~ovf & (n_it < iter_budget)

    def body(st):
        CS, FS, MS, sp, total, ovf, n_it = st
        base = jnp.maximum(sp - batch, 0)
        idx = base + jnp.arange(batch, dtype=jnp.int32)
        live = idx < sp
        Cand = jnp.where(live[:, None],
                         jnp.take(CS, idx, axis=0, mode="clip"), jnp.uint32(0))
        Fini = jnp.where(live[:, None],
                         jnp.take(FS, idx, axis=0, mode="clip"), jnp.uint32(0))
        R = jnp.take(MS, idx, mode="clip")
        rows = jnp.take(adj, jnp.clip(R, 0, C - 1), axis=0)  # [B, W, WW]

        # vectorized Tomita pivot
        cu = Cand | Fini
        member = ((jnp.take(cu, widx >> 5, axis=1)
                   >> (widx & 31).astype(jnp.uint32)[None, :]) & 1) == 1
        scores = jnp.sum(jax.lax.population_count(Cand[:, None, :] & rows),
                         axis=2, dtype=jnp.int32)           # [B, W]
        scores = jnp.where(member, scores, -1)
        pivot = jnp.argmax(scores, axis=1).astype(jnp.int32)
        prow = jnp.take_along_axis(
            rows, pivot[:, None, None], axis=1)[:, 0, :]    # [B, WW]
        ext = Cand & ~prow
        has = ((jnp.take(ext, widx >> 5, axis=1)
                >> (widx & 31).astype(jnp.uint32)[None, :]) & 1) == 1

        extb = ext[:, None, :] & below[None, :, :]          # [B, W, WW]
        ccand = (Cand[:, None, :] & ~extb) & rows
        cfini = (Fini[:, None, :] | extb) & rows
        valid = live[:, None] & has
        c_empty = jnp.all(ccand == 0, axis=2)
        f_empty = jnp.all(cfini == 0, axis=2)
        total = total + jnp.sum(valid & c_empty & f_empty, dtype=jnp.int64)

        pushable = valid & ~c_empty
        flat_ok = pushable.reshape(BW)
        cum = jnp.cumsum(flat_ok.astype(jnp.int32))
        n_push = cum[-1]
        new_sp = base + n_push
        ovf = ovf | (new_sp > cap)
        src = jnp.minimum(jnp.searchsorted(cum, out_iota + 1, side="left"),
                          BW - 1)
        keep = out_iota < n_push
        cpush = jnp.where(keep[:, None],
                          jnp.take(ccand.reshape(BW, WW), src, axis=0),
                          jnp.uint32(0))
        fpush = jnp.where(keep[:, None],
                          jnp.take(cfini.reshape(BW, WW), src, axis=0),
                          jnp.uint32(0))
        mpush = jnp.where(
            keep, jnp.take(jnp.broadcast_to(R[:, None], (batch, W))
                           .reshape(BW), src), 0)
        CS = jax.lax.dynamic_update_slice(CS, cpush, (base, jnp.int32(0)))
        FS = jax.lax.dynamic_update_slice(FS, fpush, (base, jnp.int32(0)))
        MS = jax.lax.dynamic_update_slice(MS, mpush, (base,))
        return (CS, FS, MS, new_sp, total, ovf, n_it + 1)

    _, _, _, sp, total, overflow, _n = jax.lax.while_loop(
        cond, body,
        (CS, FS, MS, icum[-1], total0, jnp.bool_(False), jnp.int32(0)))
    return total, overflow | (sp > 0)


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
    """Degree-tiered root chunks — shared planner (k_clique.plan_tier_chunks).
    The hard ~128MB per-dispatch adjacency budget matters here: build_local_adj
    materializes adj twice (scan stack + transpose), and an unbudgeted hub
    chunk crashed the TPU worker at scale 16 (VERDICT r02 item 1)."""
    from gms_tpu.algorithms.k_clique import plan_tier_chunks

    yield from plan_tier_chunks(deg_all, roots_all, pad_id,
                                root_chunk=root_chunk)


def bk_count_async(nbr, rank_pad, chunks, devices=None, *,
                   core_bound: int | None = None,
                   words_budget: int = 1 << 22,
                   max_inflight: int = 12) -> int:
    """Dispatch `bk_count_chunk` for every (chunk, WW) job, round-robin
    over devices, in bounded waves. Stack capacity comes from the provable
    depth x fan-out bound under a per-dispatch WORD budget (cap·WW words —
    item counts alone let wide tiers allocate ~0.5GB each, and async-
    enqueueing hundreds of such executables aggregated past HBM: the r03
    worker crash). An overflowed chunk SPLITS its roots in half (same
    padded shape, so no recompile), then shrinks batch, then — only in the
    batch=1 DFS state, whose true need is depth_real·fan_real items —
    grows cap."""
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

    def plan(chunk, WW):
        W = 32 * WW
        fan = min(W, core_bound) if core_bound else W
        depth = fan + 2
        items_max = max(words_budget // WW, len(chunk) + depth * fan)
        batch = max(1, min(64, (items_max - len(chunk))
                           // max(depth * fan, 1)))
        cap = min(len(chunk) + depth * batch * fan, items_max)
        return batch, cap

    def dispatch(di, chunk, WW, batch, cap):
        nbr_d, rank_d = tables(di)
        d = devices[di]
        ch = jnp.asarray(chunk) if d is None else jax.device_put(
            jnp.asarray(chunk), d)
        live = ch != jnp.int32(nbr.shape[0])  # pad slots hold pad_id == v_pad
        return bk_count_chunk(nbr_d, rank_d, ch, live, w_words=WW,
                              cap=cap, batch=batch, iter_budget=1 << 17)

    total = 0
    pad_id = np.int32(nbr.shape[0])
    queue = []
    for chunk, WW in chunks:
        batch, cap = plan(chunk, WW)
        queue.append((chunk, WW, batch, cap, 0))
    while queue:
        wave, queue = queue[:max_inflight], queue[max_inflight:]
        pending = [(i % len(devices), c, WW, b, cap, r,
                    dispatch(i % len(devices), c, WW, b, cap))
                   for i, (c, WW, b, cap, r) in enumerate(wave)]
        for di, chunk, WW, batch, cap, retries, (t, ovf) in pending:
            if not bool(ovf):
                total += int(t)
                continue
            if retries > 12:
                raise RuntimeError(
                    "bk_count_chunk (direct=True) cannot finish this root "
                    "within its capacity/watchdog budgets — use the "
                    "default fused path (direct=False), which resumes")
            real = chunk[chunk != pad_id]
            if len(real) > 1:  # split roots, keep padded shape
                h = len(real) // 2
                for part in (real[:h], real[h:]):
                    sub = np.full(len(chunk), pad_id, chunk.dtype)
                    sub[: len(part)] = part
                    queue.append((sub, WW, batch, cap, retries + 1))
            elif batch > 1:  # single root: shrink batch first
                queue.append((chunk, WW, max(1, batch // 4), cap,
                              retries + 1))
            else:  # batch=1 DFS: grow cap (bounded by true depth·fan)
                queue.append((chunk, WW, 1, cap * 2, retries + 1))
    return total


# ---------------------------------------------------------------------------
# DAG-universe machinery: cover bitsets + oriented-adjacency symmetrize
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("w_words", "i_block"))
def _hub_cover_bits(dag_nbr, roots, wlists, *, w_words: int, i_block: int):
    """M[c, i, :]: bitset over root c's DAG-row universe — bit j set iff
    dag_row_c[j] ∈ N⁺(wlists[c, i]). wlists pad = SENTINEL (wvalid False)."""
    W = 32 * w_words
    C = roots.shape[0]
    Q = jnp.take(dag_nbr, roots, axis=0, mode="clip")
    Q = jax.lax.slice_in_dim(Q, 0, min(W, Q.shape[1]), axis=1)
    if Q.shape[1] < W:
        Q = jnp.concatenate(
            [Q, jnp.full((C, W - Q.shape[1]), SENTINEL, jnp.int32)], axis=1)
    qvalid = Q != SENTINEL
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    IN = wlists.shape[1]
    blocks = wlists.reshape(C, IN // i_block, i_block).transpose(1, 0, 2)

    def step(_, cols):                                     # [C, IB]
        rows = jnp.take(dag_nbr, cols, axis=0, mode="clip")
        eq = rows[:, :, None, :] == Q[:, None, :, None]
        m = jnp.any(eq, axis=3) & qvalid[:, None, :]
        packed = jnp.sum(
            m.reshape(C, i_block, w_words, 32).astype(jnp.uint32) * weights,
            axis=3, dtype=jnp.uint32)
        return None, packed

    _, mb = jax.lax.scan(step, None, blocks)               # [NB, C, IB, WW]
    M = jnp.transpose(mb, (1, 0, 2, 3)).reshape(C, IN, w_words)
    return M, wlists != SENTINEL


@functools.partial(jax.jit, static_argnames=("w_words",))
def _symmetrize_bits(adj, *, w_words: int):
    """adj[c,i,j] |= adj[c,j,i]: build_local_adj over DAG rows yields the
    ORIENTED induced adjacency (bit j set only when rank_j > rank_i); the
    Tomita recursion needs the undirected induced subgraph.

    Blocked: the bit-transpose unpacks SB rows at a time ([C, SB, W] bool),
    so peak scratch stays ~2^26 elements instead of the full [C, W, W]
    dense tensor (1GB at C=4096, W=512 — a scale-16 wide-tier hazard)."""
    W = 32 * w_words
    C = adj.shape[0]
    SB = W
    while SB > 32 and C * SB * W > (1 << 26):
        SB //= 2
    NB = W // SB
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    widx = jnp.arange(W, dtype=jnp.int32)
    shift = (widx & 31).astype(jnp.uint32)
    blocks = adj.reshape(C, NB, SB, w_words).transpose(1, 0, 2, 3)

    def step(accT, inp):
        bi, blk = inp                                      # blk [C, SB, WW]
        dense = ((jnp.take(blk, widx >> 5, axis=-1) >> shift) & 1) == 1
        dt = jnp.transpose(dense, (0, 2, 1))               # [C, W, SB]
        packed = jnp.sum(
            dt.reshape(C, W, SB // 32, 32).astype(jnp.uint32) * weights,
            axis=3, dtype=jnp.uint32)                      # [C, W, SB/32]
        accT = jax.lax.dynamic_update_slice(
            accT, packed, (jnp.int32(0), jnp.int32(0), bi * (SB // 32)))
        return accT, None

    accT, _ = jax.lax.scan(
        step, jnp.zeros((C, W, w_words), jnp.uint32),
        (jnp.arange(NB, dtype=jnp.int32), blocks))
    return adj | accT


def _indeg_sub_chunks(chunk, WW: int, indeg_all, pad_id,
                      words_budget: int = 1 << 24):
    """Split a tier chunk into sub-chunks bounded by the cover-matrix
    budget C_sub · IN_pad · WW words AND grouped by in-degree bucket, so
    IN_pad stays within 2x of every member's true in-degree. The grouping
    matters for throughput, not just memory: the leaf maximality filter
    pays IN_pad·WW words per leaf, so one hub in a chunk of low-indeg
    roots used to tax EVERY leaf of the chunk at the hub's width (the r04
    scale-13 flush regression)."""
    real = chunk[chunk != pad_id]
    if not len(real):
        return
    order = np.argsort(indeg_all[real], kind="stable")
    real = real[order]
    ind = np.maximum(indeg_all[real], 1)
    bucket_of = np.ceil(np.log2(np.maximum(ind, 32))).astype(np.int32)
    s = 0
    while s < len(real):
        e = s + 1
        while e < len(real):
            if bucket_of[e] != bucket_of[s]:
                break
            inp = max(32, int(ind[e]))
            if _bucket(e + 1 - s) * inp * WW > words_budget:
                break
            e += 1
        size = _bucket(e - s)
        sub = np.full(size, pad_id, np.int32)
        sub[: e - s] = real[s:e]
        yield sub
        s = e


# ---------------------------------------------------------------------------
# fused DAG-universe kernel: the whole per-chunk recursion in ONE dispatch
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=(
    "w_words", "cap", "batch", "push_cap", "leaf_cap", "in_block",
    "out_cap", "iter_budget", "resume"))
def bk_fused_chunk(dag_nbr, chunk, M, wvalid, state, *, w_words: int,
                   cap: int, batch: int, push_cap: int, leaf_cap: int,
                   in_block: int, out_cap: int = 0,
                   iter_budget: int = 1 << 30, resume: bool = False):
    """Count (out_cap=0) or enumerate (out_cap>0) the globally-maximal
    cliques rooted at `chunk`, entirely on device.

    dag_nbr: int32[V_pad(+1), D] oriented padded adjacency; chunk: int32[C]
    roots (pad slots hold V_pad, whose clip-gather row is all-SENTINEL);
    M/wvalid: cover bitsets from `_hub_cover_bits` ([C, IN, WW] / [C, IN]).

    A LIFO work stack of items (Cand, Fini, Rbits — uint32[WW] over the
    root's local DAG universe; root index), interleaved as ONE
    uint32[cap + push_cap, 3WW+1] array so a pop is one row gather. Each
    while_loop iteration ADAPTIVELY pops the top m <= batch items such
    that their total fan-out Σ|ext| fits `push_cap` (so every slot-wise
    op below runs at push_cap ≈ 2·batch, not batch·W — the r04 trace
    showed a batch·W-slot scatter spending 40ns on each of its ~98%
    dropped update slots, 2.8s of a 3.9s chunk):

      1. dense [B, W, WW] popcount AND → Tomita pivot, ext, has (VPU);
      2. per-item child lists compacted IN-ROW by one minor-axis sort of
         `where(has, iota, W)` (bitonic network, dense);
      3. a two-level index chain (boundary scatter of B starts + cummax,
         then [push_cap] gathers) materializes child (cand', fini', R')
         rows ONLY for real children;
      4. children split: cand' = ∅ ∧ fini' = ∅ → leaf buffer (candidate
         maximal clique), cand' ≠ ∅ → stack; both via ONE band sort
         (`_band_compact`) + contiguous dynamic_update_slices.

    Maximality filtering (a leaf D at root r is a global maximal clique
    iff no valid lower-ranked neighbor w of r covers it, D ⊆ N⁺(w))
    happens ONCE at the end over the leaf buffer, in 64k-row blocks bounded
    by the live count lp — no in-loop conditional.

    Returns (scalars int64[4] = (total, overflow, done, n_iter),
    state = (STK, sp, OUT, op, total)) — the scalars travel as ONE block
    because each host fetch pays the full ~20ms tunnel round-trip. In
    enumerate mode (out_cap > 0) the OUT rows [0:op) are (Rbits |
    root-local idx) for device decode. `overflow` means the stack or
    output exceeded capacity: results must be discarded and the chunk
    split (count-then-emit — capacity is part of the compiled shape, so
    overflow is a retry, never a wrong answer).

    RESUMABILITY (the r04 scale-14 fix): the axon TPU worker kills any
    single device program running longer than ~60s (measured: a 61s
    dispatch dies with "TPU worker process crashed", a 17s one survives —
    this is the r02/r03 "crash class"). The outer loop therefore stops
    after `iter_budget` pop rounds, flushes, and returns done=False with
    the resume state; the caller re-dispatches with resume=True and
    `state` until done. `total` accumulates ACROSS segments (pass the
    previous total back via state[4]); leaves never persist across
    segments (each segment ends flushed, lp = 0).
    """
    adj, S0 = build_local_adj(dag_nbr, chunk, w_words=w_words)
    adj = _symmetrize_bits(adj, w_words=w_words)
    live0 = chunk != jnp.int32(dag_nbr.shape[0])  # pad slots = v_pad
    return bk_stack_machine(
        adj, S0, live0, M, wvalid, state, w_words=w_words, cap=cap,
        batch=batch, push_cap=push_cap, leaf_cap=leaf_cap,
        in_block=in_block, out_cap=out_cap, iter_budget=iter_budget,
        resume=resume)


@functools.partial(jax.jit, static_argnames=(
    "w_words", "cap", "batch", "push_cap", "leaf_cap", "in_block",
    "out_cap", "iter_budget", "resume"))
def bk_stack_machine(adj, S0, live0, M, wvalid, state, *, w_words: int,
                     cap: int, batch: int, push_cap: int, leaf_cap: int,
                     in_block: int, out_cap: int = 0,
                     iter_budget: int = 1 << 30, resume: bool = False):
    """The device-resident work-stack recursion of `bk_fused_chunk`, as a
    pure function of the PREBUILT local universe: adj uint32[C, W, WW]
    symmetrized induced adjacency, S0 uint32[C, WW] initial cand bitsets,
    live0 bool[C] real-root mask, M/wvalid cover bitsets. Split out so the
    memory-scaling sharded plan (parallel/sharding.py
    VertexShardedBKPlan), whose ring streaming produces exactly these
    local arrays from table shards, reuses the identical kernel."""
    WW = w_words
    W = 32 * WW
    B = batch
    C = adj.shape[0]
    IN = M.shape[1]
    NB = IN // in_block
    PC = push_cap
    cap_total = cap + PC
    # flush block rows: shrink FB (not in_block) to the [FB, in_block, WW]
    # gather budget — per-leaf cover rows then gather at the FULL in_block
    # width, so the per-row DMA tax is amortized by KB-scale rows instead
    # of being paid NB times per leaf on 1KB rows (the r05 trace: the
    # flush was 1.2s of the 1.9s hot job at in_block=64, NB=8)
    FB = min(1 << 16, leaf_cap)
    while FB > 512 and FB * in_block * WW > (1 << 24):
        FB //= 2
    lcap = -(-(leaf_cap + PC) // FB) * FB
    emit = out_cap > 0
    ocap_total = out_cap + FB if emit else 0
    assert PC >= W and cap >= C
    K = 3 * WW + 1            # stack row: cand | fini | rbits | root
    LK = WW + 1               # leaf row: rbits | root

    below = _below_masks(W, WW)
    onehot = _onehot_masks(W, WW)
    widx = jnp.arange(W, dtype=jnp.int32)
    oiota = jnp.arange(PC, dtype=jnp.int32)

    Ms = M.reshape(C, NB, in_block, WW).transpose(1, 0, 2, 3)
    vs = wvalid.reshape(C, NB, in_block).transpose(1, 0, 2)

    if resume:
        STK, n0, OUT0, op0, total0 = state
        LBUF = jnp.zeros((lcap, LK), jnp.uint32)
        nl0 = jnp.int32(0)
    else:
        del state
        Cand0 = jnp.where(live0[:, None], S0, jnp.uint32(0))
        c0e = jnp.all(Cand0 == 0, axis=1)
        cidx = jnp.arange(C, dtype=jnp.int32)

        # stack init (one scatter): roots with work (cand nonempty)
        init_ok = live0 & ~c0e
        icum = jnp.cumsum(init_ok.astype(jnp.int32))
        n0 = icum[-1]
        STK = jnp.zeros((cap_total, K), jnp.uint32)
        row0 = jnp.concatenate(
            [Cand0, jnp.zeros((C, 2 * WW), jnp.uint32),
             cidx.astype(jnp.uint32)[:, None]], axis=1)
        STK = STK.at[_scatter_compact_dest(init_ok, icum, cap_total)].set(
            row0, mode="drop")

        # leaf-buffer init: live roots with empty DAG rows are R = ∅
        # leaves ({r} is maximal iff no lower-ranked neighbor exists —
        # the filter's R = ∅ case covers exactly that)
        leaf0_ok = live0 & c0e
        l0cum = jnp.cumsum(leaf0_ok.astype(jnp.int32))
        nl0 = l0cum[-1]
        LBUF = jnp.zeros((lcap, LK), jnp.uint32)
        lrow0 = jnp.concatenate(
            [jnp.zeros((C, WW), jnp.uint32),
             cidx.astype(jnp.uint32)[:, None]], axis=1)
        LBUF = LBUF.at[_scatter_compact_dest(leaf0_ok, l0cum, lcap)].set(
            lrow0, mode="drop")
        OUT0 = jnp.zeros((ocap_total if emit else 0, LK), jnp.uint32)
        op0 = jnp.int32(0)
        total0 = jnp.int64(0)

    fiota = jnp.arange(FB, dtype=jnp.int32)

    def flush(total, LBUF, lp, OUT, op, ovf):
        """Lower-neighbor maximality filter over live leaves, in FB-row
        blocks bounded by lp (work ∝ leaves produced, not capacity)."""

        def fcond(fst):
            return fst[0] * FB < lp

        def fbody(fst):
            fb, total, OUT, op, fovf = fst
            blk = jax.lax.dynamic_slice(
                LBUF, (fb * FB, jnp.int32(0)), (FB, LK))
            LB = jax.lax.slice_in_dim(blk, 0, WW, axis=1)
            LRc = jnp.clip(blk[:, WW].astype(jnp.int32), 0, C - 1)

            def fstep(acc, mv):
                Mb, vb = mv
                Mg = jnp.take(Mb, LRc, axis=0)             # [FB, INb, WW]
                vg = jnp.take(vb, LRc, axis=0)             # [FB, INb]
                cov = jnp.all((LB[:, None, :] & ~Mg) == 0, axis=2) & vg
                return acc | jnp.any(cov, axis=1), None

            covered, _ = jax.lax.scan(
                fstep, jnp.zeros((FB,), jnp.bool_), (Ms, vs))
            ok = ~covered & (fb * FB + fiota < lp)
            total = total + jnp.sum(ok, dtype=jnp.int64)
            if emit:
                fcum = _cumsum_i32(ok)
                n_ok = fcum[-1]
                dst = jnp.where(ok, jnp.minimum(op, out_cap) + fcum - 1,
                                jnp.int32(ocap_total))
                OUT = OUT.at[dst].set(blk, mode="drop")
                op = op + n_ok
                ovf_e = op > out_cap
            else:
                ovf_e = False
            return (fb + 1, total, OUT, op, fovf | ovf_e)

        fst = jax.lax.while_loop(
            fcond, fbody, (jnp.int32(0), total, OUT, op, ovf))
        _, total, OUT, op, ovf = fst
        return total, OUT, op, ovf

    def inner_cond(st):
        sp = st[1]
        lp = st[3]
        ovf = st[7]
        n_it = st[8]  # (st[9] = cumulative leaves_seen diagnostic)
        # stop before the leaf buffer could overflow (one more iteration
        # appends at most PC rows, lcap = leaf_cap + PC) or the segment's
        # pop-round budget runs out (axon ~60s per-dispatch watchdog)
        return ((sp > 0) & ~ovf & (lp <= leaf_cap)
                & (n_it < iter_budget))

    def body(st):
        STK, sp, LBUF, lp, OUT, op, total, ovf, n_it, lseen = st
        rpos = jnp.arange(B, dtype=jnp.int32)
        idx = sp - 1 - rpos                                   # top-first
        inb = idx >= 0
        # two-step pop: ONE contiguous dynamic_slice window + an
        # in-window gather (random-row gathers from the multi-MB stack
        # cost 0.14ms/round in the scale-13 trace; the window slice is
        # ~free). sp <= cap <= cap_total - PC, so no start clamping.
        wstart = jnp.maximum(sp - B, 0)
        win = jax.lax.dynamic_slice(STK, (wstart, jnp.int32(0)), (B, K))
        prows = jnp.take(win, jnp.clip(idx - wstart, 0, B - 1), axis=0)
        Cand = jnp.where(inb[:, None],
                         jax.lax.slice_in_dim(prows, 0, WW, axis=1),
                         jnp.uint32(0))
        Fini = jax.lax.slice_in_dim(prows, WW, 2 * WW, axis=1)
        Rb = jax.lax.slice_in_dim(prows, 2 * WW, 3 * WW, axis=1)
        R = prows[:, 3 * WW].astype(jnp.int32)
        rows = jnp.take(adj, jnp.clip(R, 0, C - 1), axis=0)   # [B, W, WW]

        # vectorized Tomita pivot over cand ∪ fini (tomita.h:11-40)
        cu = Cand | Fini
        member = ((jnp.take(cu, widx >> 5, axis=1)
                   >> (widx & 31).astype(jnp.uint32)[None, :]) & 1) == 1
        scores = jnp.sum(jax.lax.population_count(Cand[:, None, :] & rows),
                         axis=2, dtype=jnp.int32)             # [B, W]
        scores = jnp.where(member, scores, -1)
        pivot = jnp.argmax(scores, axis=1).astype(jnp.int32)
        pivot_mask = (jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
                      == pivot[:, None])
        prow = jnp.sum(jnp.where(pivot_mask[:, :, None], rows, 0), axis=1,
                       dtype=jnp.uint32)                      # [B, WW]
        ext = Cand & ~prow
        has = inb[:, None] & (((jnp.take(ext, widx >> 5, axis=1)
                                >> (widx & 31).astype(jnp.uint32)[None, :])
                               & 1) == 1)

        # adaptive pop: m = longest top prefix with Σ|ext| <= push_cap
        nc = jnp.sum(has, axis=1, dtype=jnp.int32)            # [B]
        crev = jnp.cumsum(nc)
        alive = inb & (crev <= PC)                            # prefix (>= 1)
        m = jnp.sum(alive, dtype=jnp.int32)
        base = sp - m
        has = has & alive[:, None]
        pex = jnp.where(alive, crev - nc, 0)                  # start slots
        n_child = jnp.sum(jnp.where(alive, nc, 0), dtype=jnp.int32)

        # in-row child compaction: ascending local idx of each set ext bit
        sorted_i = jnp.sort(jnp.where(has, widx[None, :], W), axis=1)

        # slot -> item map: boundary scatter + running max
        starts = jnp.zeros((PC,), jnp.int32).at[
            jnp.where(alive & (nc > 0), pex, PC)].max(rpos, mode="drop")
        b_j = jax.lax.associative_scan(jnp.maximum, starts)   # [PC]
        valid_j = oiota < n_child
        pos_j = oiota - jnp.take(pex, b_j)
        i_j = jnp.take(sorted_i.reshape(B * W),
                       jnp.clip(b_j * W + pos_j, 0, B * W - 1))

        # materialize ONLY real children
        pCand = jnp.take(Cand, b_j, axis=0)
        pFini = jnp.take(Fini, b_j, axis=0)
        pRb = jnp.take(Rb, b_j, axis=0)
        pR = jnp.take(R, b_j)
        pExt = jnp.take(ext, b_j, axis=0)
        arow = jnp.take(rows.reshape(B * W, WW),
                        jnp.clip(b_j * W + i_j, 0, B * W - 1), axis=0)
        bel = jnp.take(below, jnp.clip(i_j, 0, W - 1), axis=0)
        oh = jnp.take(onehot, jnp.clip(i_j, 0, W - 1), axis=0)
        extb = pExt & bel
        cC = (pCand & ~extb) & arow
        cF = (pFini | extb) & arow
        cR = pRb | oh
        child_blk = jnp.concatenate(
            [cC, cF, cR, pR.astype(jnp.uint32)[:, None]], axis=1)
        c_empty = jnp.all(cC == 0, axis=1)
        f_empty = jnp.all(cF == 0, axis=1)
        leaf = valid_j & c_empty & f_empty
        push = valid_j & ~c_empty

        n_leaf = jnp.sum(leaf, dtype=jnp.int32)
        n_push = jnp.sum(push, dtype=jnp.int32)
        ovf = ovf | (base + n_push > cap)
        # compaction by ONE variadic bitonic sort (key + all K row
        # columns as payloads) + contiguous dynamic_update_slices. The
        # per-row scatters this replaces cost 0.83ms (STK) + 0.33ms
        # (LBUF) per round on the scale-13 hot job — half its
        # wall-clock — and every row-granular scatter/gather/
        # searchsorted alternative pays the same per-row DMA tax; the
        # sort network moves rows through vector registers instead.
        # Band order: leaves first (band 0), pushes second (band 1),
        # dead children last — so leaves DUS at lp directly, and the
        # push band shifts down by n_leaf via a double-buffer
        # dynamic_slice (both contiguous copies). Garbage tails land
        # above the new lp / sp, where buffer semantics never read.
        band = jnp.where(leaf, oiota,
                         jnp.where(push, PC + oiota, 2 * PC + oiota))
        comp = _band_compact(band, child_blk)                 # [PC, K]
        LBUF = jax.lax.dynamic_update_slice(
            LBUF, jax.lax.slice_in_dim(comp, 2 * WW, K, axis=1),
            (lp, jnp.int32(0)))
        dbuf = jnp.concatenate(
            [comp, jnp.zeros((PC, K), jnp.uint32)], axis=0)
        shifted = jax.lax.dynamic_slice(
            dbuf, (n_leaf, jnp.int32(0)), (PC, K))
        STK = jax.lax.dynamic_update_slice(
            STK, shifted, (base, jnp.int32(0)))
        return (STK, base + n_push, LBUF, lp + n_leaf, OUT, op, total, ovf,
                n_it + 1, lseen)

    # outer loop: run the work stack until the leaf buffer is nearly full
    # (or the segment budget runs out), flush the maximality filter,
    # repeat — leaves can NEVER overflow, so a full chunk re-run on leaf
    # overflow (the r04 scale-13 regression: whole-chunk splits repeated
    # until leaves fit) cannot happen, and no per-iteration conditional is
    # paid either.
    def outer_cond(st):
        sp = st[1]
        ovf = st[7]
        n_it = st[8]
        return (sp > 0) & ~ovf & (n_it < iter_budget)

    def outer_body(st):
        st = jax.lax.while_loop(inner_cond, body, st)
        STK, sp, LBUF, lp, OUT, op, total, ovf, n_it, lseen = st
        total, OUT, op, ovf = flush(total, LBUF, lp, OUT, op, ovf)
        return (STK, sp, LBUF, jnp.int32(0), OUT, op, total, ovf, n_it,
                lseen + lp.astype(jnp.int64))

    st = (STK, n0, LBUF, nl0, OUT0, op0, total0,
          jnp.bool_(False), jnp.int32(0), jnp.int64(0))
    st = jax.lax.while_loop(outer_cond, outer_body, st)
    STK, sp, LBUF, lp, OUT, op, total, ovf, n_iter, leaves_seen = st
    leaves_seen = leaves_seen + lp.astype(jnp.int64)
    # roots-only case (outer loop never entered) or trailing leaves
    total, OUT, op, ovf = flush(total, LBUF, lp, OUT, op, ovf)
    done = (sp <= 0) | ovf
    # ONE scalar block per dispatch: each host fetch pays the full ~20ms
    # tunnel round-trip, so (total, ovf, done, n_iter, leaves_seen)
    # travel together (leaves_seen - total = filter-rejected candidates,
    # the mid-tree-pruning diagnostic)
    scalars = jnp.stack([total, ovf.astype(jnp.int64),
                         done.astype(jnp.int64),
                         n_iter.astype(jnp.int64), leaves_seen])
    return scalars, (STK, sp, OUT, op, total)


@jax.jit
def decode_clique_members(dag_nbr, chunk, out):
    """Device-side clique decode: out rows (Rbits | root-local idx) ->
    member ids.

    Returns (gid int32[L] global root ids, members int32[L, W] — the
    decoded DAG-row members, -1 in dead lanes). Replaces the per-clique
    host bit loop (VERDICT r03 weak item 8) with one vectorized gather."""
    C = chunk.shape[0]
    L, LK = out.shape
    WW = LK - 1
    W = 32 * WW
    out_bits = jax.lax.slice_in_dim(out, 0, WW, axis=1)
    out_roots = out[:, WW].astype(jnp.int32)
    gid = jnp.take(chunk, jnp.clip(out_roots, 0, C - 1))
    rows = jnp.take(dag_nbr, gid, axis=0, mode="clip")
    rows = jax.lax.slice_in_dim(rows, 0, min(W, rows.shape[1]), axis=1)
    if rows.shape[1] < W:
        rows = jnp.concatenate(
            [rows, jnp.full((L, W - rows.shape[1]), SENTINEL, jnp.int32)],
            axis=1)
    widx = jnp.arange(W, dtype=jnp.int32)
    bit = ((jnp.take(out_bits, widx >> 5, axis=1)
            >> (widx & 31).astype(jnp.uint32)[None, :]) & 1) == 1
    members = jnp.where(bit & (rows != SENTINEL), rows, -1)
    return gid, members


def _lower_neighbor_csr(g: CSRGraph, rank: np.ndarray):
    """Bulk CSR of each vertex's LOWER-ranked neighbors — one vectorized
    pass over the edge arrays (the per-root Python loop this replaces was
    ~262k iterations at RMAT-18; ADVICE r03 item 5)."""
    deg = g.degrees.astype(np.int64)
    rows = np.repeat(np.arange(g.num_nodes, dtype=np.int32), deg)
    lower = rank[g.indices] < rank[rows]
    counts = np.bincount(rows[lower], minlength=g.num_nodes).astype(np.int64)
    indptr = np.zeros(g.num_nodes + 1, np.int64)
    np.cumsum(counts, out=indptr[1:])
    cols = g.indices[lower]
    if not len(cols):  # keep device gathers well-defined on edgeless input
        cols = np.full(1, SENTINEL, np.int32)
    return indptr.astype(np.int32), np.ascontiguousarray(cols)


@functools.partial(jax.jit, static_argnames=("in_width",))
def _gather_wlists(lo_indptr, lo_cols, chunk, *, in_width: int):
    """int32[C, in_width] lower-neighbor lists for a chunk, gathered ON
    DEVICE from the bulk lower-CSR (pad = SENTINEL). The r04 host-numpy
    version of this gather was ~0.9s per scale-12 BK run — more than the
    whole fused device kernel."""
    n = lo_indptr.shape[0] - 1
    live = chunk < jnp.int32(n)
    safe = jnp.clip(chunk, 0, n - 1)
    start = jnp.take(lo_indptr, safe)
    cnt = jnp.where(live, jnp.take(lo_indptr, safe + 1) - start, 0)
    ii = jnp.arange(in_width, dtype=jnp.int32)
    idx = start[:, None] + ii[None, :]
    mask = ii[None, :] < cnt[:, None]
    vals = jnp.take(lo_cols, jnp.clip(idx, 0, lo_cols.shape[0] - 1))
    return jnp.where(mask, vals, SENTINEL)


def _bk_fused(g: CSRGraph, rank: np.ndarray, roots: np.ndarray, *,
              collect: bool = False, devices=None,
              root_chunk: int = DEFAULT_ROOT_CHUNK,
              stack_words: int = 1 << 23, out_budget: int = 1 << 17,
              max_inflight: int = 8, iter_budget: int | None = None,
              warm_only: bool = False, sink=None):
    """Count (or enumerate) maximal cliques rooted at `roots` via
    `bk_fused_chunk`, dispatched asynchronously in waves round-robin over
    `devices` (the multi-chip fan-out hook — parallel/multi.py). Returns
    (count, cliques-or-None)."""
    dag = orient.orient(g, rank)
    dpg = PaddedGraph.from_csr(dag, lane=32)
    dag_deg = np.asarray(dag.degrees)
    pad_id = np.int32(dpg.v_pad)
    lo_indptr, lo_cols = _lower_neighbor_csr(g, rank)
    indeg_all = (lo_indptr[1:] - lo_indptr[:-1]).astype(np.int32)
    devices = list(devices) if devices is not None else [None]
    placed = {}

    def table(di):
        if di not in placed:
            d = devices[di]
            arrs = (dpg.nbr, jnp.asarray(lo_indptr), jnp.asarray(lo_cols))
            placed[di] = (arrs if d is None
                          else tuple(jax.device_put(a, d) for a in arrs))
        return placed[di]

    def plan(chunk, WW):
        W = 32 * WW
        C = len(chunk)
        real = chunk[chunk != pad_id]
        mx = int(indeg_all[real].max(initial=1)) if len(real) else 1
        IN = max(32, 1 << int(np.ceil(np.log2(max(mx, 1)))))
        IB = max(1, min(IN, (1 << 27) // max(C * W * dpg.d_pad, 1)))
        IB = 1 << int(np.log2(IB))                        # divides IN
        # wide tiers carry deep hub trees: bigger pops amortize the fixed
        # per-round cost (W=128 hot job: 4.9s at 1024/2048, 4.1s at
        # 4096/8192, r04 sweep); narrow tiers stay small — their jobs are
        # sub-second and larger push_caps made per-round slot ops slower
        batch = _PLAN_OVERRIDES.get("batch", 4096 if W >= 128 else 1024)
        push_cap = max(W, _PLAN_OVERRIDES.get("push_mult", 2) * batch)
        leaf_cap = max(push_cap, (1 << 22) // (WW + 1))
        in_block = IN  # full-width cover gathers; the kernel shrinks its
        # flush block FB to hold the [FB, IN, WW] tensor budget instead
        cap = max(C, stack_words // (3 * WW + 1))
        out_cap = max(out_budget, 1 << 16) if collect else 0
        # pop rounds per dispatch: keep each device program well under the
        # axon worker's ~60s execution watchdog (measured ~0.3-1ms/round)
        ib = (iter_budget if iter_budget is not None
              else max(2048, (1 << 21) // W))
        return (IN, IB, batch, push_cap, leaf_cap, in_block, cap, out_cap,
                ib)

    _dummy = (jnp.zeros((1, 1), jnp.uint32), jnp.int32(0),
              jnp.zeros((1, 1), jnp.uint32), jnp.int32(0), jnp.int64(0))

    def dispatch(di, job):
        chunk, WW, pl, rp = job
        (IN, IB, batch, push_cap, leaf_cap, in_block, cap, out_cap,
         iter_budget) = pl
        d = devices[di]
        nbr_d, lop_d, loc_d = table(di)
        if rp is None:
            ch = jnp.asarray(chunk) if d is None else jax.device_put(
                jnp.asarray(chunk), d)
            wl = _gather_wlists(lop_d, loc_d, ch, in_width=IN)
            M, wvalid = _hub_cover_bits(nbr_d, ch, wl, w_words=WW,
                                        i_block=IB)
            state = _dummy
        else:
            (ch, M, wvalid), state, _ = rp
        res = bk_fused_chunk(
            nbr_d, ch, M, wvalid, state, w_words=WW, cap=cap, batch=batch,
            push_cap=push_cap, leaf_cap=leaf_cap, in_block=in_block,
            out_cap=out_cap, iter_budget=iter_budget,
            resume=rp is not None)
        return (chunk, WW, pl, (ch, M, wvalid), res)

    queue = []
    for tchunk, WW in _plan_root_chunks(dag_deg, roots, root_chunk, pad_id):
        for chunk in _indeg_sub_chunks(tchunk, WW, indeg_all, pad_id):
            queue.append((chunk, WW, plan(chunk, WW), None))

    if warm_only:
        # compile every executable the real run will need — including the
        # resume variants — by dispatching all-pad chunks of the real
        # shapes (n0 = 0, so each program returns immediately). This is
        # the honest warm-up for benchmark protocols (ADVICE r04 item 3:
        # warming on roots=arange(64) compiled none of the real tier
        # shapes, so most compiles landed inside the timed section).
        seen = set()
        for chunk, WW, pl, _ in queue:
            key = (len(chunk), WW, pl)
            if key in seen:
                continue
            seen.add(key)
            padc = np.full(len(chunk), pad_id, np.int32)
            _c, _w, _p, keep, res = dispatch(0, (padc, WW, pl, None))
            dispatch(0, (padc, WW, pl, (keep, res[1], 0)))
        return 0, None

    total = 0
    cliques: list[frozenset] | None = [] if collect else None
    while queue:
        wave, queue = queue[:max_inflight], queue[max_inflight:]
        pending = []
        for i, job in enumerate(wave):
            rp = job[3]
            # resume segments stay on the device holding their state
            di = rp[2] if rp is not None else i % len(devices)
            pending.append((di, dispatch(di, job)))
        # batched fetch: ALL wave scalar blocks in one device_get
        scalar_blocks = jax.device_get([res[0] for _, (_, _, _, _, res)
                                        in pending])
        for (di, (chunk, WW, pl, keep, res)), sc in zip(pending,
                                                        scalar_blocks):
            total_j, ovf_a, done_a, _n_iter = (int(sc[0]), bool(sc[1]),
                                               bool(sc[2]), int(sc[3]))
            state = res[1]
            if ovf_a:
                real = chunk[chunk != pad_id]
                if len(real) > 1:             # split roots, same shape
                    h = len(real) // 2
                    for part in (real[:h], real[h:]):
                        sub = np.full(len(chunk), pad_id, chunk.dtype)
                        sub[: len(part)] = part
                        queue.append((sub, WW, pl, None))
                else:                         # single root: grow caps
                    (IN, IB, batch, push_cap, leaf_cap, in_block, cap,
                     out_cap, iter_budget) = pl
                    pl2 = (IN, IB, batch, push_cap, leaf_cap, in_block,
                           cap * 2, out_cap * 2 if out_cap else 0,
                           iter_budget)
                    queue.append((chunk, WW, pl2, None))
                continue
            if not done_a:                    # segment budget hit: resume
                queue.append((chunk, WW, pl, (keep, state, di)))
                continue
            total += total_j
            if collect:
                n_out = int(state[3])
                gid, members = (np.asarray(a) for a in
                                decode_clique_members(
                                    table(di)[0], keep[0], state[2]))
                if sink is not None:
                    # STREAMED enumerate (VERDICT r04 item 9): hand the
                    # decoded chunk arrays to the caller incrementally —
                    # no per-clique Python objects, so the 165M-clique
                    # graphs the count path handles stay enumerable
                    if n_out:
                        sink(gid[:n_out], members[:n_out])
                else:
                    for l in range(n_out):
                        ms = members[l]
                        cliques.append(
                            frozenset([int(gid[l]), *ms[ms >= 0].tolist()]))
    return total, cliques


def bron_kerbosch(
    g: CSRGraph,
    *,
    rank: np.ndarray | None = None,
    ordering: str = "degeneracy",
    root_chunk: int = DEFAULT_ROOT_CHUNK,
    collect: bool = False,
    roots: np.ndarray | None = None,
    collect_budget: int = 1 << 17,
    hub_threshold: int = 1024,
    direct: bool = False,
    warm_compile: bool = False,
    sink=None,
):
    """Enumerate/count all maximal cliques of the undirected graph g.

    ordering ∈ {"degeneracy", "adg", "degree", "id"} — the reference's
    BK-GMS-{DEG, ADG, DGR, SG} variants (bron_kerbosch.h:16-52,
    maximal_clique_enum_bron_kerbosch.cc:31-93).

    Returns count (int) if collect=False, else (count, list[frozenset[int]]).
    roots limits the Eppstein root set (each maximal clique is reported at
    its lowest-ranked member, so disjoint root sets sum exactly — the
    device-parallel fan-out hook, parallel/multi.py). direct=True runs the
    full-neighborhood cand/fini work stack (`bk_count_chunk`) for roots
    below `hub_threshold` (fenced to <= 1024: wider direct tiers crashed
    the TPU worker, VERDICT r03 weak item 2) with the rest on the fused
    DAG-universe path; the default is the fused path for everything.
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
    rank = np.asarray(rank)

    roots_all = (np.arange(n, dtype=np.int32) if roots is None
                 else np.asarray(roots, dtype=np.int32))

    if warm_compile:
        # compile (only) every kernel variant the real run needs; see
        # _bk_fused warm_only. Returns 0.
        _bk_fused(g, rank, roots_all, collect=collect,
                  root_chunk=root_chunk, warm_only=True)
        return (0, []) if collect else 0

    if not direct or collect:
        # fused DAG-universe path (collect mode is only implemented here).
        # sink(gid int32[L], members int32[L, W]) streams decoded clique
        # chunks to the caller (members -1-padded; the clique is
        # {gid[l]} ∪ members[l][members[l] >= 0]); with a sink, the
        # returned clique list is None.
        t, cl = _bk_fused(g, rank, roots_all, collect=collect,
                          root_chunk=root_chunk, out_budget=collect_budget,
                          sink=sink)
        return (t, None if sink is not None else cl) if collect else t

    # direct=True count: full-neighborhood cand/fini work stack for narrow
    # roots; wide roots (deg > hub_threshold, fenced <= 1024) go fused
    hub_threshold = min(hub_threshold, 1024)
    deg_all = g.degrees
    hub_sel = deg_all[roots_all] > hub_threshold
    hub_roots = roots_all[hub_sel]
    roots_all = roots_all[~hub_sel]
    total = 0
    if len(hub_roots):
        total, _ = _bk_fused(g, rank, hub_roots, root_chunk=root_chunk)

    pg = PaddedGraph.from_csr(g, lane=32)
    rank_pad = np.full(pg.v_pad + 1, np.int32(np.iinfo(np.int32).max))
    rank_pad[:n] = rank
    pad_id = np.int32(pg.v_pad)
    e = g.edge_array()
    higher = rank[e[:, 1]] > rank[e[:, 0]]
    core_bound = int(np.bincount(e[:, 0][higher], minlength=n)
                     .max(initial=1))
    return total + bk_count_async(
        pg.nbr, jnp.asarray(rank_pad),
        _plan_root_chunks(deg_all, roots_all, root_chunk, pad_id),
        core_bound=core_bound)


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
