"""Graph coloring — Jones-Plassmann / Johansson / greedy, TPU-native.

Role of gms/algorithms/non_set_based/coloring/ (3,498 LoC):
  * Jones-Plassmann v1-v4 (coloring_jones_v1.h:17-60+ and variants) — the
    reference's four versions differ only in inter-thread scheduling
    (lock-free MPSC queues vs barriers); on TPU there is ONE natural form:
    whole-frontier rounds. Each round, every uncolored vertex whose priority
    beats all uncolored neighbors takes the smallest color absent from its
    neighborhood (mex) — pure masked VPU work, no queues.
  * Johansson randomized (coloring_johansson.h): each round, every uncolored
    vertex picks a uniformly random color from its available palette
    [0, deg]; keeps it iff no conflicting neighbor pick.
  * sequential greedy (coloring_sequential.h) — host oracle.
  * verifiers (coloring_common.h:28-205: GCVerifier{Weak,Degree,MaxColor,
    DeltaPlusOne[Weak]}, uniqueColorsCount).

mex over neighbor colors uses color-bitmask words: scatter each neighbor's
color bit, then find the first zero bit — O(D + Δ/32) per vertex per round,
all batched.

Both parallel algorithms finish in O(log n) expected rounds; every round is
one jitted device step over the whole padded graph.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from gms_tpu.graphs.csr import CSRGraph
from gms_tpu.graphs.tiles import PaddedGraph, SENTINEL

UNCOLORED = jnp.int32(-1)


def _color_words(max_colors: int) -> int:
    return (max_colors + 31) // 32


@functools.partial(jax.jit, static_argnames=("cw",))
def _jp_round(nbr, deg, colors, priority, *, cw: int):
    """One Jones-Plassmann round over all vertices.

    colors int32[V_pad] (-1 = uncolored), priority: uint32[V_pad] distinct.
    Returns updated colors.
    """
    V, D = nbr.shape
    uncolored = colors == UNCOLORED
    # neighbor gather (clip SENTINEL to a pad row that is always colored=..)
    ncol = jnp.take(colors, nbr, axis=0, mode="clip")          # [V, D]
    nprio = jnp.take(priority, nbr, axis=0, mode="clip")
    nunc = jnp.take(uncolored, nbr, axis=0, mode="clip")
    valid = nbr != SENTINEL
    rival = valid & nunc
    # strict priority win (ties impossible: priorities are a permutation)
    wins = uncolored & ~jnp.any(rival & (nprio > priority[:, None]), axis=1)

    # mex over colored neighbors' colors via bit words
    c = jnp.where(valid & (ncol >= 0), ncol, 32 * cw)          # invalid -> overflow
    word_idx = jnp.minimum(c >> 5, cw)                          # [V, D]
    bit = jnp.where(c < 32 * cw,
                    jnp.uint32(1) << (c.astype(jnp.uint32) & 31), jnp.uint32(0))
    onehot = jax.nn.one_hot(word_idx, cw, dtype=jnp.uint32)     # [V, D, cw]
    used = jax.lax.reduce(onehot * bit[:, :, None], jnp.uint32(0),
                          jax.lax.bitwise_or, (1,))             # [V, cw]
    free = ~used
    # index of first set bit across words
    nz = free != 0
    first_word = jnp.argmax(nz, axis=1)
    word = jnp.take_along_axis(free, first_word[:, None], axis=1)[:, 0]
    lsb = word & (~word + 1)
    bitpos = 31 - jax.lax.clz(lsb)
    mex = (first_word * 32 + bitpos).astype(jnp.int32)
    return jnp.where(wins, mex, colors)


@jax.jit
def _johansson_round(nbr, deg, colors, key):
    """One Johansson round: every uncolored v picks uniformly from
    [0, deg(v)]; keeps the pick iff no neighbor holds/picked the same value
    (colored neighbors' "pick" is their color)."""
    V, D = nbr.shape
    uncolored = colors == UNCOLORED
    pick = jax.random.randint(key, (V,), 0, deg + 1, dtype=jnp.int32)
    pick = jnp.where(uncolored, pick, colors)
    npick = jnp.take(pick, nbr, axis=0, mode="clip")
    valid = nbr != SENTINEL
    conflict = jnp.any(valid & (npick == pick[:, None]), axis=1)
    return jnp.where(uncolored & ~conflict, pick, colors)


def jones_plassmann(
    g: CSRGraph, *, priority: str = "random", seed: int = 0, max_rounds: int | None = None
) -> np.ndarray:
    """Jones-Plassmann coloring; returns int32[n] colors (0-based).

    priority ∈ {"random", "degree", "id"}; "degree" = largest-degree-first
    (ties by id) — the LF heuristic the reference's JP variants support.
    """
    n = g.num_nodes
    if n == 0:
        return np.zeros(0, np.int32)
    pg = PaddedGraph.from_csr(g)
    rng = np.random.default_rng(seed)
    if priority == "random":
        pr = rng.permutation(n).astype(np.uint32)
    elif priority == "degree":
        pr = np.argsort(np.lexsort((-np.arange(n), g.degrees))).astype(np.uint32)
    elif priority == "id":
        pr = (n - 1 - np.arange(n)).astype(np.uint32)
    else:
        raise ValueError(priority)
    pr_pad = np.zeros(pg.v_pad, np.uint32)
    pr_pad[:n] = pr + 1  # padded rows get priority 0: never win, stay colored
    colors = jnp.concatenate([
        jnp.full(n, UNCOLORED, jnp.int32),
        jnp.zeros(pg.v_pad - n, jnp.int32),  # pad rows "colored" (deg 0, inert)
    ])
    cw = _color_words(int(pg.deg.max()) + 2 if n else 1)
    prio = jnp.asarray(pr_pad)
    rounds = 0
    limit = max_rounds or 4 * int(np.ceil(np.log2(n + 2))) + 64
    while bool(jnp.any(colors[:n] == UNCOLORED)):
        colors = _jp_round(pg.nbr, pg.deg, colors, prio, cw=cw)
        rounds += 1
        if rounds > limit:  # JP always progresses; this guards a logic bug
            raise RuntimeError("jones_plassmann failed to converge")
    return np.asarray(colors[:n])


def johansson(g: CSRGraph, *, seed: int = 0) -> np.ndarray:
    """Johansson randomized (deg+1)-coloring; returns int32[n]."""
    n = g.num_nodes
    if n == 0:
        return np.zeros(0, np.int32)
    pg = PaddedGraph.from_csr(g)
    colors = jnp.concatenate([
        jnp.full(n, UNCOLORED, jnp.int32),
        jnp.zeros(pg.v_pad - n, jnp.int32),
    ])
    key = jax.random.key(seed)
    rounds = 0
    while bool(jnp.any(colors[:n] == UNCOLORED)):
        key, sub = jax.random.split(key)
        colors = _johansson_round(pg.nbr, pg.deg, colors, sub)
        rounds += 1
        if rounds > 64 * (int(np.log2(n + 2)) + 8):
            raise RuntimeError("johansson failed to converge")
    return np.asarray(colors[:n])


def greedy_sequential(g: CSRGraph, order: np.ndarray | None = None) -> np.ndarray:
    """Host greedy in the given order (coloring_sequential.h role); oracle."""
    n = g.num_nodes
    colors = np.full(n, -1, np.int64)
    if order is None:
        order = np.arange(n)
    for v in order:
        used = {colors[w] for w in g.out_neigh(int(v))}
        c = 0
        while c in used:
            c += 1
        colors[v] = c
    return colors.astype(np.int32)


# ---------------------------------------------------------------------------
# verifiers (coloring_common.h:28-205)
# ---------------------------------------------------------------------------

def verify_coloring(g: CSRGraph, colors: np.ndarray) -> bool:
    """GCVerifierWeak: proper (no edge monochromatic) and all colored."""
    colors = np.asarray(colors)
    if (colors < 0).any():
        return False
    e = g.edge_array()
    return not np.any(colors[e[:, 0]] == colors[e[:, 1]])


def verify_degree_bound(g: CSRGraph, colors: np.ndarray) -> bool:
    """GCVerifierDegree: color(v) <= deg(v) for all v."""
    return bool(np.all(np.asarray(colors) <= g.degrees))


def verify_delta_plus_one(g: CSRGraph, colors: np.ndarray) -> bool:
    """GCVerifierDeltaPlusOne: #colors <= Δ+1."""
    return unique_colors_count(colors) <= g.max_degree + 1


def unique_colors_count(colors: np.ndarray) -> int:
    return int(len(np.unique(np.asarray(colors))))
