"""Vertex similarity metrics — batched pair kernels + MXU all-pairs path.

Role of gms/algorithms/set_based/vertex_similarity/vertex_similarity.h:
seven metrics behind one dispatch (Metric enum :18, dispatch :201-221).
Reference semantics preserved exactly (documented quirks included):
  * Jaccard (:30-37): both sets empty -> 1.0; else c / (|A| + |B| + c).
    NOTE the denominator is NOT the standard |A|+|B|-c — conformance
    replicates the reference (SURVEY.md §7 "Nonstandard reference
    semantics"); `jaccard_standard` provides the textbook version.
  * Overlap (:63-66): c / min(|A|,|B|) — 0/0 -> NaN exactly as C++.
  * AdamicAdar (:95-106): Σ_{w ∈ A∩B} 1/ln(deg w) — deg w == 1 gives +inf,
    as in the reference.
  * Resource (:117-126), CommonNeighbors (:138-142), TotalNeighbors
    (:154-158), PreferentialAttachment (:168-171).

TPU-first design, two regimes:
  * `pair_scores` — a batch of (u, v) pairs: membership mask over padded
    rows (VPU), weighted sums for AA/RA. Unit of work = a shard of pairs.
  * `all_pairs_scores` — similarity of one row-block against ALL vertices
    via MXU matmuls on the {0,1} adjacency: common-neighbor counts are
    A_blk @ A^T with float32 accumulation (exact for counts < 2^24); AA/RA
    are the same matmul with column weights. This is the link-prediction
    scan engine (reference link_prediction.h:42-101 iterates all non-edges).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from gms_tpu.graphs.csr import CSRGraph
from gms_tpu.graphs.tiles import PaddedGraph, SENTINEL
from gms_tpu.sets import ops

METRICS = (
    "jaccard", "overlap", "adamic_adar", "resource",
    "common_neighbors", "total_neighbors", "preferential_attachment",
)


def _deg_lookup(pg: PaddedGraph):
    """deg with one trailing slot so SENTINEL clip-gathers return 0."""
    d = jnp.concatenate([pg.deg, jnp.zeros(1, jnp.int32)])
    return d


@functools.partial(jax.jit, static_argnames=("metric", "method"))
def pair_scores(nbr, deg1, pairs, *, metric: str, method: str = "auto",
                nbr_b=None):
    """float32[B] similarity for pairs int32[B, 2] over padded adjacency.

    deg1: int32[V_pad + 1] degree lookup (last slot 0, absorbs clip).
    nbr_b: optional second table for the v side — callers that order each
    pair smaller-degree-first can pass narrower/wider column slices so
    the membership test costs deg_small·log(deg_large) instead of
    D_pad·log(D_pad) (every metric here is symmetric in (u, v)).
    """
    a = jnp.take(nbr, pairs[:, 0], axis=0, mode="clip")
    b = jnp.take(nbr if nbr_b is None else nbr_b, pairs[:, 1], axis=0,
                 mode="clip")
    ca = jnp.take(deg1, pairs[:, 0], mode="clip").astype(jnp.float32)
    cb = jnp.take(deg1, pairs[:, 1], mode="clip").astype(jnp.float32)
    m = ops.member(a, b, method=method)                       # [B, D]
    return _finish_metric(metric, m, a, ca, cb, deg1)


def _finish_metric(metric: str, m, a, ca, cb, deg1):
    """Reference metric formulas from the membership mask `m` over the
    u-side row `a` (vertex_similarity.h:29-187 semantics, quirks intact)."""
    c = jnp.sum(m, axis=1, dtype=jnp.int32).astype(jnp.float32)
    if metric == "jaccard":
        both_empty = (ca == 0) & (cb == 0)
        return jnp.where(both_empty, 1.0, c / (ca + cb + c))
    if metric == "overlap":
        return c / jnp.minimum(ca, cb)
    if metric == "common_neighbors":
        return c
    if metric == "total_neighbors":
        return ca + cb - c
    if metric == "preferential_attachment":
        return ca * cb
    if metric in ("adamic_adar", "resource"):
        wdeg = jnp.take(deg1, jnp.minimum(a, deg1.shape[0] - 1), mode="clip")
        wdeg = wdeg.astype(jnp.float32)
        w = 1.0 / jnp.log(wdeg) if metric == "adamic_adar" else 1.0 / wdeg
        return jnp.sum(jnp.where(m, w, 0.0), axis=1)
    raise ValueError(f"unknown metric {metric!r}")


@functools.partial(jax.jit, static_argnames=("metric", "vw"))
def pair_scores_hub(nbr_a, deg1, bm_flat, hub_idx, pairs, *, metric: str,
                    vw: int):
    """pair_scores for pairs whose v side is a HUB: membership of each
    u-row element is ONE bit test in the hub's id-space bitmap (bm_flat:
    uint32[H * vw] packed rows, hub_idx: int32[V_pad + 1] hub slot of v)
    instead of a log(deg_v)-pass binary search — the degree-biased AUC
    sample concentrates on hub x hub pairs, which made the searchsorted
    path ~50x slower than this (r04 LP bench)."""
    a = jnp.take(nbr_a, pairs[:, 0], axis=0, mode="clip")     # [B, Da]
    ca = jnp.take(deg1, pairs[:, 0], mode="clip").astype(jnp.float32)
    cb = jnp.take(deg1, pairs[:, 1], mode="clip").astype(jnp.float32)
    h = jnp.take(hub_idx, pairs[:, 1], mode="clip")           # [B]
    valid = a != SENTINEL
    aw = jnp.clip(a, 0, 32 * vw - 1)
    widx = h[:, None] * vw + (aw >> 5)
    words = jnp.take(bm_flat, jnp.clip(widx, 0, bm_flat.shape[0] - 1))
    m = (((words >> (aw & 31).astype(jnp.uint32)) & 1) == 1) & valid
    return _finish_metric(metric, m, a, ca, cb, deg1)


@functools.partial(jax.jit, static_argnames=("metric",))
def all_pairs_scores(adj_blk, deg_blk, adj_all, deg_all, *, metric: str):
    """float32[Bu, V]: metric between each block row and every vertex.

    adj_blk: float32/bf16[Bu, V] 0/1 rows of the block's vertices
    adj_all: [V, V] 0/1 adjacency (or a column-sharded slice)
    Counts accumulate in float32 (exact below 2^24) on the MXU.
    """
    common = jnp.dot(adj_blk, adj_all.T, preferred_element_type=jnp.float32)
    ca = deg_blk[:, None].astype(jnp.float32)
    cb = deg_all[None, :].astype(jnp.float32)
    if metric == "jaccard":
        both_empty = (ca == 0) & (cb == 0)
        return jnp.where(both_empty, 1.0, common / (ca + cb + common))
    if metric == "overlap":
        return common / jnp.minimum(ca, cb)
    if metric == "common_neighbors":
        return common
    if metric == "total_neighbors":
        return ca + cb - common
    if metric == "preferential_attachment":
        return jnp.broadcast_to(ca * cb, common.shape)
    if metric in ("adamic_adar", "resource"):
        d = deg_all.astype(jnp.float32)
        w = 1.0 / jnp.log(d) if metric == "adamic_adar" else 1.0 / d
        # padded columns (deg 0) and deg-1 columns would inject inf/nan into
        # the matmul (0 * inf = nan); weight them 0 here and restore the
        # reference's +inf (deg-1 common neighbor, AA only) via a second
        # count matmul.
        finite = jnp.isfinite(w) & (d > 0)
        w0 = jnp.pad(jnp.where(finite, w, 0.0), (0, adj_blk.shape[1] - d.shape[0]))
        s = jnp.dot(adj_blk.astype(jnp.float32) * w0[None, :], adj_all.T,
                    preferred_element_type=jnp.float32)
        if metric == "adamic_adar":
            inf_col = jnp.pad((d == 1).astype(adj_blk.dtype),
                              (0, adj_blk.shape[1] - d.shape[0]))
            n_inf = jnp.dot(adj_blk * inf_col[None, :], adj_all.T,
                            preferred_element_type=jnp.float32)
            s = jnp.where(n_inf > 0, jnp.inf, s)
        return s
    raise ValueError(f"unknown metric {metric!r}")


def jaccard_standard(nbr, deg1, pairs, *, method: str = "auto"):
    """Textbook Jaccard c / (|A| + |B| - c) (NOT the reference's variant)."""
    a = jnp.take(nbr, pairs[:, 0], axis=0, mode="clip")
    b = jnp.take(nbr, pairs[:, 1], axis=0, mode="clip")
    ca = jnp.take(deg1, pairs[:, 0], mode="clip").astype(jnp.float32)
    cb = jnp.take(deg1, pairs[:, 1], mode="clip").astype(jnp.float32)
    c = ops.intersect_count(a, b, method=method).astype(jnp.float32)
    return jnp.where((ca == 0) & (cb == 0), 1.0, c / (ca + cb - c))


def vertex_similarity(g: CSRGraph, pairs: np.ndarray, metric: str) -> np.ndarray:
    """Host convenience: scores for int pairs on an undirected CSR graph."""
    pg = PaddedGraph.from_csr(g)
    deg1 = _deg_lookup(pg)
    return np.asarray(
        pair_scores(pg.nbr, deg1, jnp.asarray(np.asarray(pairs, np.int32)),
                    metric=metric)
    )


# ---------------------------------------------------------------------------
# host oracle (independent recount of each metric)
# ---------------------------------------------------------------------------

def vertex_similarity_oracle(g: CSRGraph, pairs, metric: str) -> np.ndarray:
    rows = [set(g.out_neigh(v).tolist()) for v in range(g.num_nodes)]
    deg = g.degrees
    out = np.zeros(len(pairs), dtype=np.float64)
    for i, (u, v) in enumerate(np.asarray(pairs)):
        A, B = rows[int(u)], rows[int(v)]
        c = len(A & B)
        if metric == "jaccard":
            out[i] = 1.0 if not A and not B else c / (len(A) + len(B) + c)
        elif metric == "overlap":
            with np.errstate(invalid="ignore"):
                out[i] = np.float64(c) / min(len(A), len(B))
        elif metric == "common_neighbors":
            out[i] = c
        elif metric == "total_neighbors":
            out[i] = len(A | B)
        elif metric == "preferential_attachment":
            out[i] = len(A) * len(B)
        elif metric == "adamic_adar":
            with np.errstate(divide="ignore"):
                out[i] = sum(1.0 / np.log(deg[w]) for w in A & B)
        elif metric == "resource":
            out[i] = sum(1.0 / deg[w] for w in A & B)
        else:
            raise ValueError(metric)
    return out
