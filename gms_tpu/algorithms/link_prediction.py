"""Link prediction (Liben-Nowell-Kleinberg) — train/test split, AUC,
precision/recall, top-q ranking.

Role of gms/algorithms/set_based/link_prediction/:
  * EdgeSampler (edge_sampler.h:24-155): cumulative-degree inverse-CDF edge
    sampling + complement (non-edge) sampling. Sampling a uniform directed
    CSR slot makes every undirected edge equally likely — here that is a
    direct uniform choice over the undirected edge array; complement
    sampling is vectorized batch rejection.
  * extract_random_test_edges (evaluation.h:32-83): uniform test-edge
    extraction (the reference's rejection/rebuild loop realizes the same
    without-replacement uniform distribution).
  * add_false_links (evaluation.h:184-200): replace true edges by non-edges.
  * score_link_prediction_precision (evaluation.h:99-124): TP/|pred|, TP/P.
  * score_link_prediction_auc (evaluation.h:137-174): sampled
    (higher + 0.5 * equal) / trials with similarity on the train graph.
  * link_prediction_similarity (link_prediction.h:42-101): top-q scan over
    ALL non-edges — here the MXU all-pairs engine, row-block chunked, with
    per-block top-k merged on host.

Exact-count semantics: scores are float32 on device; AUC comparisons use the
same scores for both edges so ordering is self-consistent.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gms_tpu.graphs.csr import CSRGraph, _csr_from_sorted_pairs
from gms_tpu.graphs.tiles import PaddedGraph, round_up
from gms_tpu.algorithms.similarity import (
    pair_scores, all_pairs_scores, _deg_lookup, METRICS,
)


def _csr_from_undirected(edges_uv: np.ndarray, num_nodes: int) -> CSRGraph:
    """Build symmetric CSR from unique (u < v) undirected edges."""
    if len(edges_uv) == 0:
        return CSRGraph(np.zeros(num_nodes + 1, np.int64), np.zeros(0, np.int32))
    both = np.concatenate([edges_uv, edges_uv[:, ::-1]])
    order = np.lexsort((both[:, 1], both[:, 0]))
    return _csr_from_sorted_pairs(both[order], num_nodes, directed=False)


def _edge_key(e: np.ndarray, n: int) -> np.ndarray:
    return e[:, 0].astype(np.int64) * n + e[:, 1]


def extract_random_test_edges(
    g: CSRGraph, test_edges_required: int, *, seed: int = 0
) -> tuple[CSRGraph, CSRGraph]:
    """Uniformly split off test edges; returns (g_train, g_test)."""
    und = g.undirected_edge_array()
    m = len(und)
    if test_edges_required > m:
        raise ValueError("not enough edges for requested test split")
    rng = np.random.default_rng(seed)
    pick = rng.choice(m, size=test_edges_required, replace=False)
    mask = np.zeros(m, dtype=bool)
    mask[pick] = True
    return (
        _csr_from_undirected(und[~mask], g.num_nodes),
        _csr_from_undirected(und[mask], g.num_nodes),
    )


def sample_non_edges(
    g: CSRGraph, count: int, *, seed: int = 0, forbid: CSRGraph | None = None
) -> np.ndarray:
    """Uniform non-edges of g (batch rejection), optionally also not in
    `forbid` — EdgeSampler::sample_complement role."""
    n = g.num_nodes
    keys = set(_edge_key(g.undirected_edge_array(), n).tolist())
    if forbid is not None:
        keys |= set(_edge_key(forbid.undirected_edge_array(), n).tolist())
    rng = np.random.default_rng(seed)
    out = np.empty((count, 2), dtype=np.int32)
    got = 0
    while got < count:
        batch = max(64, 2 * (count - got))
        uv = rng.integers(0, n, size=(batch, 2))
        uv = np.sort(uv, axis=1)
        ok = uv[:, 0] != uv[:, 1]
        uv = uv[ok]
        k = _edge_key(uv, n)
        fresh = np.array([kk not in keys for kk in k])
        uv = uv[fresh]
        take = min(len(uv), count - got)
        out[got : got + take] = uv[:take]
        got += take
    return out


def add_false_links(
    g_train: CSRGraph, mutations: int, g_test: CSRGraph, *, seed: int = 42
) -> CSRGraph:
    """Replace `mutations` random train edges with random non-edges
    (evaluation.h:184-200)."""
    und = g_train.undirected_edge_array()
    rng = np.random.default_rng(seed)
    remove = rng.choice(len(und), size=mutations, replace=False)
    keep = np.ones(len(und), dtype=bool)
    keep[remove] = False
    create = sample_non_edges(g_train, mutations, seed=seed + 1, forbid=g_test)
    new = np.concatenate([und[keep], create.astype(und.dtype)])
    new = np.unique(new, axis=0)
    return _csr_from_undirected(new, g_train.num_nodes)


def score_precision_recall(
    predicted: np.ndarray, g_true: CSRGraph
) -> tuple[float, float]:
    """(precision, recall) of predicted (u < v) edges vs g_true's edges."""
    n = g_true.num_nodes
    true_keys = set(_edge_key(g_true.undirected_edge_array(), n).tolist())
    pred = np.asarray(predicted)
    pred = np.sort(pred, axis=1)
    tp = sum(1 for k in _edge_key(pred, n).tolist() if k in true_keys)
    precision = tp / max(len(pred), 1)
    recall = tp / max(len(true_keys), 1)
    return precision, recall


def score_auc(
    g_true: CSRGraph,
    g_train: CSRGraph,
    g_test: CSRGraph,
    num_trials: int,
    *,
    metric: str = "jaccard",
    seed: int = 0,
) -> float:
    """Sampled AUC (evaluation.h:137-174): P(score(true) > score(false)) +
    0.5 * P(equal), scores computed on the TRAIN graph."""
    test_und = g_test.undirected_edge_array()
    if len(test_und) == 0:
        raise ValueError("empty test graph")
    rng = np.random.default_rng(seed)
    true_edges = test_und[rng.integers(0, len(test_und), size=num_trials)]
    false_edges = sample_non_edges(g_true, num_trials, seed=seed + 1, forbid=g_test)

    pg = PaddedGraph.from_csr(g_train)
    deg1 = _deg_lookup(pg)
    st = np.asarray(pair_scores(
        pg.nbr, deg1, jnp.asarray(true_edges.astype(np.int32)), metric=metric))
    sf = np.asarray(pair_scores(
        pg.nbr, deg1, jnp.asarray(false_edges.astype(np.int32)), metric=metric))
    higher = np.sum(st > sf)
    equal = np.sum(st == sf)
    return float((higher + 0.5 * equal) / num_trials)


def link_prediction_similarity(
    g: CSRGraph, q_best: int, *, metric: str = "jaccard", block: int = 256
) -> tuple[np.ndarray, np.ndarray]:
    """Top-q non-edges by similarity (link_prediction.h:42-101).

    Returns (edges int32[q', 2] with u < v, scores float32[q']) sorted by
    score descending (ties by (u, v) ascending). q' <= q_best drops
    never-scored slots exactly like the reference's resize (:84-92).
    """
    n = g.num_nodes
    if n == 0:
        return np.zeros((0, 2), np.int32), np.zeros(0, np.float32)
    # dense {0,1} adjacency rows (bf16 feeds the MXU; exact for 0/1)
    dense = np.zeros((n, round_up(n, 128)), dtype=np.float32)
    e = g.edge_array()
    dense[e[:, 0], e[:, 1]] = 1.0
    adj_all = jnp.asarray(dense, dtype=jnp.bfloat16)
    deg_all = jnp.asarray(g.degrees)

    best_scores = np.full(q_best, -np.inf, np.float32)
    best_edges = np.zeros((q_best, 2), np.int32)
    for start in range(0, n, block):
        stop = min(start + block, n)
        s = np.asarray(all_pairs_scores(
            adj_all[start:stop], deg_all[start:stop], adj_all[:n], deg_all,
            metric=metric,
        ))[:, :n]
        u_ids = np.arange(start, stop)[:, None]
        v_ids = np.arange(n)[None, :]
        # only non-edges with u < v
        invalid = (v_ids <= u_ids) | (dense[start:stop, :n] > 0)
        s = np.where(invalid, -np.inf, s)
        flat = s.ravel()
        k = min(q_best, flat.size)
        idx = np.argpartition(flat, -k)[-k:]
        cand_scores = np.concatenate([best_scores, flat[idx]])
        cand_edges = np.concatenate([
            best_edges,
            np.stack([np.broadcast_to(u_ids, s.shape).ravel()[idx],
                      np.broadcast_to(v_ids, s.shape).ravel()[idx]], axis=1)
            .astype(np.int32),
        ])
        order = np.lexsort((cand_edges[:, 1], cand_edges[:, 0], -cand_scores))
        best_scores = cand_scores[order[:q_best]]
        best_edges = cand_edges[order[:q_best]]
    keep = best_scores > -np.inf
    return best_edges[keep], best_scores[keep]
