"""Vertex similarity + link prediction conformance vs host oracles."""

import numpy as np
import pytest

from gms_tpu.algorithms import link_prediction as lp
from gms_tpu.algorithms import similarity as vs
from gms_tpu.io.builder import build_csr

from conftest import random_graph

ALL_METRICS = list(vs.METRICS)


def make_pairs(n, count, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, n, size=(count, 2)).astype(np.int32)


@pytest.mark.parametrize("metric", ALL_METRICS)
def test_pair_scores_vs_oracle(metric):
    g = build_csr(random_graph(40, 0.2, 1), num_nodes=40)
    pairs = make_pairs(40, 200, 2)
    got = vs.vertex_similarity(g, pairs, metric)
    want = vs.vertex_similarity_oracle(g, pairs, metric)
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-5,
                               equal_nan=True)


def test_jaccard_reference_quirks():
    # both-empty -> 1.0 (vertex_similarity.h:31-33)
    g = build_csr(np.array([[0, 1]], dtype=np.int64), num_nodes=4)
    got = vs.vertex_similarity(g, np.array([[2, 3]]), "jaccard")
    assert got[0] == 1.0
    # denominator includes +c, not -c: N(0)={1}, N(1)={0} -> c=0 -> 0.0
    got = vs.vertex_similarity(g, np.array([[0, 1]]), "jaccard")
    assert got[0] == 0.0


def test_adamic_adar_deg1_inf():
    # deg(w)==1 -> 1/log(1) = +inf, matching C++ (vertex_similarity.h:100-103);
    # only reachable via a self-pair (a common neighbor of two distinct
    # vertices always has degree >= 2)
    g = build_csr(np.array([[0, 2], [1, 2]], dtype=np.int64), num_nodes=3)
    got = vs.vertex_similarity(g, np.array([[2, 2]]), "adamic_adar")
    assert np.isinf(got[0])


@pytest.mark.parametrize("metric", ALL_METRICS)
def test_all_pairs_matches_pair_scores(metric):
    n = 30
    g = build_csr(random_graph(n, 0.25, 3), num_nodes=n)
    import jax.numpy as jnp
    from gms_tpu.graphs.tiles import round_up

    dense = np.zeros((n, round_up(n, 128)), dtype=np.float32)
    e = g.edge_array()
    dense[e[:, 0], e[:, 1]] = 1.0
    s = np.asarray(vs.all_pairs_scores(
        jnp.asarray(dense, jnp.bfloat16), jnp.asarray(g.degrees),
        jnp.asarray(dense, jnp.bfloat16), jnp.asarray(g.degrees),
        metric=metric))[:, :n]
    pairs = np.stack(np.meshgrid(np.arange(n), np.arange(n), indexing="ij"),
                     axis=-1).reshape(-1, 2)
    want = vs.vertex_similarity_oracle(g, pairs, metric).reshape(n, n)
    np.testing.assert_allclose(s, want.astype(np.float32), rtol=1e-4,
                               atol=1e-6, equal_nan=True)


def test_train_test_split():
    g = build_csr(random_graph(50, 0.2, 4), num_nodes=50)
    m = g.num_edges_undirected
    train, test = lp.extract_random_test_edges(g, m // 5, seed=1)
    assert test.num_edges_undirected == m // 5
    assert train.num_edges_undirected == m - m // 5
    # disjoint, union = original
    n = g.num_nodes
    kt = set(lp._edge_key(train.undirected_edge_array(), n).tolist())
    ks = set(lp._edge_key(test.undirected_edge_array(), n).tolist())
    kg = set(lp._edge_key(g.undirected_edge_array(), n).tolist())
    assert kt.isdisjoint(ks) and (kt | ks) == kg


def test_sample_non_edges_are_non_edges():
    g = build_csr(random_graph(30, 0.3, 5), num_nodes=30)
    ne = lp.sample_non_edges(g, 100, seed=2)
    keys = set(lp._edge_key(g.undirected_edge_array(), 30).tolist())
    assert all(k not in keys for k in lp._edge_key(np.sort(ne, 1), 30).tolist())
    assert (ne[:, 0] != ne[:, 1]).all()


def test_precision_recall():
    g = build_csr(np.array([[0, 1], [1, 2], [2, 3]], dtype=np.int64), num_nodes=4)
    pred = np.array([[0, 1], [0, 3]])
    p, r = lp.score_precision_recall(pred, g)
    assert p == 0.5 and r == pytest.approx(1 / 3)


def test_auc_perfect_predictor():
    # A graph where common-neighbors perfectly separates test edges from
    # non-edges: two dense blocks sharing no cross edges.
    el = []
    for blk in (range(0, 8), range(8, 16)):
        blk = list(blk)
        el += [[a, b] for i, a in enumerate(blk) for b in blk[i + 1:]]
    g = build_csr(np.array(el, dtype=np.int64), num_nodes=16)
    train, test = lp.extract_random_test_edges(g, 6, seed=3)
    auc = lp.score_auc(g, train, test, 400, metric="common_neighbors", seed=4)
    assert auc > 0.9


def test_add_false_links_count():
    g = build_csr(random_graph(40, 0.25, 6), num_nodes=40)
    train, test = lp.extract_random_test_edges(g, 10, seed=5)
    mutated = lp.add_false_links(train, 5, test, seed=6)
    assert mutated.num_edges_undirected == train.num_edges_undirected


def test_topq_matches_bruteforce():
    n = 25
    g = build_csr(random_graph(n, 0.3, 7), num_nodes=n)
    q = 10
    edges, scores = lp.link_prediction_similarity(g, q, metric="common_neighbors")
    # brute force via oracle
    cand = [(u, v) for u in range(n) for v in range(u + 1, n)
            if v not in set(g.out_neigh(u).tolist())]
    want = vs.vertex_similarity_oracle(g, np.array(cand), "common_neighbors")
    top = np.sort(want)[::-1][:q]
    np.testing.assert_allclose(np.sort(scores)[::-1], top.astype(np.float32))


def test_topq_blockwise_multiblock_all_metrics():
    # n > block so the streaming kernel crosses u-block and v-strip
    # boundaries; every metric's top-q scores must match the oracle's.
    n = 300
    g = build_csr(random_graph(n, 0.04, 11), num_nodes=n)
    q = 15
    nbrs = [set(g.out_neigh(u).tolist()) for u in range(n)]
    cand = np.array([(u, v) for u in range(n) for v in range(u + 1, n)
                     if v not in nbrs[u]])
    for metric in ("jaccard", "common_neighbors", "adamic_adar", "resource",
                   "preferential_attachment"):
        edges, scores = lp.link_prediction_similarity(
            g, q, metric=metric, block=128)
        want = vs.vertex_similarity_oracle(g, cand, metric)
        top = np.sort(want)[::-1][:q]
        np.testing.assert_allclose(np.sort(scores)[::-1],
                                   top.astype(np.float32), rtol=2e-5)
        # returned pairs really are non-edges with u < v
        assert (edges[:, 0] < edges[:, 1]).all()
        assert all(int(v) not in nbrs[int(u)] for u, v in edges)


def test_auc_plan_matches_oracle_pairing():
    """AUCPlan (fused one-dispatch AUC) must equal the oracle-scored
    comparison on its own sampled pairs, for every metric family."""
    import numpy as np
    from gms_tpu.algorithms.similarity import vertex_similarity_oracle

    g = build_csr(random_graph(120, 0.12, seed=9), num_nodes=120)
    train, test = lp.extract_random_test_edges(g, 60, seed=1)
    for metric in ("jaccard", "common_neighbors", "adamic_adar", "overlap"):
        plan = lp.AUCPlan(g, train, test, 300, metric=metric, seed=2)
        auc = plan.run()
        st = vertex_similarity_oracle(
            train, plan.true_edges, metric).astype(np.float32)
        sf = vertex_similarity_oracle(
            train, plan.false_edges, metric).astype(np.float32)
        want = (np.sum(st > sf) + 0.5 * np.sum(st == sf)) / 300
        assert abs(auc - want) < 1e-6, metric
        # steady protocol: chained pairings agree statistically
        auc2, _dt = plan.run_steady(3)
        assert abs(auc2 - want) < 0.1
