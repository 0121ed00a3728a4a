"""GAPBS-kernel conformance vs host oracles (role of the reference's
Log(Graph) benchmark verifiers)."""

import numpy as np
import pytest

from gms_tpu.algorithms import gapbs
from gms_tpu.io.builder import build_csr

from conftest import random_graph


@pytest.fixture(scope="module")
def graphs():
    gs = [build_csr(random_graph(60, 0.08, s), num_nodes=60) for s in range(2)]
    # a disconnected graph: two blocks
    el = np.concatenate([random_graph(20, 0.3, 7),
                         random_graph(20, 0.3, 8) + 20])
    gs.append(build_csr(el, num_nodes=45))  # plus isolated vertices
    return gs


def test_bfs(graphs):
    for g in graphs:
        np.testing.assert_array_equal(gapbs.bfs(g, 0), gapbs.bfs_oracle(g, 0))


def test_cc(graphs):
    for g in graphs:
        got = gapbs.connected_components(g)
        want = gapbs.cc_oracle(g)
        # same partition, canonical min-label
        np.testing.assert_array_equal(got, want)


def test_sssp_unit_equals_bfs(graphs):
    for g in graphs:
        np.testing.assert_array_equal(gapbs.sssp(g, 0), gapbs.bfs_oracle(g, 0))


def test_sssp_weighted(graphs):
    rng = np.random.default_rng(0)
    for g in graphs:
        w = rng.integers(1, 10, size=g.num_edges)
        # symmetric weights: weight of (u,v) must equal (v,u)
        key = {}
        for v in range(g.num_nodes):
            for k in range(g.indptr[v], g.indptr[v + 1]):
                u = int(g.indices[k])
                key[(v, u)] = int(w[k])
        for v in range(g.num_nodes):
            for k in range(g.indptr[v], g.indptr[v + 1]):
                u = int(g.indices[k])
                w[k] = key[(min(u, v), max(u, v))]
        np.testing.assert_array_equal(
            gapbs.sssp(g, 0, w), gapbs.sssp_oracle(g, 0, w))


def test_pagerank(graphs):
    for g in graphs:
        got = gapbs.pagerank(g, iters=15)
        want = gapbs.pagerank_oracle(g, iters=15)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-7)


def test_bc_star():
    # star: center has all shortest paths through it
    el = np.array([[0, i] for i in range(1, 6)], dtype=np.int64)
    g = build_csr(el, num_nodes=6)
    bc = gapbs.betweenness_centrality(g, normalize=False)
    assert bc[0] > 0
    assert np.allclose(bc[1:], 0)


def test_bc_path():
    # path 0-1-2: middle vertex has BC 1 (one pair: (0,2) both directions)
    g = build_csr(np.array([[0, 1], [1, 2]], dtype=np.int64), num_nodes=3)
    bc = gapbs.betweenness_centrality(g, normalize=False)
    assert bc[1] == pytest.approx(2.0)  # both directions counted
    assert bc[0] == bc[2] == 0


def test_bc_vs_bruteforce(graphs):
    g = graphs[0]
    # brute force via counting shortest paths through each vertex
    n = g.num_nodes
    want = np.zeros(n)
    for s in range(n):
        # BFS shortest-path DAG
        dist = gapbs.bfs_oracle(g, s)
        order = np.argsort(dist)
        sigma = np.zeros(n)
        sigma[s] = 1
        for v in order:
            if dist[v] <= 0:
                continue
            for w in g.out_neigh(v):
                if dist[w] == dist[v] - 1:
                    sigma[v] += sigma[w]
        delta = np.zeros(n)
        for v in order[::-1]:
            if dist[v] < 0:
                continue
            for w in g.out_neigh(v):
                if dist[w] == dist[v] + 1 and sigma[w] > 0:
                    delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
        delta[s] = 0
        want += delta
    got = gapbs.betweenness_centrality(g, normalize=False)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# representation-polymorphic kernels (role of the reference's Log(Graph)
# kernel x representation benchmark matrix, log_graph/CMakeLists.txt:23-46)
# ---------------------------------------------------------------------------

def _reps(g):
    from gms_tpu.graphs import compressed as cp

    return {
        "kbit": cp.KbitGraph.from_csr(g),
        "hybrid": cp.HybridGraph.from_csr(g),
        "bucketed": cp.KbitGraphBucketed.from_csr(g),
    }


def test_bfs_over_compressed_reps(graphs):
    for g in graphs:
        want = gapbs.bfs_oracle(g, 0)
        for name, rep in _reps(g).items():
            np.testing.assert_array_equal(gapbs.bfs(rep, 0), want, err_msg=name)
        # pull-only path too
        np.testing.assert_array_equal(
            gapbs.bfs(g, 0, direction_optimizing=False), want)


def test_bfs_kbit_from_packed(graphs):
    """True compute-from-compressed BFS: per-level decode (kbit_bfs.cc role)."""
    from gms_tpu.graphs import compressed as cp

    for g in graphs:
        kg = cp.KbitGraph.from_csr(g)
        np.testing.assert_array_equal(gapbs.bfs_kbit(kg, 0),
                                      gapbs.bfs_oracle(g, 0))


def test_cc_pr_sssp_over_compressed(graphs):
    g = graphs[0]
    reps = _reps(g)
    np.testing.assert_array_equal(
        gapbs.connected_components(reps["kbit"]), gapbs.cc_oracle(g))
    np.testing.assert_allclose(
        gapbs.pagerank(reps["hybrid"], iters=10),
        gapbs.pagerank_oracle(g, iters=10), rtol=1e-5)
    np.testing.assert_array_equal(gapbs.sssp(reps["kbit"], 0),
                                  gapbs.bfs_oracle(g, 0))


def test_tc_over_compressed(graphs):
    from gms_tpu.algorithms.triangle_count import (triangle_count,
                                                   triangle_count_oracle)

    for g in graphs[:2]:
        want = triangle_count_oracle(g)
        for name, rep in _reps(g).items():
            assert triangle_count(rep) == want, name


def test_bfs_direction_optimizing_high_diameter():
    """A long path graph: pull-only pays O(V*D) per level; the d-opt path
    must still return exact distances (the correctness half of the
    kbit_bfs.cc BUStep/TDStep contract)."""
    import numpy as np
    from gms_tpu.io.builder import build_csr

    n = 300
    el = np.stack([np.arange(n - 1), np.arange(1, n)], axis=1)
    g = build_csr(el, num_nodes=n)
    want = gapbs.bfs_oracle(g, 0)
    np.testing.assert_array_equal(gapbs.bfs(g, 0), want)
