"""CSR/builder/reader tests — role of testing/cgraph.cpp + set_graph.cpp."""

import numpy as np
import pytest

from gms_tpu.graphs.csr import CSRGraph
from gms_tpu.io.builder import build_csr, relabel_by_degree
from gms_tpu.io import readers
from gms_tpu.io.generators import generate_graph, generate_rmat_el, generate_uniform_el

from conftest import random_graph


def test_micro(fixture_graphs):
    g = fixture_graphs["micro"]
    assert g.num_nodes == 2
    assert g.num_edges == 2
    assert g.num_edges_undirected == 1
    assert list(g.out_neigh(0)) == [1]
    assert list(g.out_neigh(1)) == [0]


def test_symmetrize_and_squish():
    # duplicate edges, self loop, one-directional input
    edges = np.array([[0, 1], [0, 1], [1, 2], [2, 2], [3, 0]])
    g = build_csr(edges)
    assert g.num_nodes == 4
    assert not g.directed()
    assert list(g.out_neigh(0)) == [1, 3]
    assert list(g.out_neigh(1)) == [0, 2]
    assert list(g.out_neigh(2)) == [1]  # self loop removed
    assert list(g.out_neigh(3)) == [0]
    # rows sorted
    for v in range(g.num_nodes):
        row = g.out_neigh(v)
        assert np.all(np.diff(row) > 0)


def test_fixture_graphs_undirected(fixture_graphs):
    for name, g in fixture_graphs.items():
        # symmetry: edge (u,v) implies (v,u)
        e = set(map(tuple, g.edge_array().tolist()))
        assert all((v, u) in e for (u, v) in e), name


def test_degrees_and_edge_array(fixture_graphs):
    g = fixture_graphs["smallRandom1"]
    deg = g.degrees
    assert deg.sum() == g.num_edges
    ea = g.edge_array()
    assert ea.shape == (g.num_edges, 2)
    ue = g.undirected_edge_array()
    assert len(ue) == g.num_edges_undirected


def test_relabel_by_degree_preserves_structure():
    el = random_graph(50, 0.2, seed=0)
    g = build_csr(el)
    rg = relabel_by_degree(g)
    assert rg.num_edges == g.num_edges
    # degree multiset preserved
    assert sorted(g.degrees.tolist()) == sorted(rg.degrees.tolist())
    # new label 0 has the max degree
    assert rg.out_degree(0) == g.max_degree


def test_induce_dag():
    el = random_graph(30, 0.3, seed=1)
    g = build_csr(el)
    rank = np.arange(g.num_nodes, dtype=np.int32)
    dag = g.induce_dag(rank)
    assert dag.num_edges == g.num_edges // 2
    e = dag.edge_array()
    assert np.all(e[:, 0] < e[:, 1])


def test_remove_isolated():
    edges = np.array([[0, 2], [2, 5]])
    g = build_csr(edges)
    g2, old = g.remove_isolated()
    assert g2.num_nodes == 3
    assert list(old) == [0, 2, 5]
    assert g2.num_edges == g.num_edges


def test_readers_roundtrip(tmp_path, fixture_graphs):
    g = fixture_graphs["eppsteinExample"]
    p = tmp_path / "g.npz"
    readers.save_npz(g, str(p))
    g2 = readers.load_npz(str(p))
    assert g == g2


def test_read_el(test_graph_dir):
    g = readers.read_graph(str(test_graph_dir / "tomitaExample.el"))
    assert g.num_nodes == 10  # ids 0..9 (file uses 1..9)
    assert g.num_edges > 0


def test_read_mtx(tmp_path):
    content = """%%MatrixMarket matrix coordinate pattern symmetric
3 3 2
2 1
3 2
"""
    p = tmp_path / "g.mtx"
    p.write_text(content)
    g = readers.read_graph(str(p))
    assert g.num_nodes == 3
    assert list(g.out_neigh(0)) == [1]
    assert list(g.out_neigh(1)) == [0, 2]


def test_read_metis(tmp_path):
    content = """3 2
2 3
1
1
"""
    p = tmp_path / "g.graph"
    p.write_text(content)
    g = readers.read_graph(str(p))
    assert g.num_nodes == 3
    assert list(g.out_neigh(0)) == [1, 2]


def test_generators_deterministic():
    a = generate_uniform_el(8, 4, seed=7)
    b = generate_uniform_el(8, 4, seed=7)
    assert np.array_equal(a, b)
    c = generate_rmat_el(8, 4, seed=7)
    d = generate_rmat_el(8, 4, seed=7)
    assert np.array_equal(c, d)
    assert c.max() < 256


def test_generate_graph():
    g = generate_graph("kronecker", 6, avg_degree=4)
    assert g.num_nodes == 64
    assert not g.directed()
    g2 = generate_graph("uniform", 6, avg_degree=4)
    assert g2.num_nodes == 64


def test_prepared_cache_roundtrip(tmp_path):
    """Checkpoint/resume analog: graph + preprocessing arrays round-trip."""
    import numpy as np
    from gms_tpu.io.builder import build_csr
    from gms_tpu.io.cache import save_prepared, load_prepared
    from gms_tpu.preprocessing import degeneracy

    rng = np.random.default_rng(0)
    g = build_csr(rng.integers(0, 30, size=(100, 2)), num_nodes=30)
    rank, k = degeneracy.degeneracy_ordering_rank(g)
    p = str(tmp_path / "prep.npz")
    save_prepared(p, g, rank=rank, degeneracy=np.array(k))
    g2, extras = load_prepared(p)
    assert g2 == g
    np.testing.assert_array_equal(extras["rank"], rank)
    assert int(extras["degeneracy"]) == k


def test_weighted_wel_roundtrip(tmp_path):
    """Weighted .wel: weights preserved, used by SSSP, npz round-trip."""
    import numpy as np
    from gms_tpu.io.readers import read_wel, save_npz, load_npz
    from gms_tpu.algorithms import gapbs

    p = tmp_path / "g.wel"
    p.write_text("0 1 5\n1 2 2\n0 2 9\n")
    g = read_wel(str(p))
    assert g.weights is not None and len(g.weights) == g.num_edges
    d = gapbs.sssp(g, 0)
    # 0->1 =5; 0->2 = min(9, 5+2)=7
    assert d.tolist() == [0, 5, 7]
    q = tmp_path / "g.npz"
    save_npz(g, str(q))
    g2 = load_npz(str(q))
    assert g2 == g and np.array_equal(g2.weights, g.weights)


def test_weighted_symmetrize_dedup():
    import numpy as np
    from gms_tpu.io.builder import build_csr_weighted

    g = build_csr_weighted(np.array([[0, 1], [0, 1], [1, 0]]),
                           np.array([3, 7, 9]), num_nodes=2)
    assert g.num_edges == 2  # one undirected edge, both directions
    # first weight of each duplicate kept (stable sort)
    assert set(g.weights.tolist()) <= {3, 9}
