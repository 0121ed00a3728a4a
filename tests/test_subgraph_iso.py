"""Subgraph isomorphism conformance vs a host backtracking oracle."""

import numpy as np
import pytest

from gms_tpu.algorithms import subgraph_iso as si
from gms_tpu.io.builder import build_csr

from conftest import random_graph


def G(el, n=None):
    return build_csr(np.asarray(el, dtype=np.int64), num_nodes=n)


TRIANGLE = G([[0, 1], [1, 2], [0, 2]])
PATH3 = G([[0, 1], [1, 2]])
SQUARE = G([[0, 1], [1, 2], [2, 3], [3, 0]])


def count_all(g, pat, induced):
    return len(si.subgraph_isomorphism(g, pat, induced=induced, limit=None))


@pytest.mark.parametrize("induced", [False, True])
@pytest.mark.parametrize("pat", [TRIANGLE, PATH3, SQUARE])
def test_vs_oracle_random(pat, induced):
    g = build_csr(random_graph(20, 0.25, 1), num_nodes=20)
    got = si.subgraph_isomorphism(g, pat, induced=induced, limit=None)
    want = si.subgraph_isomorphism_oracle(g, pat, induced=induced)
    assert {tuple(r) for r in got.tolist()} == set(want)


def test_find_first_valid():
    g = build_csr(random_graph(30, 0.3, 2), num_nodes=30)
    res = si.subgraph_isomorphism(g, TRIANGLE, limit=1)
    assert res.shape == (1, 3)
    assert si.verify_mapping(g, TRIANGLE, res[0])


def test_no_match():
    g = G([[0, 1], [1, 2]], n=3)  # path has no triangle
    assert count_all(g, TRIANGLE, False) == 0


def test_induced_vs_noninduced():
    # K4 contains C4 as a (non-induced) subgraph but not as induced
    n = 4
    src, dst = np.nonzero(np.triu(np.ones((n, n), dtype=bool), 1))
    k4 = build_csr(np.stack([src, dst], axis=1).astype(np.int64))
    assert count_all(k4, SQUARE, False) > 0
    assert count_all(k4, SQUARE, True) == 0


def test_pattern_larger_than_target():
    g = G([[0, 1]], n=2)
    assert count_all(g, TRIANGLE, False) == 0


def test_automorphism_count():
    # triangle in triangle: 3! = 6 mappings
    assert count_all(TRIANGLE, TRIANGLE, False) == 6


def test_disconnected_pattern():
    pat = G([[0, 1], [2, 3]], n=4)  # two disjoint edges
    g = G([[0, 1], [2, 3], [1, 2]], n=4)
    got = si.subgraph_isomorphism(g, pat, induced=False, limit=None)
    want = si.subgraph_isomorphism_oracle(g, pat, induced=False)
    assert {tuple(r) for r in got.tolist()} == set(want)


def test_limit_stops_early():
    g = build_csr(random_graph(40, 0.4, 3), num_nodes=40)
    res = si.subgraph_isomorphism(g, TRIANGLE, limit=5, root_chunk=4)
    assert len(res) == 5
    for row in res:
        assert si.verify_mapping(g, TRIANGLE, row)


# --- larger patterns + bounded-memory hardening (vf2.hpp:40-106 role) ------

PATH5 = G([[0, 1], [1, 2], [2, 3], [3, 4]])
STAR5 = G([[0, 1], [0, 2], [0, 3], [0, 4]])
DIAMOND = G([[0, 1], [0, 2], [1, 2], [1, 3], [2, 3]])
CYCLE6 = G([[0, 1], [1, 2], [2, 3], [3, 4], [4, 5], [5, 0]])


@pytest.mark.parametrize("induced", [False, True])
@pytest.mark.parametrize("pat", [PATH5, STAR5, DIAMOND, CYCLE6])
def test_big_patterns_vs_oracle(pat, induced):
    g = build_csr(random_graph(60, 0.12, 5), num_nodes=60)
    got = si.subgraph_isomorphism(g, pat, induced=induced, limit=None)
    want = si.subgraph_isomorphism_oracle(g, pat, induced=induced)
    assert {tuple(r) for r in got.tolist()} == set(want)


def test_item_budget_invariance_large_graph():
    # enumerate-all of a frequent pattern on a 1k-vertex graph: a tiny
    # item_budget forces many LIFO slices; results must not change
    g = build_csr(random_graph(1000, 0.008, 9), num_nodes=1000)
    big = si.subgraph_isomorphism(g, PATH5, limit=None, item_budget=1 << 18)
    small = si.subgraph_isomorphism(g, PATH5, limit=None, item_budget=1 << 10)
    bs = {tuple(r) for r in big.tolist()}
    ss = {tuple(r) for r in small.tolist()}
    assert len(bs) == len(big) and bs == ss and len(bs) > 100
    for row in big[:20]:
        assert si.verify_mapping(g, PATH5, row)


def test_find_first_under_tiny_budget():
    g = build_csr(random_graph(300, 0.05, 4), num_nodes=300)
    res = si.subgraph_isomorphism(g, DIAMOND, limit=1, item_budget=1 << 9)
    assert res.shape[0] == 1
    assert si.verify_mapping(g, DIAMOND, res[0])


def test_find_first_device_path_matches_hybrid():
    """host_budget=0 pins the DEVICE find-first path; both paths must
    find a valid mapping whenever one exists (r05 hybrid dispatch)."""
    g = build_csr(random_graph(60, 0.15, seed=21), num_nodes=60)
    for pat, induced in ((TRIANGLE, False), (DIAMOND, True), (PATH5, True)):
        hyb = si.subgraph_isomorphism(g, pat, induced=induced, limit=1)
        dev = si.subgraph_isomorphism(g, pat, induced=induced, limit=1,
                                      host_budget=0)
        assert len(hyb) == len(dev)
        for r in (*hyb, *dev):
            assert si.verify_mapping(g, pat, r, induced=induced)


def test_host_budget_exhaustion_falls_through():
    """A 1-step budget must exhaust immediately and still find the
    mapping via the device search."""
    g = build_csr(random_graph(40, 0.3, seed=22), num_nodes=40)
    res = si.subgraph_isomorphism(g, TRIANGLE, limit=1, host_budget=1)
    assert len(res) == 1
    assert si.verify_mapping(g, TRIANGLE, res[0])
