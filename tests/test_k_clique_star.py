"""k-clique-star conformance — every emitted star valid, and the full
(clique, star) set matches the brute-force oracle."""

import numpy as np
import pytest

from gms_tpu.algorithms import k_clique_star as kcs
from gms_tpu.io.builder import build_csr

from conftest import random_graph


def canon(pairs):
    return sorted((tuple(sorted(c)), tuple(sorted(s))) for c, s in pairs)


@pytest.mark.parametrize("k", [2, 3, 4])
def test_vs_oracle_random(k):
    g = build_csr(random_graph(30, 0.3, 1), num_nodes=30)
    got = kcs.kclique_star_list(g, k)
    want = kcs.kclique_star_oracle(g, k)
    assert canon(got) == canon(want)
    for clique, star in got:
        assert kcs.is_valid_star(g, clique, star)


def test_fixtures_k3(fixture_graphs):
    for name, g in fixture_graphs.items():
        got = kcs.kclique_star_list(g, 3)
        want = kcs.kclique_star_oracle(g, 3)
        assert canon(got) == canon(want), name


def test_count_mode_matches_list():
    g = build_csr(random_graph(25, 0.35, 2), num_nodes=25)
    lst = kcs.kclique_star_list(g, 3)
    n, total = kcs.kclique_star_list(g, 3, mode="count")
    assert n == len(lst)
    assert total == sum(len(s) for _, s in lst)


def test_k4_star_contents():
    # K5: every 4-subset is a 4-clique whose star is the remaining vertex
    n = 5
    src, dst = np.nonzero(np.triu(np.ones((n, n), dtype=bool), 1))
    g = build_csr(np.stack([src, dst], axis=1).astype(np.int64))
    got = kcs.kclique_star_list(g, 4)
    assert len(got) == 5
    for clique, star in got:
        assert star == frozenset(range(n)) - clique


def test_small_chunk():
    g = build_csr(random_graph(20, 0.4, 3), num_nodes=20)
    got = kcs.kclique_star_list(g, 3, root_chunk=4)
    want = kcs.kclique_star_oracle(g, 3)
    assert canon(got) == canon(want)
