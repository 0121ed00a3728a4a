"""k-clique counting conformance vs independent oracles.

Mirrors the reference's kClist verification strategy (testing/clique_counting
.cpp + verification/kclisting_original.h): device counts vs a serial host
recount, on fixture graphs and random graphs.
"""

import numpy as np
import pytest

from gms_tpu.algorithms import k_clique
from gms_tpu.algorithms.triangle_count import triangle_count_oracle
from gms_tpu.io.builder import build_csr
from gms_tpu.io.generators import generate_rmat_el

from conftest import random_graph


def complete_graph_el(n):
    src, dst = np.nonzero(np.triu(np.ones((n, n), dtype=bool), 1))
    return np.stack([src, dst], axis=1).astype(np.int64)


def test_k3_equals_triangles(fixture_graphs):
    for name, g in fixture_graphs.items():
        assert k_clique.kclique_count(g, 3) == triangle_count_oracle(g), name


@pytest.mark.parametrize("k", [1, 2, 3, 4, 5])
def test_complete_graph_counts(k):
    from math import comb

    g = build_csr(complete_graph_el(7))
    assert k_clique.kclique_count(g, k) == comb(7, k)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("k", [3, 4, 5])
def test_random_vs_oracle(seed, k):
    g = build_csr(random_graph(60, 0.25, seed), num_nodes=60)
    assert k_clique.kclique_count(g, k) == k_clique.kclique_count_oracle(g, k)


def test_rmat_vs_oracle():
    g = build_csr(generate_rmat_el(8, 6, seed=5), num_nodes=256)
    for k in (3, 4, 6):
        assert k_clique.kclique_count(g, k) == k_clique.kclique_count_oracle(g, k)


def test_k_larger_than_max_clique():
    g = build_csr(complete_graph_el(4))
    assert k_clique.kclique_count(g, 5) == 0


def test_empty_graph():
    g = build_csr(np.zeros((0, 2), dtype=np.int64), num_nodes=5)
    assert k_clique.kclique_count(g, 3) == 0


def test_small_root_chunk_partitioning():
    g = build_csr(random_graph(50, 0.3, 3), num_nodes=50)
    want = k_clique.kclique_count_oracle(g, 4)
    assert k_clique.kclique_count(g, 4, root_chunk=8) == want


def test_wide_tier_e3_fallback():
    # K_132 has core 131, so the k >= 6 fused path plans a W = 256 tier,
    # exercising the rem==3 popcount branch that the MXU rem==4 inline
    # (tri4, gated to W <= 128) does NOT take; every other test graph has
    # core <= 65. Closed-form expected count avoids the oracle DFS.
    from math import comb

    g = build_csr(complete_graph_el(132))
    assert k_clique.kclique_count(g, 6) == comb(132, 6)
