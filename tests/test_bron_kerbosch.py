"""Bron-Kerbosch MCE conformance — mirrors testing/bron_kerbosch.cpp:
every result is a clique, is maximal, and the set-of-sets equals the
BkSimple base algorithm, across orderings, on fixture + random graphs.
"""

import numpy as np
import pytest

from gms_tpu.algorithms import bron_kerbosch as bk
from gms_tpu.io.builder import build_csr

from conftest import random_graph

ORDERINGS = ["degeneracy", "adg", "degree", "id"]


def check_graph(g, ordering="degeneracy"):
    want = set(bk.bron_kerbosch_simple(g))
    count, got = bk.bron_kerbosch(g, ordering=ordering, collect=True)
    assert count == len(want)
    got_set = set(got)
    assert got_set == want
    for c in got_set:
        assert bk.is_clique(g, c)
        assert bk.is_maximal(g, c)


@pytest.mark.parametrize("ordering", ORDERINGS)
def test_fixtures(fixture_graphs, ordering):
    for name, g in fixture_graphs.items():
        check_graph(g, ordering)


def test_triangle_plus_isolated():
    # hardcoded size-3 graphs incl. isolated vertices (bron_kerbosch.cpp:46-69)
    g = build_csr(np.array([[0, 1], [1, 2], [0, 2]], dtype=np.int64), num_nodes=5)
    count, got = bk.bron_kerbosch(g, collect=True)
    assert set(got) == {frozenset({0, 1, 2}), frozenset({3}), frozenset({4})}
    assert count == 3


@pytest.mark.parametrize("n,p,seed", [(10, 0.4, 0), (50, 0.15, 1), (100, 0.08, 2)])
def test_random_graphs(n, p, seed):
    g = build_csr(random_graph(n, p, seed), num_nodes=n)
    check_graph(g)


def test_count_only_matches_collect():
    g = build_csr(random_graph(40, 0.3, 7), num_nodes=40)
    count, got = bk.bron_kerbosch(g, collect=True)
    assert bk.bron_kerbosch(g) == count == len(got)


def test_small_root_chunk():
    g = build_csr(random_graph(30, 0.3, 9), num_nodes=30)
    want = len(bk.bron_kerbosch_simple(g))
    assert bk.bron_kerbosch(g, root_chunk=4) == want


def test_empty_and_edgeless():
    g0 = build_csr(np.zeros((0, 2), dtype=np.int64), num_nodes=0)
    assert bk.bron_kerbosch(g0) == 0
    g1 = build_csr(np.zeros((0, 2), dtype=np.int64), num_nodes=3)
    count, got = bk.bron_kerbosch(g1, collect=True)
    assert count == 3 and set(got) == {frozenset({v}) for v in range(3)}


def test_hub_path_matches_oracle():
    """Force the DAG-universe hub path (hub_threshold tiny) — counts and
    enumerated sets must match the direct path and the host oracle
    (VERDICT r03: the r02 worker crash came from degree-width tiers;
    hubs now expand over N+(r) with a lower-neighbor maximality filter)."""
    for n, p, seed in ((60, 0.25, 3), (120, 0.12, 4), (200, 0.08, 5)):
        g = build_csr(random_graph(n, p, seed=seed), num_nodes=n)
        want = bk.bron_kerbosch_simple(g)
        got = bk.bron_kerbosch(g, hub_threshold=4)
        assert got == len(want), (n, got, len(want))
        cnt, cl = bk.bron_kerbosch(g, collect=True, hub_threshold=4)
        assert cnt == len(want)
        assert set(cl) == set(want)


def test_hub_and_direct_split_agree():
    # mixed: some roots through each path (threshold between min and max deg)
    g = build_csr(random_graph(150, 0.15, seed=6), num_nodes=150)
    want = len(bk.bron_kerbosch_simple(g))
    thr = int(np.median(g.degrees))
    assert bk.bron_kerbosch(g, hub_threshold=thr) == want


def test_direct_variant_matches_oracle():
    # the direct cand/fini expansion (bk_count_chunk work stack + hub
    # split) stays available behind direct=True
    for n, p, seed in ((80, 0.2, 7), (150, 0.1, 8)):
        g = build_csr(random_graph(n, p, seed=seed), num_nodes=n)
        want = len(bk.bron_kerbosch_simple(g))
        assert bk.bron_kerbosch(g, direct=True) == want
        assert bk.bron_kerbosch(g, direct=True, hub_threshold=6) == want


def test_resume_segments_equal_counts():
    """The watchdog-resume protocol (iter_budget pop rounds per dispatch,
    state round-tripped through the host) must be count-invariant: forcing
    absurdly small segments exercises many resume hops."""
    import numpy as np
    from gms_tpu.preprocessing import degeneracy

    g = build_csr(random_graph(120, 0.2, 9), num_nodes=120)
    rank, _ = degeneracy.degeneracy_ordering_rank(g)
    roots = np.arange(g.num_nodes, dtype=np.int32)
    want, _ = bk._bk_fused(g, np.asarray(rank), roots)
    got, _ = bk._bk_fused(g, np.asarray(rank), roots, iter_budget=2)
    assert got == want == len(bk.bron_kerbosch_simple(g))


def test_band_compact_both_paths():
    """_band_compact: the variadic-sort path (K <= 32 columns) and the
    permutation-gather path (wide rows) must both stably compact band-0
    rows to the front (the wide path only runs on wide star tiers on
    TPU, so pin it here)."""
    import jax.numpy as jnp
    import numpy as np
    from gms_tpu.algorithms.bron_kerbosch import _band_compact

    rng = np.random.default_rng(0)
    for K in (5, 33, 64):
        N = 256
        blk = rng.integers(0, 2**32, (N, K), dtype=np.uint32)
        keep = rng.random(N) < 0.4
        iota = np.arange(N, dtype=np.int32)
        band = np.where(keep, iota, N + iota).astype(np.int32)
        out = np.asarray(_band_compact(jnp.asarray(band), jnp.asarray(blk)))
        want = np.concatenate([blk[keep], blk[~keep]])
        np.testing.assert_array_equal(out, want)
