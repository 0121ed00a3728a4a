"""Multi-chip algorithm scaling on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gms_tpu.algorithms import bron_kerbosch as bk
from gms_tpu.algorithms import k_clique, similarity as vs
from gms_tpu.io.builder import build_csr
from gms_tpu.io.generators import generate_rmat_el
from gms_tpu.parallel import multi, sharding

from conftest import random_graph


@pytest.fixture(scope="module")
def mesh():
    return sharding.make_mesh()


def test_sharded_kclique(mesh):
    g = build_csr(generate_rmat_el(8, 6, seed=1), num_nodes=256)
    for k in (3, 4, 5):
        got = multi.sharded_kclique_count(g, k, mesh, root_chunk_per_shard=16)
        assert got == k_clique.kclique_count_oracle(g, k), k


def test_sharded_kclique_overflow_retry(mesh):
    # tiny caps force the overflow-retry path via a dense graph
    n = 24
    src, dst = np.nonzero(np.triu(np.ones((n, n), dtype=bool), 1))
    g = build_csr(np.stack([src, dst], axis=1).astype(np.int64))
    from math import comb

    got = multi.sharded_kclique_count(g, 5, mesh, root_chunk_per_shard=1)
    assert got == comb(n, 5)


def test_device_parallel_bk():
    g = build_csr(random_graph(60, 0.2, 2), num_nodes=60)
    want = len(bk.bron_kerbosch_simple(g))
    got = multi.sharded_bron_kerbosch_count(g, jax.devices(), root_chunk=8)
    assert got == want


def test_sharded_pair_scores(mesh):
    g = build_csr(random_graph(40, 0.3, 3), num_nodes=40)
    from gms_tpu.graphs.tiles import PaddedGraph
    from gms_tpu.algorithms.similarity import _deg_lookup

    pg = PaddedGraph.from_csr(g)
    deg1 = _deg_lookup(pg)
    n_pairs = 8 * 16
    pairs = np.random.default_rng(0).integers(0, 40, size=(n_pairs, 2)).astype(np.int32)
    fn = multi.sharded_pair_scores(mesh, metric="jaccard")
    got = np.asarray(fn(pg.nbr, deg1, jnp.asarray(pairs)))
    want = vs.vertex_similarity_oracle(g, pairs, "jaccard").astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bk_roots_param_partition():
    g = build_csr(random_graph(30, 0.3, 5), num_nodes=30)
    want = bk.bron_kerbosch(g)
    a = bk.bron_kerbosch(g, roots=np.arange(0, 15))
    b = bk.bron_kerbosch(g, roots=np.arange(15, 30))
    assert a + b == want


def test_bk_count_exact_on_aligned_n():
    """Regression: with n a multiple of the sublane pad (v_pad == n before
    the +1 fix), padded root slots clip-gathered a REAL vertex row and
    k_clique/BK silently overcounted. PaddedGraph now reserves an
    all-SENTINEL row past the last vertex."""
    from gms_tpu.algorithms.k_clique import kclique_count, kclique_count_oracle
    from gms_tpu.graphs.tiles import PaddedGraph

    for n, p, seed in [(64, 0.3, 1), (128, 0.2, 3)]:
        g = build_csr(random_graph(n, p, seed), num_nodes=n)
        pg = PaddedGraph.from_csr(g)
        assert pg.v_pad > g.num_nodes
        assert kclique_count(g, 4) == kclique_count_oracle(g, 4)
        assert bk.bron_kerbosch(g) == len(bk.bron_kerbosch_simple(g))


def test_bk_single_dispatch_matches_levelwise_collect():
    """Count mode (bk_count_chunk while_loop, one dispatch per chunk) and
    collect mode (per-level host loop) agree."""
    g = build_csr(random_graph(80, 0.25, 9), num_nodes=80)
    n_count = bk.bron_kerbosch(g, collect=False)
    n_collect, cliques = bk.bron_kerbosch(g, collect=True)
    assert n_count == n_collect == len(set(cliques))
