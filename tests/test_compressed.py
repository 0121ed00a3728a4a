"""Compressed representations: k-bit / bucketed / varint / hybrid round-trips
(role of testing/coders.cpp: varint round-trips + compressed neighborhood
decode vs CSR) and permuters."""

import numpy as np
import pytest

from gms_tpu.graphs import compressed as cp
from gms_tpu.graphs import permuters
from gms_tpu.graphs.tiles import PaddedGraph, SENTINEL
from gms_tpu.io.builder import build_csr
from gms_tpu.io.generators import generate_rmat_el

from conftest import random_graph


@pytest.fixture(scope="module")
def graphs():
    return [
        build_csr(random_graph(50, 0.15, 0), num_nodes=50),
        build_csr(generate_rmat_el(8, 6, seed=1), num_nodes=256),
        build_csr(np.zeros((0, 2), dtype=np.int64), num_nodes=5),
    ]


def padded_rows(g):
    return np.asarray(PaddedGraph.from_csr(g).nbr)


def test_kbit_roundtrip(graphs):
    for g in graphs:
        kg = cp.KbitGraph.from_csr(g)
        got = np.asarray(kg.nbr)
        want = padded_rows(g)
        np.testing.assert_array_equal(got[:, : want.shape[1]], want)
        assert kg.bits_per_edge() > 0


def test_kbit_row_gather(graphs):
    g = graphs[1]
    kg = cp.KbitGraph.from_csr(g)
    import jax.numpy as jnp

    vids = jnp.asarray(np.array([0, 3, 17, 255], dtype=np.int32))
    got = np.asarray(kg.rows(vids))
    want = padded_rows(g)[np.array([0, 3, 17, 255])]
    np.testing.assert_array_equal(got[:, : want.shape[1]], want)


def test_kbit_footprint_smaller():
    g = build_csr(generate_rmat_el(8, 6, seed=2), num_nodes=256)
    kg = cp.KbitGraph.from_csr(g)
    # 8-bit ids vs 32-bit: packed must be < half the padded int32 layout
    assert kg.bits_per_edge() < 32 * padded_rows(g).size / g.num_edges / 2


def test_kbit_bucketed_roundtrip(graphs):
    for g in graphs[:2]:
        kb = cp.KbitGraphBucketed.from_csr(g)
        got = kb.decode_all()
        want = padded_rows(g)
        # compare the real rows only: PaddedGraph reserves >=1 extra
        # all-SENTINEL row, the bucketed form need not
        n = g.num_nodes
        np.testing.assert_array_equal(got[:n, : want.shape[1]], want[:n])
        assert (want[n:] == SENTINEL).all()


def test_varint_roundtrip(graphs):
    for g in graphs:
        data = cp.varint_encode_graph(g)
        g2 = cp.varint_decode_graph(data)
        assert g2 == g
        assert len(data["payload"]) < max(4 * g.num_edges, 1) or g.num_edges == 0


def test_varint_word_roundtrip(graphs):
    """Word-packed variant (VarintWordBasedGraph role): exact round-trip,
    and tokens stay word-aligned (payload a multiple of 4 bytes)."""
    for g in graphs:
        data = cp.varint_encode_graph_words(g)
        g2 = cp.varint_decode_graph_words(data)
        assert g2 == g
        assert len(data["payload"]) % 4 == 0
        # every gap fits one 31-bit word on these graphs: one word/token
        assert len(data["payload"]) == 4 * g.num_edges


def test_varint_word_wide_ids():
    # ids above 2^31 payload bits per word force continuation words
    el = np.array([[0, 1], [0, 2], [1, 2]], dtype=np.int64)
    g = build_csr(el, num_nodes=3)
    for enc, dec in ((cp.varint_encode_graph, cp.varint_decode_graph),
                     (cp.varint_encode_graph_words,
                      cp.varint_decode_graph_words)):
        assert dec(enc(g)) == g


def test_hybrid_roundtrip():
    # a graph with a hub row (dense) plus sparse rows
    el = [[0, i] for i in range(1, 200)] + [[i, i + 1] for i in range(1, 199)]
    g = build_csr(np.array(el, dtype=np.int64), num_nodes=200)
    h = cp.HybridGraph.from_csr(g)
    assert len(h.bitmap_vids) >= 1  # the hub went dense
    got = h.decode_all()
    want = padded_rows(g)
    np.testing.assert_array_equal(got[: want.shape[0], : want.shape[1]], want)


@pytest.mark.parametrize("variant", permuters.VARIANTS)
def test_permuters_are_permutations(variant, graphs):
    g = graphs[0]
    pm = permuters.permutation_map(g, variant, seed=3)
    assert sorted(pm.tolist()) == list(range(g.num_nodes))
    g2 = permuters.apply_permutation(g, variant, seed=3)
    assert g2.num_edges == g.num_edges
    # isomorphism sanity: degree multiset preserved
    assert sorted(g2.degrees.tolist()) == sorted(g.degrees.tolist())


def test_gap_bfs_improves_gaps():
    g = build_csr(generate_rmat_el(9, 4, seed=4), num_nodes=512)
    g_rand = permuters.apply_permutation(g, "random", seed=5)
    before = permuters.average_gap_bits(g_rand)
    after = permuters.average_gap_bits(
        permuters.apply_permutation(g_rand, "gap_bfs"))
    assert after < before


def test_kernels_run_on_compressed():
    """Compressed graphs are drop-in inputs for set kernels (decode path)."""
    from gms_tpu.algorithms.triangle_count import triangle_count_oracle
    from gms_tpu.sets import ops
    import jax.numpy as jnp

    g = build_csr(random_graph(40, 0.3, 6), num_nodes=40)
    kg = cp.KbitGraph.from_csr(g)
    nbr = kg.nbr
    e = g.edge_array()
    e = e[e[:, 0] < e[:, 1]]
    a = jnp.take(nbr, jnp.asarray(e[:, 0]), axis=0)
    b = jnp.take(nbr, jnp.asarray(e[:, 1]), axis=0)
    total = int(jnp.sum(ops.intersect_count(a, b), dtype=jnp.int64))
    assert total // 3 == triangle_count_oracle(g)


def test_rcm_and_barycenter_reduce_gaps():
    """The non-ILP gap-minimizer family (permuters.h:25-44 CPLEX role):
    every member must beat a random labeling on the coder objective."""
    g = build_csr(generate_rmat_el(9, 6, seed=11), num_nodes=512)
    g_rand = permuters.apply_permutation(g, "random", seed=5)
    base = permuters.average_gap_bits(g_rand)
    for variant in ("gap_bfs", "rcm", "gap_barycenter"):
        after = permuters.average_gap_bits(
            permuters.apply_permutation(g_rand, variant))
        assert after < base, (variant, after, base)


def test_permuters_are_bijections():
    g = build_csr(random_graph(50, 0.2, 3), num_nodes=50)
    for variant in permuters.VARIANTS:
        p = permuters.permutation_map(g, variant, seed=1)
        assert sorted(p.tolist()) == list(range(50)), variant


def test_triangle_count_dense_bitmap():
    from gms_tpu.algorithms.triangle_count import (triangle_count_dense,
                                                   triangle_count_oracle)

    for seed in range(3):
        g = build_csr(random_graph(90, 0.25, seed), num_nodes=90)
        assert triangle_count_dense(g, chunk=64) == triangle_count_oracle(g)


def test_kbit_weighted_roundtrip_and_sssp():
    # Kbit_Weighted_* role (builder.h:440,488): compressed ids + weights,
    # SSSP computed straight from the packed planes.
    import numpy as np
    from gms_tpu.graphs.compressed import KbitWeightedGraph
    from gms_tpu.algorithms import gapbs
    from conftest import random_graph
    from gms_tpu.io.builder import build_csr

    g = build_csr(random_graph(80, 0.08, seed=9), num_nodes=80)
    rng = np.random.default_rng(4)
    w = rng.integers(1, 17, size=g.num_edges).astype(np.int32)
    # weights must be symmetric for the undirected oracle comparison
    e = g.edge_array()
    key = {(min(a, b), max(a, b)): None for a, b in e}
    sym = {k: int(rng.integers(1, 17)) for k in key}
    w = np.array([sym[(min(a, b), max(a, b))] for a, b in e], np.int32)

    kg = KbitWeightedGraph.from_csr(g, w)
    # round-trip: decoded ids match padded rows; decoded weights match slots
    import jax.numpy as jnp
    rows = np.asarray(kg.nbr)[: g.num_nodes]
    wr = np.asarray(kg.weight_rows())[: g.num_nodes]
    deg = g.degrees
    for v in (0, 7, 33, 79):
        d = int(deg[v])
        assert (rows[v, :d] == g.out_neigh(v)).all()
        lo = int(g.indptr[v])
        assert (wr[v, :d] == w[lo : lo + d]).all()
    # footprint win is vs the padded int32 planes (2 x 32 bits/slot): the
    # packed planes use k_id + k_w bits/slot
    padded_bits = 2 * 32 * rows.size
    packed_bits = 32 * (kg.ids.packed.size + kg.wplane.size)
    assert packed_bits < padded_bits / 2

    got = gapbs.sssp(kg, 0)
    want = gapbs.sssp_oracle(g, 0, w)
    np.testing.assert_array_equal(got, want)
