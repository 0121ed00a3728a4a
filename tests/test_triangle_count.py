"""Triangle counting conformance — golden counts on fixtures + random graphs
vs the independent host oracle (role of triangle_count/verifier.h)."""

import numpy as np
import pytest

from gms_tpu.algorithms import triangle_count as tc
from gms_tpu.io.builder import build_csr
from gms_tpu.io.generators import generate_graph
from gms_tpu.preprocessing import orient

from conftest import random_graph

# hand-verified golden counts
GOLDEN = {
    "micro": 0,
    "triangles_1": 1,
    "triangles_3": 3,
}


def test_golden_fixtures(fixture_graphs):
    for name, want in GOLDEN.items():
        got = tc.triangle_count(fixture_graphs[name], chunk=64)
        assert got == want, name


def test_fixtures_vs_oracle(fixture_graphs):
    for name, g in fixture_graphs.items():
        want = tc.triangle_count_oracle(g)
        assert tc.triangle_count(g, chunk=64) == want, name


@pytest.mark.parametrize("seed,p", [(0, 0.1), (1, 0.3), (2, 0.6)])
def test_random_graphs(seed, p):
    g = build_csr(random_graph(60, p, seed))
    want = tc.triangle_count_oracle(g)
    assert tc.triangle_count(g, chunk=128) == want
    # id orientation must agree with degree orientation
    assert tc.triangle_count(g, rank=orient.id_rank(g), chunk=128) == want


@pytest.mark.parametrize("method", ["compare", "searchsorted"])
def test_methods_agree(method):
    g = build_csr(random_graph(80, 0.2, seed=5))
    want = tc.triangle_count_oracle(g)
    assert tc.triangle_count(g, chunk=128, method=method) == want


def test_generated_graph():
    g = generate_graph("kronecker", 8, avg_degree=8)
    want = tc.triangle_count_oracle(g)
    assert tc.triangle_count(g) == want


def test_per_vertex(fixture_graphs):
    for name, g in fixture_graphs.items():
        want = tc.triangle_count_per_vertex_oracle(g)
        got = tc.triangle_count_per_vertex(g, chunk=64)
        assert np.array_equal(got, want), name
    # sum over vertices = 3 * total
    g = build_csr(random_graph(50, 0.3, seed=3))
    got = tc.triangle_count_per_vertex(g, chunk=64)
    assert got.sum() == 3 * tc.triangle_count(g, chunk=64)
    assert np.array_equal(got, tc.triangle_count_per_vertex_oracle(g))


def test_hub_bitmap_paths():
    """Force the hub/semi-hub/compare three-way split on a small graph."""
    from gms_tpu.algorithms.triangle_count import TrianglePlan, triangle_count_oracle
    from conftest import random_graph
    from gms_tpu.io.builder import build_csr

    for seed in range(3):
        g = build_csr(random_graph(120, 0.25, seed), num_nodes=120)
        want = triangle_count_oracle(g)
        for t in (2, 8, 20):
            plan = TrianglePlan(g, hub_threshold=t)
            assert plan.run() == want, (seed, t)
        assert TrianglePlan(g, hub_threshold=None).run() == want
