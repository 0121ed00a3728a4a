"""Multi-chip sharded counting on the 8-device virtual CPU mesh."""

import numpy as np

from gms_tpu.algorithms import triangle_count as tc
from gms_tpu.io.builder import build_csr
from gms_tpu.parallel import sharding

from conftest import random_graph


def test_sharded_tc_matches_single_chip():
    g = build_csr(random_graph(100, 0.15, seed=11))
    want = tc.triangle_count_oracle(g)
    mesh = sharding.make_mesh()
    assert len(mesh.devices) == 8
    got = sharding.sharded_triangle_count(g, mesh, chunk=64)
    assert got == want


def test_sharded_tc_subset_mesh():
    g = build_csr(random_graph(60, 0.3, seed=12))
    want = tc.triangle_count_oracle(g)
    for n in (1, 2, 4):
        mesh = sharding.make_mesh(n)
        assert sharding.sharded_triangle_count(g, mesh, chunk=32) == want
