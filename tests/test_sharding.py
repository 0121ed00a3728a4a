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


def test_sharded_triangle_plan_matches_oracle():
    """The TUNED plan (tiers + grouped hub bitmaps) sharded over the mesh
    must agree with the host oracle and the single-chip plan — VERDICT r1
    item 3 (shard the tuned plan, not the naive kernel)."""
    import numpy as np
    from gms_tpu.io.builder import build_csr
    from gms_tpu.io.generators import generate_rmat_el
    from gms_tpu.parallel.sharding import ShardedTrianglePlan, make_mesh

    mesh = make_mesh(8)
    for scale, thr in ((9, 8), (10, 65)):
        g = build_csr(generate_rmat_el(scale, 8, seed=5), num_nodes=1 << scale)
        want = tc.triangle_count_oracle(g)
        plan = ShardedTrianglePlan(g, mesh, hub_threshold=thr)
        assert plan.run() == want, (scale, thr)
        cnt, _dt = plan.run_steady(trials=3)
        assert cnt == want
        work = plan.shard_work_model()
        assert len(work) == 8 and work.sum() > 0


def test_vertex_sharded_plan_matches_oracle_and_scales_memory():
    """Memory-scaling TC (VERDICT r02 item 3b): adjacency rows sharded over
    the mesh (cyclic layout), v-rows streamed by ppermute — exact count AND
    per-device table bytes ~ total/N."""
    from gms_tpu.io.generators import generate_rmat_el
    from gms_tpu.parallel.sharding import VertexShardedTrianglePlan, make_mesh

    g = build_csr(generate_rmat_el(10, 8, seed=5), num_nodes=1 << 10)
    want = tc.triangle_count_oracle(g)
    per_dev = {}
    for n in (1, 2, 8):
        mesh = make_mesh(n)
        plan = VertexShardedTrianglePlan(g, mesh, chunk=64)
        assert plan.run() == want
        per_dev[n] = plan.table_bytes_per_device
    # the table shard shrinks ~1/N (padding allows slack)
    assert per_dev[8] <= per_dev[1] / 4
    assert per_dev[2] <= per_dev[1] / 1.8


def test_vertex_sharded_kclique_matches_and_scales_memory():
    """Memory-scaling k-clique (VERDICT r03 item 5): DAG table hash-owner
    sharded, neighbor rows ring-streamed; exact counts for k in {3,4,5}
    and per-device table bytes ~ total/N."""
    from gms_tpu.io.generators import generate_rmat_el
    from gms_tpu.parallel.sharding import VertexShardedKCliquePlan, make_mesh
    from gms_tpu.algorithms.k_clique import kclique_count

    g = build_csr(generate_rmat_el(10, 8, seed=7), num_nodes=1 << 10)
    per_dev = {}
    for n in (1, 8):
        mesh = make_mesh(n)
        for k in (3, 4, 5):
            plan = VertexShardedKCliquePlan(g, mesh, k=k)
            assert plan.run() == kclique_count(g, k), (n, k)
            per_dev[n] = plan.table_bytes_per_device
    assert per_dev[8] <= per_dev[1] / 4


def test_vertex_sharded_plan_random_graphs():
    from gms_tpu.parallel.sharding import VertexShardedTrianglePlan, make_mesh

    mesh = make_mesh(4)
    for n, p, seed in ((50, 0.3, 1), (111, 0.1, 2), (200, 0.05, 3)):
        g = build_csr(random_graph(n, p, seed=seed))
        plan = VertexShardedTrianglePlan(g, mesh, chunk=32)
        assert plan.run() == tc.triangle_count_oracle(g)


def test_vertex_sharded_kclique_k6_matches_and_scales_memory():
    """Memory-scaling k>=6 (VERDICT r04 item 4): same hash-owner layout;
    the ring-built local adjacency feeds the identical fused work-stack
    (kc_stack_machine)."""
    from gms_tpu.io.generators import generate_rmat_el
    from gms_tpu.parallel.sharding import VertexShardedKCliquePlan, make_mesh
    from gms_tpu.algorithms.k_clique import kclique_count

    g = build_csr(generate_rmat_el(9, 8, seed=7), num_nodes=1 << 9)
    per_dev = {}
    for n in (1, 8):
        mesh = make_mesh(n)
        for k in (6, 7):
            plan = VertexShardedKCliquePlan(g, mesh, k=k)
            assert plan.run() == kclique_count(g, k), (n, k)
            per_dev[n] = plan.table_bytes_per_device
    assert per_dev[8] <= per_dev[1] / 4


def test_vertex_sharded_bk_matches_and_scales_memory():
    """Memory-scaling Bron-Kerbosch (VERDICT r04 item 3): DAG adjacency AND
    lower-neighbor lists hash-owner sharded; one ring pass streams both the
    local universe and the cover bitsets; the identical bk_stack_machine
    counts; exact vs the host oracle, table bytes ~ 1/N."""
    from gms_tpu.io.generators import generate_rmat_el
    from gms_tpu.parallel.sharding import VertexShardedBKPlan, make_mesh
    from gms_tpu.algorithms.bron_kerbosch import bron_kerbosch_simple

    g = build_csr(generate_rmat_el(9, 8, seed=9), num_nodes=1 << 9)
    want = len(bron_kerbosch_simple(g))
    per_dev = {}
    for n in (1, 2, 8):
        mesh = make_mesh(n)
        plan = VertexShardedBKPlan(g, mesh)
        assert plan.run() == want, n
        per_dev[n] = plan.table_bytes_per_device
    assert per_dev[8] <= per_dev[1] / 4
    assert per_dev[2] <= per_dev[1] / 1.8


def test_vertex_sharded_bk_random_graphs():
    from gms_tpu.parallel.sharding import VertexShardedBKPlan, make_mesh
    from gms_tpu.algorithms.bron_kerbosch import bron_kerbosch_simple

    mesh = make_mesh(4)
    for n, p, seed in ((40, 0.3, 1), (90, 0.12, 2), (150, 0.05, 3)):
        g = build_csr(random_graph(n, p, seed=seed))
        plan = VertexShardedBKPlan(g, mesh, root_chunk=32, batch=64)
        assert plan.run() == len(bron_kerbosch_simple(g))
