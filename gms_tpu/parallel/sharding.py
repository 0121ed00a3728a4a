"""Multi-chip execution: mesh + shard_map + psum over the work axis.

The capability the reference lacks entirely (SURVEY.md §2.13: OpenMP only;
Slurm fan-out is out-of-process). TPU-native replacement per BASELINE.json
north star: a 1-D device mesh over the pod slice; *work* (edge tiles / root
vertices) sharded along it; adjacency + ordering tables replicated; per-shard
exact counts reduced with `psum` (rides ICI within a slice, DCN across hosts).

Works identically on a virtual CPU mesh (xla_force_host_platform_device_count)
— that is how tests and the driver's dryrun exercise it without N real chips.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from gms_tpu.graphs.tiles import round_up
from gms_tpu.sets import ops

WORK_AXIS = "work"


def make_mesh(n_devices: int | None = None, *, devices=None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (WORK_AXIS,))


def pad_edges_sharded(edges: np.ndarray, chunk: int, n_shards: int):
    """Pad an edge array so it splits evenly into n_shards of chunk-multiples."""
    e = len(edges)
    ep = round_up(max(e, 1), chunk * n_shards)
    out = np.zeros((ep, 2), dtype=np.int32)
    out[:e] = edges
    valid = np.zeros(ep, dtype=np.int32)
    valid[:e] = 1
    return out, valid


def sharded_edge_count_fn(mesh: Mesh, *, chunk: int, method: str = "auto"):
    """Build the jitted multi-chip Σ|N⁺(u)∩N⁺(v)| step.

    nbr replicated, edges+valid sharded on the work axis, scalar psum out.
    """

    def shard_body(nbr, edges, valid):
        ec = edges.reshape(-1, chunk, 2)
        vc = valid.reshape(-1, chunk)

        def body(acc, xs):
            e, v = xs
            a = jnp.take(nbr, e[:, 0], axis=0)
            b = jnp.take(nbr, e[:, 1], axis=0)
            cnt = ops.intersect_count(a, b, method=method)
            return acc + jnp.sum(cnt * v, dtype=jnp.int64), None

        # initial carry must be marked device-varying on the work axis
        acc0 = jax.lax.pcast(jnp.int64(0), (WORK_AXIS,), to="varying")
        local, _ = jax.lax.scan(body, acc0, (ec, vc))
        return jax.lax.psum(local, WORK_AXIS)

    fn = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(None, None), P(WORK_AXIS, None), P(WORK_AXIS)),
        out_specs=P(),
    )
    return jax.jit(fn)


def sharded_triangle_count(g, mesh: Mesh, *, rank=None, chunk: int = 1024,
                           method: str = "auto") -> int:
    """End-to-end multi-chip triangle count of a host CSRGraph."""
    from gms_tpu.preprocessing import orient
    from gms_tpu.graphs.tiles import PaddedGraph

    if rank is None:
        rank = orient.degree_rank(g)
    dag = orient.orient(g, rank)
    pg = PaddedGraph.from_csr(dag)
    edges, valid = pad_edges_sharded(dag.edge_array(), chunk, len(mesh.devices))
    fn = sharded_edge_count_fn(mesh, chunk=chunk, method=method)
    return int(fn(pg.nbr, jnp.asarray(edges), jnp.asarray(valid)))
