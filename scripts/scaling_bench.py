"""Multi-chip scaling-efficiency harness (SURVEY.md §7 step 8; BASELINE.md
north star: >=80% linear scaling 1 -> N devices).

Runs the sharded triangle-counting step on meshes of 1, 2, 4, ... N devices
over the SAME total workload (strong scaling) and reports throughput +
parallel efficiency per mesh size, plus the per-shard work balance (the
padding/skew overhead that eats efficiency on power-law graphs).

On a real pod slice run as-is (devices = jax.devices()). Without one,
`--virtual N` simulates N devices on CPU (xla_force_host_platform_device_count)
— timings then measure sharding overhead, not real speedup, but the
work-balance numbers and the compile/execute path are the real ones.

Usage:
    python scripts/scaling_bench.py [--scale 16] [--virtual 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=16)
    ap.add_argument("--deg", type=int, default=16)
    ap.add_argument("--virtual", type=int, default=0,
                    help="simulate N CPU devices (no real pod)")
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    if args.virtual:
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count={args.virtual}"
        ).strip()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gms_tpu.graphs.tiles import PaddedGraph
    from gms_tpu.io.builder import build_csr
    from gms_tpu.io.generators import generate_rmat_el
    from gms_tpu.parallel import sharding
    from gms_tpu.preprocessing import orient

    g = build_csr(generate_rmat_el(args.scale, args.deg, seed=27491095),
                  num_nodes=1 << args.scale)
    rank = orient.degree_rank(g)
    dag = orient.orient(g, rank)
    pg = PaddedGraph.from_csr(dag)
    edge_arr = dag.edge_array()

    devs = jax.devices()
    sizes = [s for s in (1, 2, 4, 8, 16, 32, 64) if s <= len(devs)]
    base = None
    rows = []
    for n in sizes:
        mesh = sharding.make_mesh(devices=np.array(devs[:n]))
        chunk = 1024
        edges, valid = sharding.pad_edges_sharded(edge_arr, chunk, n)
        fn = sharding.sharded_edge_count_fn(mesh, chunk=chunk)
        nbr, ej, vj = pg.nbr, jnp.asarray(edges), jnp.asarray(valid)
        tri = int(fn(nbr, ej, vj))  # warmup + compile
        best = min(
            _timed(lambda: fn(nbr, ej, vj).block_until_ready())
            for _ in range(args.trials)
        )
        eps = len(edge_arr) / best
        if base is None:
            base = eps
        # per-shard real (non-padding) work balance
        per_shard = valid.reshape(n, -1).sum(axis=1)
        balance = float(per_shard.min() / max(per_shard.max(), 1))
        rows.append({
            "devices": n, "seconds": best, "edges_per_sec": eps,
            "speedup": eps / base, "efficiency": eps / base / n,
            "shard_balance": balance, "triangles": tri,
        })
        print(f"@@@ scaling {n} {best:.6f} {eps:.0f} "
              f"{rows[-1]['efficiency']:.3f} {balance:.3f}")
    print(json.dumps(rows))


def _timed(f) -> float:
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
