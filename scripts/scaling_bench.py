"""Multi-chip scaling-efficiency harness (SURVEY.md §7 step 8; BASELINE.md
north star: >=80% linear scaling 1 -> N devices).

Runs the TUNED sharded triangle plan (parallel/sharding.ShardedTrianglePlan —
the same 2-D compare tiers + grouped hub-prefix kernels as the single-chip
flagship) on meshes of 1, 2, 4, ... N devices over the SAME total workload
(strong scaling) and reports throughput + parallel efficiency per mesh size,
plus the per-shard modeled-work balance (the padding/skew overhead that eats
efficiency on power-law graphs).

On a real pod slice run as-is (devices = jax.devices()). Without one,
`--virtual N` simulates N devices on CPU (xla_force_host_platform_device_count)
— timings then measure sharding overhead, not real speedup, but the
work-balance numbers and the compile/execute/collective path are the real
ones. `--out FILE` writes the rows as JSON (the SCALING_r{N}.json artifact).

Usage:
    python scripts/scaling_bench.py [--scale 16] [--virtual 8] [--out SCALING.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=16)
    ap.add_argument("--deg", type=int, default=16)
    ap.add_argument("--virtual", type=int, default=0,
                    help="simulate N CPU devices (no real pod)")
    ap.add_argument("--trials", type=int, default=4)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    if args.virtual:
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count={args.virtual}"
        ).strip()

    import jax

    if args.virtual:
        # a pre-registered accelerator plugin (axon tunnel) wins over the
        # env var; the config update overrides it reliably (see tests/conftest)
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from gms_tpu.io.builder import build_csr
    from gms_tpu.io.generators import generate_rmat_el
    from gms_tpu.parallel.sharding import ShardedTrianglePlan, make_mesh

    g = build_csr(generate_rmat_el(args.scale, args.deg, seed=27491095),
                  num_nodes=1 << args.scale)

    devs = jax.devices()
    sizes = [s for s in (1, 2, 4, 8, 16, 32, 64) if s <= len(devs)]
    base = None
    rows = []
    for n in sizes:
        mesh = make_mesh(devices=np.array(devs[:n]))
        plan = ShardedTrianglePlan(g, mesh)
        tri, per_trial = plan.run_steady(args.trials)
        eps = g.num_edges_undirected / per_trial
        if base is None:
            base = eps
        work = plan.shard_work_model()
        balance = float(work.min() / max(work.max(), 1))
        rows.append({
            "devices": n, "seconds": per_trial, "edges_per_sec": eps,
            "speedup": eps / base, "efficiency": eps / base / n,
            "shard_balance": balance, "triangles": tri,
            "model_bytes_per_shard": work.tolist(),
        })
        print(f"@@@ scaling {n} {per_trial:.6f} {eps:.0f} "
              f"{rows[-1]['efficiency']:.3f} {balance:.3f}")
    out = {
        "platform": jax.devices()[0].platform,
        "virtual": args.virtual,
        "scale": args.scale,
        "degree": args.deg,
        "rows": rows,
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
