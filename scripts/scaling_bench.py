"""Multi-chip scaling-efficiency harness (SURVEY.md §7 step 8; BASELINE.md
north star: >=80% linear scaling 1 -> N devices).

Three suites over a mesh of 1, 2, 4, ... N devices:

  * strong: the TUNED sharded triangle plan (parallel/sharding.
    ShardedTrianglePlan — same 2-D compare tiers + grouped hub-prefix
    kernels as the single-chip flagship) on the SAME total workload.
  * weak: per-device workload held constant (scale grows with the mesh:
    RMAT scale base+log2(n), so edges/device ~ constant) — the regime a
    pod actually runs in.
  * memory: VertexShardedTrianglePlan — the adjacency table itself is
    sharded (cyclic rows + ring ppermute streaming), proving per-chip HBM
    drops ~1/N while the count stays exact.

Efficiency evidence on a virtual CPU mesh: all N virtual devices share
this host's cores, so measured wall-clock CANNOT show real speedup —
`modeled_efficiency` (per-shard modeled gather bytes, mean/max — the
fraction of linear scaling the work split itself permits) is the
device-count-scaling evidence; wall-clock numbers are still recorded for
dispatch-overhead tracking. On a real pod slice run as-is.

Usage:
    python scripts/scaling_bench.py [--scale 17] [--virtual 8]
        [--suites strong,weak,memory] [--out SCALING.json]
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
    ap.add_argument("--scale", type=int, default=17)
    ap.add_argument("--deg", type=int, default=16)
    ap.add_argument("--weak-base-scale", type=int, default=14)
    ap.add_argument("--virtual", type=int, default=0,
                    help="simulate N CPU devices (no real pod)")
    ap.add_argument("--trials", type=int, default=4)
    ap.add_argument("--suites", type=str, default="strong,weak,memory")
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
    from gms_tpu.parallel.sharding import (
        ShardedTrianglePlan, VertexShardedTrianglePlan, make_mesh)

    devs = jax.devices()
    sizes = [s for s in (1, 2, 4, 8, 16, 32, 64) if s <= len(devs)]
    suites = args.suites.split(",")
    out = {
        "platform": devs[0].platform,
        "virtual": args.virtual,
        "scale": args.scale,
        "degree": args.deg,
    }

    def graph(scale):
        return build_csr(generate_rmat_el(scale, args.deg, seed=27491095),
                         num_nodes=1 << scale)

    if "strong" in suites:
        g = graph(args.scale)
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
            modeled = float(work.mean() / max(work.max(), 1))
            rows.append({
                "devices": n, "seconds": per_trial, "edges_per_sec": eps,
                "speedup": eps / base, "efficiency": eps / base / n,
                "modeled_efficiency": modeled, "triangles": tri,
                "model_bytes_per_shard": work.tolist(),
            })
            print(f"@@@ strong {n} {per_trial:.6f} {eps:.0f} "
                  f"{rows[-1]['efficiency']:.3f} modeled={modeled:.3f}")
        out["strong"] = rows

    if "weak" in suites:
        rows = []
        base = None
        for n in sizes:
            scale = args.weak_base_scale + int(np.log2(n))
            g = graph(scale)
            mesh = make_mesh(devices=np.array(devs[:n]))
            plan = ShardedTrianglePlan(g, mesh)
            tri, per_trial = plan.run_steady(args.trials)
            eps = g.num_edges_undirected / per_trial
            if base is None:
                base = eps
            work = plan.shard_work_model()
            modeled = float(work.mean() / max(work.max(), 1))
            rows.append({
                "devices": n, "scale": scale, "seconds": per_trial,
                "edges_per_sec": eps,
                "weak_efficiency": eps / (base * n),
                "modeled_efficiency": modeled, "triangles": tri,
            })
            print(f"@@@ weak {n} s={scale} {per_trial:.6f} {eps:.0f} "
                  f"weak_eff={rows[-1]['weak_efficiency']:.3f} "
                  f"modeled={modeled:.3f}")
        out["weak"] = rows

    if "memory" in suites:
        mem_scale = min(args.scale, 16)
        out["memory_scale"] = mem_scale  # ADVICE r03: record the actual
        g = graph(mem_scale)             # scale the rows measured, not the
        rows = []                        # CLI default
        base_bytes = None
        for n in sizes:
            mesh = make_mesh(devices=np.array(devs[:n]))
            plan = VertexShardedTrianglePlan(g, mesh)
            tri, per_trial = plan.run_steady(max(args.trials // 2, 1))
            work = plan.shard_work_model()
            modeled = float(work.mean() / max(work.max(), 1))
            if base_bytes is None:
                base_bytes = plan.table_bytes_per_device
            rows.append({
                "devices": n, "scale": mem_scale, "seconds": per_trial,
                "triangles": tri,
                "table_bytes_per_device": plan.table_bytes_per_device,
                "table_shrink": base_bytes / plan.table_bytes_per_device,
                "edge_bytes_per_device": plan.edge_bytes_per_device,
                "modeled_efficiency": modeled,
            })
            print(f"@@@ memory {n} s={mem_scale} {per_trial:.6f} "
                  f"table/dev={plan.table_bytes_per_device} "
                  f"shrink={rows[-1]['table_shrink']:.2f}x "
                  f"modeled={modeled:.3f}")
        out["memory"] = rows

        # memory-scaling k-clique (VERDICT r03 item 5): table_bytes/device
        # must drop ~1/N on the k-clique path too, with exact counts
        from gms_tpu.parallel.sharding import VertexShardedKCliquePlan

        gk = graph(min(args.scale, 13))
        krows = []
        kbase = None
        for n in sizes:
            mesh = make_mesh(devices=np.array(devs[:n]))
            t0 = time.perf_counter()
            plan = VertexShardedKCliquePlan(gk, mesh, k=5)
            cnt = plan.run()
            dt = time.perf_counter() - t0
            if kbase is None:
                kbase = plan.table_bytes_per_device
            krows.append({
                "devices": n, "scale": min(args.scale, 13), "k": 5,
                "seconds": dt, "count": cnt,
                "table_bytes_per_device": plan.table_bytes_per_device,
                "table_shrink": kbase / plan.table_bytes_per_device,
            })
            print(f"@@@ memory_kclique {n} k=5 count={cnt} "
                  f"table/dev={plan.table_bytes_per_device} "
                  f"shrink={krows[-1]['table_shrink']:.2f}x")
        assert len({r["count"] for r in krows}) == 1, krows
        out["memory_kclique"] = krows

        # memory-scaling k >= 6 (VERDICT r04 item 4): ring-built local
        # adjacency feeding the fused work-stack, table shrink ~1/N
        g6 = graph(min(args.scale, 11))
        k6rows = []
        k6base = None
        for n in sizes:
            mesh = make_mesh(devices=np.array(devs[:n]))
            t0 = time.perf_counter()
            plan = VertexShardedKCliquePlan(g6, mesh, k=6)
            cnt = plan.run()
            dt = time.perf_counter() - t0
            if k6base is None:
                k6base = plan.table_bytes_per_device
            k6rows.append({
                "devices": n, "scale": min(args.scale, 11), "k": 6,
                "seconds": dt, "count": cnt,
                "table_bytes_per_device": plan.table_bytes_per_device,
                "table_shrink": k6base / plan.table_bytes_per_device,
            })
            print(f"@@@ memory_kclique6 {n} count={cnt} "
                  f"shrink={k6rows[-1]['table_shrink']:.2f}x")
        assert len({r["count"] for r in k6rows}) == 1, k6rows
        out["memory_kclique6"] = k6rows

        # memory-scaling Bron-Kerbosch (VERDICT r04 item 3): DAG
        # adjacency + lower lists both sharded; exact counts, ~1/N tables
        from gms_tpu.parallel.sharding import VertexShardedBKPlan

        gb = graph(min(args.scale, 11))
        brows = []
        bbase = None
        for n in sizes:
            mesh = make_mesh(devices=np.array(devs[:n]))
            t0 = time.perf_counter()
            plan = VertexShardedBKPlan(gb, mesh)
            cnt = plan.run()
            dt = time.perf_counter() - t0
            if bbase is None:
                bbase = plan.table_bytes_per_device
            brows.append({
                "devices": n, "scale": min(args.scale, 11),
                "seconds": dt, "count": cnt,
                "table_bytes_per_device": plan.table_bytes_per_device,
                "table_shrink": bbase / plan.table_bytes_per_device,
            })
            print(f"@@@ memory_bk {n} count={cnt} "
                  f"shrink={brows[-1]['table_shrink']:.2f}x")
        assert len({r["count"] for r in brows}) == 1, brows
        out["memory_bk"] = brows

    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
