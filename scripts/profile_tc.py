"""Per-tier roofline profile of the flagship TrianglePlan on the real chip.

For each tier kernel: wall time (best of N), bytes moved (gather traffic
model), achieved GB/s. Steers VERDICT item 1 (close the ~50 GB/s -> HBM-peak
gap)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCALE = int(os.environ.get("BENCH_SCALE", "18"))
DEGREE = int(os.environ.get("BENCH_DEGREE", "16"))
TRIALS = int(os.environ.get("BENCH_TRIALS", "5"))
SEED = 27491095


def timed(fn, *args, trials=TRIALS, **kw):
    out = fn(*args, **kw)
    if hasattr(out, "block_until_ready"):
        out.block_until_ready()
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        r = fn(*args, **kw)
        if hasattr(r, "block_until_ready"):
            r.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return out, best


def main():
    from gms_tpu.algorithms.triangle_count import (
        TrianglePlan, count_dag_edges, count_hub_edges)
    from gms_tpu.io.builder import build_csr
    from gms_tpu.io.generators import generate_rmat_el

    g = build_csr(generate_rmat_el(SCALE, DEGREE, seed=SEED),
                  num_nodes=1 << SCALE)
    t0 = time.perf_counter()
    plan = TrianglePlan(g)
    print(f"plan build: {time.perf_counter()-t0:.2f}s")
    print(f"graph: V={g.num_nodes} E_undir={g.num_edges_undirected} "
          f"d_pad={plan.padded.d_pad}")

    total_t = 0.0
    total_bytes = 0
    for wa, wb, c, edges, valid in plan.tiers:
        n_e = int(np.asarray(valid).sum())
        _, t = timed(count_dag_edges, plan.padded.nbr, edges, valid,
                     chunk=c, method=plan.method, width_a=wa, width_b=wb)
        nbytes = len(valid) * (wa + wb) * 4  # row gathers (padded count)
        total_t += t
        total_bytes += nbytes
        print(f"  cmp tier ({wa:4d},{wb:4d}) chunk={c:6d} edges={n_e:8d} "
              f"pad={len(valid):8d} t={t*1e3:8.2f}ms "
              f"{nbytes/t/1e9:7.1f} GB/s model")
    if plan.hub:
        hw = plan.hub_rows.shape[1]
        nw = plan.hub_rows.shape[0]
        print(f"  hub rows: [{nw}, {hw}] words "
              f"({nw*hw*4/1e6:.1f} MB)")
        for w, wc, edges, valid in plan.hub:
            n_e = int(np.asarray(valid).sum())
            _, t = timed(count_hub_edges, plan.hub_rows, None, edges, valid,
                         chunk=wc, width=w)
            nbytes = len(valid) * 2 * w * 4
            total_t += t
            total_bytes += nbytes
            print(f"  hub tier w={w:4d} chunk={wc:6d} edges={n_e:8d} "
                  f"pad={len(valid):8d} t={t*1e3:8.2f}ms "
                  f"{nbytes/t/1e9:7.1f} GB/s model")

    _, t_fused = timed(lambda: plan._fused())
    print(f"sum of tiers: {total_t*1e3:.2f}ms  model bytes={total_bytes/1e9:.3f} GB"
          f"  -> {total_bytes/total_t/1e9:.1f} GB/s")
    print(f"fused: {t_fused*1e3:.2f}ms -> "
          f"{g.num_edges_undirected/t_fused/1e6:.1f}M edges/s")


if __name__ == "__main__":
    main()
