"""Round benchmark: triangle-counting throughput on the flagship kernel.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol mirrors the reference's BenchmarkKernelBk split
(gms/common/benchmark.h:96-133): graph build + plan prep are untimed
("buildTime"); the reported number is the best trial of the device kernel
(steady-state, compile cached by the warmup trial).

Baseline: the reference publishes no numbers (BASELINE.md). If
`baseline_measured.json` exists at the repo root (written by
scripts/measure_reference.py after building the C++ reference's
triangle_count benchmark on this host), vs_baseline = ours / reference
on the same graph; otherwise vs_baseline is null.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SCALE = int(os.environ.get("BENCH_SCALE", "18"))
DEGREE = int(os.environ.get("BENCH_DEGREE", "16"))
TRIALS = int(os.environ.get("BENCH_TRIALS", "5"))
SEED = 27491095  # reference default (gapbs/util.h kRandSeed)


def main() -> None:
    import jax

    from gms_tpu.algorithms.triangle_count import TrianglePlan
    from gms_tpu.io.builder import build_csr
    from gms_tpu.io.generators import generate_rmat_el

    g = build_csr(generate_rmat_el(SCALE, DEGREE, seed=SEED), num_nodes=1 << SCALE)
    plan = TrianglePlan(g)

    tri = plan.run()  # warmup: compiles every tier kernel
    best = float("inf")
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        got = plan.run()
        best = min(best, time.perf_counter() - t0)
        assert got == tri, f"nondeterministic count: {got} != {tri}"

    edges_per_sec = g.num_edges_undirected / best

    vs_baseline = None
    ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "baseline_measured.json")
    if os.path.exists(ref_path):
        with open(ref_path) as f:
            ref = json.load(f)
        key = f"tc_rmat{SCALE}_edges_per_sec"
        if key in ref and ref[key] > 0:
            vs_baseline = edges_per_sec / ref[key]

    print(json.dumps({
        "metric": f"tc_rmat{SCALE}_throughput",
        "value": round(edges_per_sec, 1),
        "unit": "edges/sec",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline is not None else None,
    }))
    print(f"# triangles={tri} trial_time={best:.4f}s "
          f"platform={jax.devices()[0].platform} scale={SCALE} deg={DEGREE}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
