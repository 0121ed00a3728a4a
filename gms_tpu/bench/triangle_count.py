"""Triangle counting benchmark (role of triangle_count.cc:22-48)."""

from __future__ import annotations

from gms_tpu.algorithms import triangle_count as tc
from gms_tpu.harness import benchmark, cli


def main(argv=None):
    args, g = cli.Parser("triangle counting").parse_and_load(argv)

    def verify(g, result):
        return int(result) == tc.triangle_count_oracle(g)

    state = {}

    def build(g):
        state["plan"] = tc.TrianglePlan(g)
        return state["plan"]

    benchmark.benchmark_kernel_bk(
        args, g,
        build=build,
        kernel=lambda plan: plan.run(),
        verifier=verify if args.verify else None,
        labels=("tc-total-tiered-tpu",),
        # PAPIW analog: modeled gather traffic -> achieved GB/s
        counters=lambda r, s: {
            "tc_edges_per_sec": g.num_edges_undirected / s,
            "tc_model_gbps": state["plan"].traffic_bytes() / s / 1e9},
    )

    def pv_kernel(g):
        return tc.triangle_count_per_vertex(g)

    def pv_verify(g, result):
        import numpy as np

        return np.array_equal(result, tc.triangle_count_per_vertex_oracle(g))

    benchmark.benchmark_kernel(
        args, g, pv_kernel,
        verifier=pv_verify if args.verify else None,
        labels=("tc-vertex-tpu",),
    )


if __name__ == "__main__":
    main()
