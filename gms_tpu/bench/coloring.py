"""Graph coloring benchmark (role of coloring.cc:32-153: per-trial color
counts + validity, across algorithm variants)."""

from __future__ import annotations

from gms_tpu.algorithms import coloring as gc
from gms_tpu.harness import benchmark, cli
from gms_tpu.harness.printer import print_param


def main(argv=None):
    args, g = cli.Parser("graph coloring").parse_and_load(argv)

    def make_verify(name):
        def verify(g, colors):
            print_param(f"colors_{name}", gc.unique_colors_count(colors))
            return gc.verify_coloring(g, colors) and gc.verify_delta_plus_one(g, colors)
        return verify

    for name, kern in (
        ("jp-spec", lambda g: gc.jones_plassmann(g, speculative=True)),
        ("jp-spec-lf", lambda g: gc.jones_plassmann(g, speculative=True,
                                                    priority="degree")),
        ("jp-random", lambda g: gc.jones_plassmann(g, priority="random")),
        ("jp-lf", lambda g: gc.jones_plassmann(g, priority="degree")),
        ("johansson", lambda g: gc.johansson(g)),
        ("greedy-seq", lambda g: gc.greedy_sequential(g)),
    ):
        benchmark.benchmark_kernel(
            args, g, kern,
            verifier=make_verify(name) if args.verify else None,
            labels=(f"coloring-{name}",))


if __name__ == "__main__":
    main()
