"""k-clique counting benchmark (role of k_clique_count_set_based.cc:27-47 and
k_clique_list_danisch_node_parallel.cc:12-51; --param clique-size, default 8)."""

from __future__ import annotations

from gms_tpu.algorithms import k_clique
from gms_tpu.harness import benchmark, cli
from gms_tpu.preprocessing import degeneracy


def main(argv=None):
    p = cli.Parser("k-clique counting").add_param("clique-size", 8)
    args, g = p.parse_and_load(argv)
    k = int(args.params["clique-size"])

    def verify(g, result):
        return int(result) == k_clique.kclique_count_oracle(g, k)

    # degeneracy (Danisch-equivalent exact peel) preprocessing, timed per trial
    benchmark.benchmark_kernel_bk_pp(
        args, g,
        build=lambda g: g,
        preprocess=lambda g: degeneracy.degeneracy_ordering_rank(g)[0],
        kernel=lambda g, rank: k_clique.kclique_count(g, k, rank=rank),
        verifier=verify if args.verify else None,
        labels=(f"kclique-k{k}-degeneracy-tpu",),
        # PAPIW analog: derived throughput counters per trial
        counters=lambda r, s: {f"kclique{k}_count": int(r),
                               f"kclique{k}_per_sec": int(r) / s},
    )
    # ADG preprocessing variant (the reference's epsilon sweep headline)
    for eps in (0.1, 0.01):
        benchmark.benchmark_kernel_bk_pp(
            args, g,
            build=lambda g: g,
            preprocess=lambda g, e=eps: degeneracy.adg_ordering_rank(g, e),
            kernel=lambda g, rank: k_clique.kclique_count(g, k, rank=rank),
            verifier=verify if args.verify else None,
            labels=(f"kclique-k{k}-adg-eps{eps}-tpu",),
            counters=lambda r, s: {f"kclique{k}_count": int(r),
                                   f"kclique{k}_per_sec": int(r) / s},
        )


if __name__ == "__main__":
    main()
