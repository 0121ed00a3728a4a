"""k-clique-star listing benchmark (role of k_clique_star_list.cc)."""

from __future__ import annotations

from gms_tpu.algorithms import k_clique_star as kcs
from gms_tpu.harness import benchmark, cli
from gms_tpu.harness.printer import print_param


def main(argv=None):
    p = cli.Parser("k-clique-star listing").add_param("clique-size", 3)
    args, g = p.parse_and_load(argv)
    k = int(args.params["clique-size"])

    def kern(g):
        return kcs.kclique_star_list(g, k, mode="count")

    def verify(g, res):
        n, total = res
        print_param("kcs_cliques", n)
        print_param("kcs_star_total", total)
        want = kcs.kclique_star_oracle(g, k)
        return n == len(want) and total == sum(len(s) for _, s in want)

    benchmark.benchmark_kernel(
        args, g, kern,
        verifier=verify if args.verify else None,
        labels=(f"kcstar-k{k}-count-tpu",),
        # PAPIW analog: derived throughput counters per trial
        counters=lambda r, s: {"kcstar_cliques_per_sec": r[0] / s,
                               "kcstar_star_total": int(r[1])})


if __name__ == "__main__":
    main()
