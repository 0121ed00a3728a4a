"""Round benchmark: mining throughput on the flagship kernels.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} for the
headline metric (triangle-count edges/sec), plus one comment line per extra
metric (k-clique k=5, Bron-Kerbosch, k-clique-star) on stderr.

Protocol mirrors the reference's BenchmarkKernelBk split
(gms/common/benchmark.h:96-133): graph build + plan prep are untimed
("buildTime"); the reported number is steady-state device throughput —
`trials` chained executions are enqueued and fetched with ONE device->host
readback, so the tunnel round-trip latency of this remote-attached chip is
paid once, not per trial (each trial is still a full re-execution: the work
arrays are rotated by a shift derived from the previous trial's count, and
all counts are asserted identical).

Robustness (VERDICT r03 item 3): every extra metric runs in its OWN
subprocess under a hard time box (BENCH_EXTRA_BUDGET seconds, default 900)
and `BENCH_extra.json` is rewritten after EACH metric — a hung kernel can
no longer take down the whole artifact or leave a stale file behind. The
r03 bench died at rc=124 because BK at scale 16 had no time box.

Baseline: the reference publishes no numbers (BASELINE.md). If
`baseline_measured.json` exists at the repo root (written by
scripts/measure_reference.py after building the C++ reference's benchmarks
on this host), vs_baseline = ours / reference on the same graph.

Roofline: the modeled HBM gather traffic of the TC plan is printed as
achieved GB/s. Set BENCH_ROOFLINE=0 to skip measuring this device's stream
bandwidth (chained xor-sum over a resident 256MB array).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SCALE = int(os.environ.get("BENCH_SCALE", "18"))
DEGREE = int(os.environ.get("BENCH_DEGREE", "16"))
TRIALS = int(os.environ.get("BENCH_TRIALS", "32"))
SEED = 27491095  # reference default (gapbs/util.h kRandSeed)

# extra metrics: (name, default scale env-overridable)
EXTRA_SCALES = {
    "kclique5": int(os.environ.get("BENCH_KCLIQUE_SCALE",
                                   str(min(SCALE, 16)))),
    "kclique6": int(os.environ.get("BENCH_KCLIQUE6_SCALE",
                                   str(min(SCALE, 13)))),
    "kclique8": int(os.environ.get("BENCH_KCLIQUE8_SCALE",
                                   str(min(SCALE, 12)))),
    "bron_kerbosch": int(os.environ.get("BENCH_BK_SCALE",
                                        str(min(SCALE, 14)))),
    "k_clique_star": int(os.environ.get("BENCH_STAR_SCALE",
                                        str(min(SCALE, 12)))),
    "coloring": int(os.environ.get("BENCH_COLORING_SCALE",
                                   str(min(SCALE, 16)))),
    "lp_auc": int(os.environ.get("BENCH_LP_SCALE", str(min(SCALE, 16)))),
    "vf2": int(os.environ.get("BENCH_VF2_SCALE", str(min(SCALE, 14)))),
}
EXTRA_BUDGET = int(os.environ.get("BENCH_EXTRA_BUDGET", "900"))


def _stream_bandwidth(reps: int = 64) -> float:
    """Measured stream bandwidth (GB/s): chained xor-sums inside ONE
    program (this chip has a ~20ms fixed cost per executable execution,
    so per-dispatch chaining would understate the ceiling ~6x)."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    x = jnp.asarray(np.random.default_rng(1).integers(
        0, 2**31, (64 * 1024 * 1024,), dtype=np.int32))

    @functools.partial(jax.jit, static_argnames=("reps",))
    def scan(x, salt0, *, reps):
        def step(salt, _):
            out = jnp.sum(x ^ salt, dtype=jnp.int64)
            return (out % jnp.int64(1009)).astype(jnp.int32) + salt + 1, out

        _, outs = jax.lax.scan(step, salt0, None, length=reps)
        return outs

    np.asarray(scan(x, jnp.int32(3), reps=reps))  # warm + autotune
    t0 = time.perf_counter()
    np.asarray(scan(x, jnp.int32(11), reps=reps))
    dt = (time.perf_counter() - t0) / reps
    return x.size * 4 / dt / 1e9


def main() -> None:
    import jax

    from gms_tpu.algorithms.triangle_count import TrianglePlan
    from gms_tpu.io.builder import build_csr
    from gms_tpu.io.generators import generate_rmat_el

    g = build_csr(generate_rmat_el(SCALE, DEGREE, seed=SEED),
                  num_nodes=1 << SCALE)
    plan = TrianglePlan(g)

    tri, per_trial = plan.run_steady(TRIALS)
    edges_per_sec = g.num_edges_undirected / per_trial

    gb = plan.traffic_bytes() / 1e9
    roof = f"model_traffic={gb:.2f}GB achieved={gb/per_trial:.0f}GB/s"
    if os.environ.get("BENCH_ROOFLINE", "1") != "0":
        # default ON: the committed artifact must carry the denominator
        # (VERDICT r02 next-step 4), not just the achieved number.
        # Wall-clock per trial = fixed tunnel/dispatch latency (amortized
        # over TRIALS) + true device time; the slope between two trial
        # counts isolates the device-only number (VERDICT r03 item 7: say
        # WHERE the non-roofline fraction goes).
        _, t_small = plan.run_steady(max(TRIALS // 4, 2))
        small = max(TRIALS // 4, 2)
        dev_per_trial = max(
            (per_trial * TRIALS - t_small * small) / (TRIALS - small),
            1e-9)
        fixed_ms = max(t_small * small - dev_per_trial * small, 0) * 1e3
        bw = _stream_bandwidth()
        roof += (f" stream_peak={bw:.0f}GB/s frac_wall={gb/per_trial/bw:.0%}"
                 f" device_time={dev_per_trial*1e3:.2f}ms/trial"
                 f" frac_device={gb/dev_per_trial/bw:.0%}"
                 f" fixed_overhead={fixed_ms:.1f}ms/dispatch")

    ref = _load_baseline()
    vs_baseline = None
    key = f"tc_rmat{SCALE}_edges_per_sec"
    if ref.get(key, 0) > 0:
        vs_baseline = edges_per_sec / ref[key]

    print(json.dumps({
        "metric": f"tc_rmat{SCALE}_throughput",
        "value": round(edges_per_sec, 1),
        "unit": "edges/sec",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline is not None else None,
    }))
    print(f"# triangles={tri} trial_time={per_trial:.4f}s "
          f"platform={jax.devices()[0].platform} scale={SCALE} deg={DEGREE} "
          f"{roof}", file=sys.stderr)

    if os.environ.get("BENCH_EXTRA", "1") != "0":
        _extra_metrics()


def _load_baseline() -> dict:
    path = os.path.join(REPO, "baseline_measured.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def _extra_metrics() -> None:
    """k-clique(5), Bron-Kerbosch, and k-clique-star rows, each in its own
    time-boxed subprocess; BENCH_extra.json rewritten after every metric."""
    out_path = os.path.join(REPO, "BENCH_extra.json")
    extra = {"scales": EXTRA_SCALES, "budget_seconds": EXTRA_BUDGET}
    for name, scale in EXTRA_SCALES.items():
        t0 = time.perf_counter()
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--extra", name,
                 str(scale)],
                capture_output=True, text=True, timeout=EXTRA_BUDGET)
            last = [ln for ln in r.stdout.splitlines()
                    if ln.startswith("{")]
            if r.returncode == 0 and last:
                extra[name] = json.loads(last[-1])
            else:
                extra[name] = {"error": f"rc={r.returncode}",
                               "stderr_tail": r.stderr[-400:]}
        except subprocess.TimeoutExpired:
            extra[name] = {"error": f"timeout>{EXTRA_BUDGET}s",
                           "seconds": time.perf_counter() - t0}
        row = extra[name]
        if "error" in row:
            print(f"# {name} failed: {row['error']}", file=sys.stderr)
        else:
            print(f"# {name} count={row.get('count')} "
                  f"time={row.get('seconds', 0):.2f}s "
                  f"vs_baseline={row.get('vs_baseline')}", file=sys.stderr)
        with open(out_path, "w") as f:  # incremental: survive later hangs
            json.dump(extra, f, indent=1)


def _run_extra(name: str, scale: int) -> dict:
    """Child-process body: run one extra metric, print a JSON dict."""
    from gms_tpu.io.builder import build_csr
    from gms_tpu.io.generators import generate_rmat_el

    ref = _load_baseline()
    g = build_csr(generate_rmat_el(scale, DEGREE, seed=SEED),
                  num_nodes=1 << scale)
    if name == "kclique5":
        from gms_tpu.algorithms.k_clique import kclique_count

        t0 = time.perf_counter()
        n = kclique_count(g, 5)
        dt = time.perf_counter() - t0
        base = (ref.get("kclique5_per_sec")
                if ref.get("kclique5_scale") == scale else None)
        return {"count": int(n), "seconds": dt, "scale": scale,
                "cliques_per_sec": n / dt if dt else None,
                "vs_baseline": (n / dt) / base if base else None}
    if name in ("kclique6", "kclique8"):
        from gms_tpu.algorithms.k_clique import kclique_count

        k = int(name[-1])
        kclique_count(g, k)                         # compile warm-up
        ts = []
        n = 0
        for _ in range(3):
            t0 = time.perf_counter()
            n = kclique_count(g, k)
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        base = ref.get(f"{name}_scale{scale}_seconds")
        return {"count": int(n), "seconds": dt, "scale": scale, "k": k,
                "protocol": "best of 3 warm trials (fused work-stack)",
                "cliques_per_sec": n / dt if dt else None,
                "vs_baseline": base / dt if base else None}
    if name == "bron_kerbosch":
        from gms_tpu.algorithms.bron_kerbosch import bron_kerbosch

        # compile every kernel variant of the real plan on all-pad chunks
        # (ADVICE r04 item 3: the old roots=arange(64) warm-up compiled
        # none of the real tier shapes)
        bron_kerbosch(g, warm_compile=True)
        t0 = time.perf_counter()
        n = bron_kerbosch(g)
        dt = time.perf_counter() - t0
        base_s = ref.get(f"bk_scale{scale}_seconds")
        bound_s = ref.get(f"bk_scale{scale}_timeout_seconds")
        row = {"count": int(n), "seconds": dt, "scale": scale,
               "cliques_per_sec": n / dt if dt else None,
               "vs_baseline": base_s / dt if base_s else (
                   bound_s / dt if bound_s else None)}
        if not base_s and bound_s:
            # reference produced no row within bound_s on this workload
            row["vs_baseline_is_lower_bound"] = True
        return row
    if name == "k_clique_star":
        from gms_tpu.algorithms.k_clique_star import kclique_star_list

        t0 = time.perf_counter()
        n, star_total = kclique_star_list(g, 4, mode="count")
        dt = time.perf_counter() - t0
        base_s = ref.get(f"star4_scale{scale}_seconds")
        return {"count": int(n), "star_total": int(star_total),
                "seconds": dt, "scale": scale, "k": 4,
                "stars_per_sec": n / dt if dt else None,
                "vs_baseline": base_s / dt if base_s else None}
    if name == "coloring":
        from gms_tpu.algorithms import coloring as gc

        run = lambda: gc.jones_plassmann(g, speculative=True,
                                         priority="degree")
        c = run()                                  # compile + converge
        assert gc.verify_coloring(g, c) and gc.verify_degree_bound(g, c)
        colors = gc.unique_colors_count(c)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        variants = ref.get(f"coloring_scale{scale}_trials",
                           {}).get("variants", [])
        # best NON-DEGENERATE reference variant (colors reported and
        # <= 500 — excludes the 0.002s/9856-color trivial assignment)
        cand = [(t, cc) for t, cc in variants if cc is not None and cc <= 500]
        base = min(cand) if cand else None
        return {"seconds": dt, "colors": int(colors), "scale": scale,
                "variant": "jp-spec-lf (best of 3 trials)",
                "ref_best_seconds": base[0] if base else None,
                "ref_best_colors": base[1] if base else None,
                "vs_baseline": base[0] / dt if base else None}
    if name == "lp_auc":
        from gms_tpu.algorithms import link_prediction as lp

        m = g.num_edges_undirected
        g_train, g_test = lp.extract_random_test_edges(
            g, int(0.01 * m), seed=1)
        plan = lp.AUCPlan(g, g_train, g_test, 100000, metric="jaccard",
                          seed=2)
        auc, dt = plan.run_steady(8)
        trials = ref.get(f"lp_scale{scale}_trial_seconds", {}).get(
            "trials", [])
        base = min(trials[0:3]) if len(trials) >= 3 else None  # jaccard band
        row = {"auc": round(auc, 4), "seconds": dt, "scale": scale,
               "samples": 100000, "metric": "jaccard",
               "protocol": "steady (8 chained evaluations, one fetch)",
               "vs_baseline": base / dt if base else None}
        # the MXU all-pairs top-q sweep vs the reference's ranking kernel
        t0 = time.perf_counter()
        edges, scores = lp.link_prediction_similarity(
            g_train, 100, metric="jaccard")
        ap = time.perf_counter() - t0
        row["all_pairs_topq_seconds"] = ap
        row["all_pairs_q"] = int(len(edges))
        if len(trials) >= 8:
            row["all_pairs_vs_baseline"] = trials[7] / ap
        return row
    if name == "vf2":
        import numpy as np

        from gms_tpu.algorithms import subgraph_iso as si

        row = {"scale": scale, "induced": True, "limit": 1,
               "protocol": ("best of 3 warm trials per pattern; hybrid = "
                            "budgeted host DFS pre-pass falling through "
                            "to the device search; device = host_budget=0")}
        for pname, pedges in si.VF2_PATTERNS.items():
            p = build_csr(np.array(pedges, dtype=np.int64))
            base = ref.get(f"vf2_{pname}_scale{scale}_solve_seconds")
            entry = {"ref_solve_seconds": base}
            for mode, hb in (("hybrid", 200_000), ("device", 0)):
                res = si.subgraph_isomorphism(g, p, induced=True, limit=1,
                                              host_budget=hb)
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    res = si.subgraph_isomorphism(
                        g, p, induced=True, limit=1, host_budget=hb)
                    ts.append(time.perf_counter() - t0)
                entry[mode] = {"seconds": min(ts), "found": int(len(res)),
                               "vs_baseline": (base / min(ts)
                                               if base else None)}
            row[pname] = entry
        # headline = the pattern where the search actually backtracks,
        # on the pure DEVICE path (the hybrid's host pre-pass wins c5 by
        # candidate ordering — real, but a CPU-vs-CPU comparison)
        row["seconds"] = row["c5"]["device"]["seconds"]
        row["vs_baseline"] = row["c5"]["device"]["vs_baseline"]
        return row
    raise ValueError(name)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--extra":
        print(json.dumps(_run_extra(sys.argv[2], int(sys.argv[3]))
                         if len(sys.argv) > 3
                         else _run_extra(sys.argv[2],
                                         EXTRA_SCALES[sys.argv[2]])))
    else:
        main()
