"""Round benchmark: mining throughput on the flagship kernels.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} for the
headline metric (triangle-count edges/sec), plus one comment line per extra
metric (k-clique k=5, Bron-Kerbosch) on stderr.

Protocol mirrors the reference's BenchmarkKernelBk split
(gms/common/benchmark.h:96-133): graph build + plan prep are untimed
("buildTime"); the reported number is steady-state device throughput —
`trials` chained executions are enqueued and fetched with ONE device->host
readback, so the tunnel round-trip latency of this remote-attached chip is
paid once, not per trial (each trial is still a full re-execution: the work
arrays are rotated by a shift derived from the previous trial's count, and
all counts are asserted identical).

Baseline: the reference publishes no numbers (BASELINE.md). If
`baseline_measured.json` exists at the repo root (written by
scripts/measure_reference.py after building the C++ reference's benchmarks
on this host), vs_baseline = ours / reference on the same graph.

Roofline: the modeled HBM gather traffic of the TC plan is printed as
achieved GB/s. Set BENCH_ROOFLINE=1 to also measure this device's stream
bandwidth (chained xor-sum over a resident 256MB array) and report the
kernel's fraction of it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SCALE = int(os.environ.get("BENCH_SCALE", "18"))
DEGREE = int(os.environ.get("BENCH_DEGREE", "16"))
TRIALS = int(os.environ.get("BENCH_TRIALS", "32"))
SEED = 27491095  # reference default (gapbs/util.h kRandSeed)


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

    # one-time compiles dominate cold wall-clock on the tunnel-attached
    # chip; persist them so repeated driver runs skip straight to execution
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gms_tpu.algorithms.triangle_count import TrianglePlan
    from gms_tpu.io.builder import build_csr
    from gms_tpu.io.generators import generate_rmat_el

    g = build_csr(generate_rmat_el(SCALE, DEGREE, seed=SEED), num_nodes=1 << SCALE)
    plan = TrianglePlan(g)

    tri, per_trial = plan.run_steady(TRIALS)
    edges_per_sec = g.num_edges_undirected / per_trial

    gb = plan.traffic_bytes() / 1e9
    roof = f"model_traffic={gb:.2f}GB achieved={gb/per_trial:.0f}GB/s"
    if os.environ.get("BENCH_ROOFLINE", "1") != "0":
        # default ON: the committed artifact must carry the denominator
        # (VERDICT r02 next-step 4), not just the achieved number
        bw = _stream_bandwidth()
        roof += f" stream_peak={bw:.0f}GB/s frac={gb/per_trial/bw:.0%}"

    vs_baseline = None
    ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "baseline_measured.json")
    ref = {}
    if os.path.exists(ref_path):
        with open(ref_path) as f:
            ref = json.load(f)
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
        _extra_metrics(g, ref, scale=SCALE)


def _extra_metrics(g, ref, scale: int) -> None:
    """k-clique (k=5) and Bron-Kerbosch throughput rows (BASELINE.md targets).

    Reported on stderr as comment lines so the driver's one-JSON-line
    contract holds; recorded alongside in BENCH_extra.json. Run on a
    capped-scale graph (BENCH_EXTRA_SCALE, default min(scale, 16)) so the
    round bench stays bounded.
    """
    import numpy as np

    from gms_tpu.io.builder import build_csr
    from gms_tpu.io.generators import generate_rmat_el

    xscale = int(os.environ.get("BENCH_EXTRA_SCALE", str(min(scale, 16))))
    if xscale != scale:
        g = build_csr(generate_rmat_el(xscale, DEGREE, seed=SEED),
                      num_nodes=1 << xscale)
    extra = {"scale": xscale}
    try:
        t0 = time.perf_counter()
        from gms_tpu.algorithms.k_clique import kclique_count

        n5 = kclique_count(g, 5)
        dt = time.perf_counter() - t0
        extra["kclique5"] = {
            "count": int(n5), "seconds": dt,
            "cliques_per_sec": n5 / dt if dt else None,
            "vs_baseline": (n5 / dt) / ref["kclique5_per_sec"]
            if ref.get("kclique5_per_sec") else None,
        }
        print(f"# kclique5 count={n5} time={dt:.2f}s", file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"# kclique5 failed: {e}", file=sys.stderr)

    try:
        t0 = time.perf_counter()
        from gms_tpu.algorithms.bron_kerbosch import bron_kerbosch

        nmc = bron_kerbosch(g, collect=False)
        dt = time.perf_counter() - t0
        if ref.get("bk_cliques_per_sec"):
            vs = (nmc / dt) / ref["bk_cliques_per_sec"]
        elif ref.get("bk_timeout_seconds"):
            # reference never finished (baseline_measured.json bk_note):
            # ratio vs its count/timeout upper bound — a LOWER bound on
            # the true speedup
            vs = ref["bk_timeout_seconds"] / dt
        else:
            vs = None
        extra["bron_kerbosch"] = {
            "count": int(nmc), "seconds": dt,
            "cliques_per_sec": nmc / dt if dt else None,
            "vs_baseline": vs,
            "vs_baseline_is_lower_bound": not ref.get("bk_cliques_per_sec"),
        }
        print(f"# bron_kerbosch maximal={nmc} time={dt:.2f}s", file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"# bron_kerbosch failed: {e}", file=sys.stderr)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "BENCH_extra.json")
    with open(out, "w") as f:
        json.dump(extra, f, indent=1)


if __name__ == "__main__":
    main()
