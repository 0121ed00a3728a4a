"""Build + run the C++ reference (spcl/gms) on THIS host and record baselines.

Produces/updates `baseline_measured.json` at the repo root, which `bench.py`
reads to compute `vs_baseline`. The reference publishes no numbers
(BASELINE.md), so the baseline is measured: each benchmark binary is built
Release (-O3 -march=native -fopenmp, the reference's own flags,
/root/reference/CMakeLists.txt:12) and run on the same deterministic
Graph500 Kronecker workload bench.py uses (-g kronecker SCALE --deg 16,
reference seed gapbs/util.h kRandSeed).

Usage:
    python scripts/measure_reference.py [--ref /root/reference]
        [--build /tmp/refbuild] [--scale 18] [--targets tc,kclist,bk]

Timings are parsed from the reference's own stdout ("Trial Time" /
"Average Time" lines, gms/third_party/gapbs/util.h:31-33 PrintTime and
common/benchmark.h:116-133).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# target -> (binary name, extra argv, result-key prefix)
TARGETS = {
    "tc": ("triangle_count", [], "tc"),
    "kclist": ("k_clique_list_danisch_node_parallel",
               ["-p", "clique-size=5"], "kclique5"),
    "bk": ("maximal_clique_enum_bron_kerbosch", [], "bk"),
    "star": ("k_clique_star_list", ["-p", "k=4"], "star4"),
    # coloring.cc:32-129 / link_prediction.cc:80-101 print per-trial
    # "Trial Time" lines across their variant suites; the baseline records
    # the BEST variant's trial time (min) at --extra-scale
    "coloring": ("coloring", [], "coloring"),
    "lp": ("link_prediction", [], "lp_auc"),
    # Pipeline row: @@@ t_read t_solve t_verify (subgraphiso_vf2_parallel
    # .cpp:13-64); baseline records the Solve phase per pattern
    "vf2": ("subgraphiso_vf2_parallel", [], "vf2"),
}


def run(cmd, **kw):
    print("+", " ".join(cmd), file=sys.stderr)
    return subprocess.run(cmd, check=True, **kw)


def build(ref: str, build_dir: str, targets: list[str]) -> None:
    os.makedirs(build_dir, exist_ok=True)
    if not os.path.exists(os.path.join(build_dir, "CMakeCache.txt")):
        run(["cmake", ref, "-DCMAKE_BUILD_TYPE=Release", "-DBUILD_TESTS=OFF"],
            cwd=build_dir)
    names = [TARGETS[t][0] for t in targets]
    tool = ["ninja"] if os.path.exists(os.path.join(build_dir, "build.ninja")) \
        else ["make", f"-j{os.cpu_count()}"]
    run(tool + names, cwd=build_dir)


def find_binary(build_dir: str, name: str) -> str:
    for root, _dirs, files in os.walk(build_dir):
        if name in files and os.access(os.path.join(root, name), os.X_OK):
            return os.path.join(root, name)
    raise FileNotFoundError(name)


def trial_times(stdout: str) -> list[float]:
    return [float(m) for m in re.findall(
        r"(?:Trial Time|trial time)\s*:?\s*([0-9.eE+-]+)", stdout)]


def measure(binary: str, scale: int, extra: list[str]) -> dict:
    cmd = [binary, "-t", str(os.cpu_count()), "-n", "1",
           "-g", "kronecker", str(scale), "--deg", "16"] + extra
    out = run(cmd, capture_output=True, text=True).stdout
    times = trial_times(out)
    if not times:  # fall back to the @@@ machine rows (first column = time)
        times = [float(line.split()[1]) for line in out.splitlines()
                 if line.startswith("@@@") and len(line.split()) > 1]
    m = re.search(r"(\d+)\s+undirected edges", out)
    edges = int(m.group(1)) if m else None
    return {"best_trial_seconds": min(times), "edges": edges,
            "all_trials": times}


def measure_first_row(binary: str, scale: int, extra: list[str],
                      row_match: str, timeout_s: int = 5400) -> list[str] | None:
    """Stream the binary's stdout and return the first `@@@` row containing
    `row_match`, then kill the child (the reference mains sweep dozens of
    variants — e.g. k_clique_list_danisch_node_parallel.cc:12-51 runs 27
    ordering variants; we baseline against the FIRST, their headline
    degeneracy ordering). The child is killed by its exact Popen handle."""
    cmd = ["timeout", str(timeout_s), binary, "-t", str(os.cpu_count()),
           "-n", "1", "-g", "kronecker", str(scale), "--deg", "16"] + extra
    print("+", " ".join(cmd), file=sys.stderr)
    p = subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True)
    row = None
    try:
        assert p.stdout is not None
        for line in p.stdout:
            if line.startswith("@@@") and row_match in line:
                row = line.split()
                break
    finally:
        p.terminate()
        try:
            p.wait(timeout=15)
        except subprocess.TimeoutExpired:
            p.kill()
    return row


def _floats(row: list[str]) -> list[float]:
    out = []
    for tok in row[1:]:
        try:
            out.append(float(tok))
        except ValueError:
            break
    return out


def _bk_scales(args) -> list[int]:
    return [int(s) for s in str(args.bk_scales).split(",") if s]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--build", default="/tmp/refbuild")
    ap.add_argument("--scale", type=int, default=18)
    ap.add_argument("--extra-scale", type=int, default=16,
                    help="scale for the kclist row (bench.py BENCH_EXTRA)")
    ap.add_argument("--bk-scales", default="12,13,14",
                    help="comma list of scales for the BK rows")
    ap.add_argument("--star-scale", type=int, default=12)
    ap.add_argument("--vf2-scale", type=int, default=14)
    ap.add_argument("--targets", default="tc")
    args = ap.parse_args()
    targets = args.targets.split(",")

    build(args.ref, args.build, targets)

    path = os.path.join(REPO, "baseline_measured.json")
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    # exact counts (ours, verified) used to convert the reference's seconds
    # into cliques/sec on the identical workload
    counts = {}
    xpath = os.path.join(REPO, "BENCH_extra.json")
    if os.path.exists(xpath):
        with open(xpath) as f:
            counts = json.load(f)

    for t in targets:
        name, extra, prefix = TARGETS[t]
        binary = find_binary(args.build, name)
        if t == "tc":
            r = measure(binary, args.scale, extra)
            data[f"tc_rmat{args.scale}_trial_seconds"] = r["best_trial_seconds"]
            if r["edges"]:
                data[f"tc_rmat{args.scale}_edges"] = r["edges"]
                data[f"tc_rmat{args.scale}_edges_per_sec"] = (
                    r["edges"] / r["best_trial_seconds"])
            print(t, r, file=sys.stderr)
        elif t == "kclist":
            # Pipeline row: @@@ t_pre t_kclisting t_vsetup t_verify t_vteardown …
            row = measure_first_row(binary, args.extra_scale, extra,
                                    "degeneracy")
            if row:
                secs = _floats(row)[1]  # the kclisting phase
                data["kclique5_seconds"] = secs
                data["kclique5_scale"] = args.extra_scale
                c = counts.get("kclique5", {}).get("count")
                if c:
                    data["kclique5_per_sec"] = c / secs
                print("kclist row:", row, file=sys.stderr)
        elif t == "bk":
            # honest multi-scale BK baselines (VERDICT r03 item 4). NOTE
            # the protocol (ADVICE r04 item 2): measure_first_row records
            # the FIRST @@@ variant row the binary prints and then kills
            # it, so a single run measures that first variant only; the
            # min() below takes the best across REPEATED script runs, not
            # across variants within one run.
            # BenchmarkKernelBkPP row: @@@ trialTime [verify…] preprocTime label
            data.pop("bk_timeout_seconds", None)  # drop the 5400s framing
            data.pop("bk_note", None)
            for s in _bk_scales(args):
                row = measure_first_row(binary, s, extra, "BK-GMS-",
                                        timeout_s=3600)
                if row:
                    secs = _floats(row)[0]
                    key = f"bk_scale{s}_seconds"
                    # keep the best across variants/runs
                    if key not in data or secs < data[key]:
                        data[key] = secs
                        data[f"bk_scale{s}_variant"] = row[-1]
                    print("bk row:", s, row, file=sys.stderr)
        elif t == "star":
            row = measure_first_row(binary, args.star_scale, extra, "@@@",
                                    timeout_s=3600)
            if row:
                secs = _floats(row)[0]
                data[f"star4_scale{args.star_scale}_seconds"] = secs
                print("star row:", row, file=sys.stderr)
        elif t in ("coloring", "lp"):
            r = measure(binary, args.extra_scale, extra)
            key = f"{prefix}_scale{args.extra_scale}_best_trial_seconds"
            data[key] = min(r["all_trials"])
            print(t, key, data[key], file=sys.stderr)
        elif t == "vf2":
            from gms_tpu.algorithms.subgraph_iso import VF2_PATTERNS

            s = args.vf2_scale
            for pname, pedges in VF2_PATTERNS.items():
                pf = f"/tmp/vf2_pattern_{pname}.el"
                with open(pf, "w") as f:
                    for a, b in pedges:
                        f.write(f"{a} {b}\n")
                row = measure_first_row(
                    binary, s, ["-p", f"pattern-file={pf}"], "@@@",
                    timeout_s=1800)
                if row:
                    # @@@ t_read t_solve t_verify ... — Solve phase only
                    data[f"vf2_{pname}_scale{s}_solve_seconds"] = \
                        _floats(row)[1]
                    print("vf2 row:", pname, row, file=sys.stderr)
            data["vf2_note"] = (
                f"subgraphiso_vf2_parallel -t 2 -n 1 -g kronecker {s} "
                "--deg 16 -p pattern-file=<pattern>; induced find-first; "
                "Solve phase seconds (Pipeline read/solve/verify row)")

    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    print(json.dumps(data, indent=2))


if __name__ == "__main__":
    main()
