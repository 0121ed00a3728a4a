"""Harness: CLI grammar, @@@ protocol, benchmark runners, bench mains."""

import io
import json
import subprocess
import sys

import numpy as np
import pytest

from gms_tpu.harness import benchmark, cli
from gms_tpu.harness.printer import Printer, print_param
from gms_tpu.harness.timers import DetailTimer, Timer


def test_cli_generator():
    args = cli.Parser().parse(["-g", "kronecker", "8", "-n", "3", "-v"])
    assert args.gen == "kronecker" and args.scale == 8
    assert args.trials == 3 and args.verify
    g = args.load_graph()
    assert g.num_nodes == 256


def test_cli_file(test_graph_dir):
    args = cli.Parser().parse(["-f", str(test_graph_dir / "triangles_3.el")])
    g = args.load_graph()
    assert g.num_edges_undirected > 0


def test_cli_params():
    p = cli.Parser().add_param("clique-size", 8).add_param("name", "x")
    args = p.parse(["-g", "uniform", "6", "-p", "clique-size=4"])
    assert args.params == {"clique-size": 4, "name": "x"}
    with pytest.raises(SystemExit):
        p.parse(["-g", "uniform", "6", "-p", "bogus=1"])


def test_cli_requires_input():
    with pytest.raises(SystemExit):
        cli.Parser().parse([])


def test_printer_protocol(capsys):
    p = Printer()
    p.enqueue(1.23456789, "label", 7)
    p.print()
    print_param("alpha", 0.5)
    out = capsys.readouterr().out
    assert "@@@ 1.23457 label 7\n" in out
    assert "@@# alpha 0.50000\n" in out


def test_benchmark_kernel_rows(capsys):
    args = cli.Args(trials=2, verify=True)
    g = object()
    result = benchmark.benchmark_kernel(
        args, g, kernel=lambda g: 42,
        verifier=lambda g, r: r == 42, labels=("lbl",))
    assert result == 42
    out = capsys.readouterr().out
    rows = [l for l in out.splitlines() if l.startswith("@@@")]
    assert len(rows) == 2
    assert all("verified" in r and "lbl" in r for r in rows)
    assert "Average Time:" in out


def test_pipeline(capsys):
    args = cli.Args(trials=1)
    out_val = benchmark.Pipeline(args, labels=("pipe",)).run(
        ("Phase1", lambda c: 1), ("Phase2", lambda c: c + 1))
    assert out_val == 2
    out = capsys.readouterr().out
    assert "Phase1:" in out and "Phase2:" in out
    assert any(l.startswith("@@@") and l.endswith("pipe") for l in out.splitlines())


def test_timers():
    t = Timer()
    t.start()
    assert t.stop() >= 0
    dt = DetailTimer()
    dt.phase("a")
    dt.phase("b")
    assert [n for n, _ in dt.phases] == ["a", "b"]


@pytest.mark.parametrize("mod,extra", [
    ("triangle_count", []),
    ("k_clique", ["-p", "clique-size=4"]),
    ("bron_kerbosch", []),
    ("coloring", []),
    ("preprocessing", []),
    ("k_clique_star", ["-p", "clique-size=3"]),
    ("subgraph_iso", []),
])
def test_bench_mains_smoke(mod, extra, capsys):
    import importlib

    m = importlib.import_module(f"gms_tpu.bench.{mod}")
    m.main(["-g", "uniform", "6", "--deg", "4", "-n", "1", "-v"] + extra)
    out = capsys.readouterr().out
    rows = [l for l in out.splitlines() if l.startswith("@@@")]
    assert rows, out
    assert not any("FAILED" in r for r in rows), out


def test_bench_link_prediction_smoke(capsys):
    from gms_tpu.bench import link_prediction as m

    m.main(["-g", "uniform", "7", "--deg", "6", "-n", "1", "-v",
            "-p", "samples=2000", "-p", "test-rate=0.05"])
    out = capsys.readouterr().out
    assert any(l.startswith("@@@") for l in out.splitlines())
    assert not any("FAILED" in l for l in out.splitlines() if l.startswith("@@@"))


def test_collect_data(tmp_path):
    sys.path.insert(0, "scripts")
    import collect_data

    log = tmp_path / "x.log"
    log.write_text("noise\n@@@ 0.5 tc\n@@# p 1\n")
    out = tmp_path / "d.csv"
    collect_data.main([str(log), "-o", str(out)])
    body = out.read_text()
    assert "result" in body and "param" in body and "0.5 tc" in body


def test_scriptmaker(tmp_path):
    sys.path.insert(0, "scripts")
    import scriptmaker

    cfg = {"backend": "local", "outdir": str(tmp_path / "runs"),
           "jobs": [{"bench": "triangle_count", "args": "-g uniform 6 -n 1"}]}
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    scriptmaker.main([str(cfg_path)])
    runs = list((tmp_path / "runs").glob("*.sh"))
    assert len(runs) == 2  # job script + submit_all
