#!/usr/bin/env python
"""Plot benchmark results from collected CSV.

Role of the reference's scripts/plotmaker.py (pandas/matplotlib plots over
collectData output, plotmaker.py:34-40): turn `@@@` result rows into
comparison charts.

Usage: python scripts/plotmaker.py data.csv [-o plots/]
Result rows are `trialTime [fields...] label...`; the first float column is
taken as the trial time and the trailing non-numeric tokens as the label.
"""

from __future__ import annotations

import argparse
import csv
import os
from collections import defaultdict


def _parse_rows(path):
    groups = defaultdict(list)
    with open(path) as f:
        for rec in csv.DictReader(f):
            if rec.get("kind") != "result":
                continue
            toks = rec["values"].split()
            try:
                t = float(toks[0])
            except (ValueError, IndexError):
                continue
            label = " ".join(tk for tk in toks[1:] if not _is_num(tk)) or "run"
            groups[label].append(t)
    return groups


def _is_num(tok: str) -> bool:
    try:
        float(tok)
        return True
    except ValueError:
        return tok in ("pass", "verified", "FAILED")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("csv")
    p.add_argument("-o", "--outdir", default="plots")
    ns = p.parse_args(argv)
    groups = _parse_rows(ns.csv)
    if not groups:
        raise SystemExit("no result rows found")
    os.makedirs(ns.outdir, exist_ok=True)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    labels = sorted(groups)
    means = [float(np.mean(groups[l])) for l in labels]
    mins = [float(np.min(groups[l])) for l in labels]
    fig, ax = plt.subplots(figsize=(max(6, len(labels) * 0.8), 4))
    x = np.arange(len(labels))
    ax.bar(x, means, label="mean trial time")
    ax.plot(x, mins, "k_", markersize=14, label="best")
    ax.set_xticks(x)
    ax.set_xticklabels(labels, rotation=45, ha="right", fontsize=8)
    ax.set_ylabel("seconds")
    ax.set_yscale("log")
    ax.legend()
    fig.tight_layout()
    out = os.path.join(ns.outdir, "trial_times.png")
    fig.savefig(out, dpi=120)
    print(out)


if __name__ == "__main__":
    main()
