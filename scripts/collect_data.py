#!/usr/bin/env python
"""Scrape benchmark stdout into CSV.

Role of scripts/collectData.bash:18-19 in the reference: grep the `@@@`
(results) and `@@#` (param) prefixed rows out of benchmark logs into
data.csv for analysis.

Usage: python scripts/collect_data.py LOG [LOG...] [-o data.csv]
"""

from __future__ import annotations

import argparse
import csv
import sys


def collect(paths, out):
    w = csv.writer(out)
    w.writerow(["source", "kind", "values"])
    for path in paths:
        stream = sys.stdin if path == "-" else open(path)
        with stream if path != "-" else sys.stdin as f:
            for line in f:
                if line.startswith("@@@ "):
                    w.writerow([path, "result", line[4:].strip()])
                elif line.startswith("@@# "):
                    w.writerow([path, "param", line[4:].strip()])


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("logs", nargs="+")
    p.add_argument("-o", "--out", default="data.csv")
    ns = p.parse_args(argv)
    with open(ns.out, "w", newline="") as f:
        collect(ns.logs, f)
    print(f"wrote {ns.out}")


if __name__ == "__main__":
    main()
