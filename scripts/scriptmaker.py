#!/usr/bin/env python
"""Generate batch run scripts from a JSON config.

Role of the reference's scripts/scriptmaker.py (JSON config ->
Slurm/LSF/local run scripts, :84-102,512-571): fan out many benchmark
invocations as independent jobs. Here each job is a
`python -m gms_tpu.bench.<algo>` invocation; backends: local shell, Slurm
sbatch, LSF bsub.

Config format (JSON):
{
  "backend": "local" | "slurm" | "lsf",
  "outdir": "runs",
  "jobs": [
    {"bench": "triangle_count", "args": "-g kronecker 16 -n 3"},
    {"bench": "k_clique", "args": "-g kronecker 14 -n 3 -p clique-size=5"}
  ],
  "slurm": {"time": "01:00:00", "partition": "tpu"}
}
"""

from __future__ import annotations

import argparse
import json
import os
import stat

HEADERS = {
    "local": "#!/bin/bash\nset -e\n",
    "slurm": ("#!/bin/bash\n#SBATCH --time={time}\n#SBATCH --partition={partition}\n"
              "#SBATCH --output={outdir}/%x_%j.out\n"),
    "lsf": "#!/bin/bash\n#BSUB -W {time}\n#BSUB -o {outdir}/%J.out\n",
}


def make_scripts(cfg: dict) -> list[str]:
    backend = cfg.get("backend", "local")
    outdir = cfg.get("outdir", "runs")
    os.makedirs(outdir, exist_ok=True)
    meta = {"outdir": outdir, "time": "01:00:00", "partition": "normal"}
    meta.update(cfg.get(backend, {}))
    paths = []
    for i, job in enumerate(cfg["jobs"]):
        name = f"{i:03d}_{job['bench']}"
        path = os.path.join(outdir, name + ".sh")
        with open(path, "w") as f:
            f.write(HEADERS[backend].format(**meta))
            f.write(f"python -m gms_tpu.bench.{job['bench']} {job['args']} "
                    f"| tee {outdir}/{name}.log\n")
        os.chmod(path, os.stat(path).st_mode | stat.S_IXUSR)
        paths.append(path)
    runner = os.path.join(outdir, "submit_all.sh")
    submit = {"local": "bash", "slurm": "sbatch", "lsf": "bsub <"}[backend]
    with open(runner, "w") as f:
        f.write("#!/bin/bash\n")
        for p in paths:
            f.write(f"{submit} {os.path.abspath(p)}\n")
    os.chmod(runner, os.stat(runner).st_mode | stat.S_IXUSR)
    return paths + [runner]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("config")
    ns = p.parse_args(argv)
    with open(ns.config) as f:
        cfg = json.load(f)
    for path in make_scripts(cfg):
        print(path)


if __name__ == "__main__":
    main()
