"""Preprocessed-graph cache — the framework's checkpoint/resume analog.

Role of the reference's serialized-graph path (.sg/.wsg, gapbs/reader.h:
252-305 + writer.h; SURVEY.md §5 "Checkpoint / resume"): skip re-parsing and
re-preprocessing. Here the cache stores the CSR arrays plus any computed
orderings/core numbers in one .npz, so a pipeline restart resumes from the
device-upload step.
"""

from __future__ import annotations

import numpy as np

from gms_tpu.graphs.csr import CSRGraph


def save_prepared(path: str, g: CSRGraph, **arrays) -> None:
    """Save graph + named preprocessing arrays (e.g. rank=..., core=...)."""
    np.savez_compressed(
        path,
        indptr=g.indptr,
        indices=g.indices,
        directed=np.array(g.directed()),
        **{f"pp_{k}": v for k, v in arrays.items()},
    )


def load_prepared(path: str) -> tuple[CSRGraph, dict]:
    """Returns (graph, {name: array}) for everything saved."""
    with np.load(path) as z:
        g = CSRGraph(z["indptr"], z["indices"], directed=bool(z["directed"]))
        extras = {k[3:]: z[k] for k in z.files if k.startswith("pp_")}
    return g, extras
