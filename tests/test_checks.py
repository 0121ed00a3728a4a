"""Paranoid-mode invariant checks (DEBUG_WITH_SANITIZERS analog)."""

import numpy as np
import pytest

from gms_tpu.harness import checks
from gms_tpu.io.builder import build_csr
from gms_tpu.graphs.tiles import PaddedGraph, SENTINEL

from conftest import random_graph


def _pg(n=40, p=0.2, seed=1):
    g = build_csr(random_graph(n, p, seed=seed), num_nodes=n)
    return PaddedGraph.from_csr(g), g


def test_validate_accepts_wellformed():
    pg, g = _pg()
    checks.validate_padded(np.asarray(pg.nbr), np.asarray(pg.deg),
                           g.num_nodes)


@pytest.mark.parametrize("corrupt", ["hole", "unsorted", "deg", "guard",
                                     "range"])
def test_validate_catches_corruption(corrupt):
    pg, g = _pg()
    nbr = np.asarray(pg.nbr).copy()
    deg = np.asarray(pg.deg).copy()
    v = int(np.argmax(deg))
    d = int(deg[v])
    assert d >= 2
    if corrupt == "hole":
        nbr[v, 0] = SENTINEL
    elif corrupt == "unsorted":
        nbr[v, [0, 1]] = nbr[v, [1, 0]]
    elif corrupt == "deg":
        deg[v] += 1
    elif corrupt == "guard":
        nbr[g.num_nodes, 0] = 3
    elif corrupt == "range":
        nbr[v, 0] = -5
    with pytest.raises(AssertionError):
        checks.validate_padded(nbr, deg, g.num_nodes)


def test_paranoid_env_gates_from_csr(monkeypatch):
    monkeypatch.setenv("GMS_TPU_PARANOID", "1")
    _pg(seed=2)  # builds fine under validation
