"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's TPU-build implication: multi-host logic is tested on
CPU via `xla_force_host_platform_device_count`; kernels are platform-agnostic
JAX so the same code paths run on real TPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The environment may pre-register an accelerator backend (e.g. a remote TPU
# tunnel) before conftest runs; jax.config.update overrides it reliably where
# the env var alone would not.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np
import pytest

TEST_GRAPHS = pathlib.Path(__file__).parent / "testGraphs"


@pytest.fixture(scope="session")
def test_graph_dir():
    return TEST_GRAPHS


def _load_pairs(name):
    return np.loadtxt(TEST_GRAPHS / name, dtype=np.int64, ndmin=2)


@pytest.fixture(scope="session")
def fixture_edge_lists():
    return {p.stem: _load_pairs(p.name) for p in sorted(TEST_GRAPHS.glob("*.el"))}


@pytest.fixture(scope="session")
def fixture_graphs(fixture_edge_lists):
    from gms_tpu.io.builder import build_csr

    return {k: build_csr(v) for k, v in fixture_edge_lists.items()}


def random_graph(n, p, seed):
    """Erdos-Renyi fixture generator (testing/README.md random graphs)."""
    rng = np.random.default_rng(seed)
    mask = rng.random((n, n)) < p
    mask = np.triu(mask, 1)
    src, dst = np.nonzero(mask)
    return np.stack([src, dst], axis=1).astype(np.int64)
