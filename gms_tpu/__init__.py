"""gms_tpu — a TPU-native graph-mining framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of GraphMineSuite
(spcl/gms, PVLDB'21): set-algebra-centric graph mining — triangle counting,
k-clique counting/listing, maximal clique enumeration (Bron-Kerbosch),
k-clique-star listing, vertex similarity, link prediction, subgraph
isomorphism, graph coloring — with swappable set/graph representations and
vertex-ordering preprocessing.

Design stance (TPU-first, not a port):
  * Neighborhood "sets" are padded dense tiles (sorted int32 rows with a
    +inf sentinel) or bitmap tiles (uint32 words), never pointer-chasing
    structures. Set algebra operates on *batches* of set pairs at once.
  * Recursive enumeration (Bron-Kerbosch, kClist) becomes explicit
    work-stacks over fixed-shape masked bitsets inside `lax.while_loop`.
  * Orderings (degeneracy / ADG / degree) are bulk array programs.
  * Multi-chip scaling is `jax.sharding.Mesh` + `shard_map` + `psum` over
    the edge/root work axis with replicated adjacency tables.

Reference parity map: see SURVEY.md at the repo root. Each module's
docstring cites the reference files (file:line) whose behavior it covers.
"""

__version__ = "0.1.0"

# Exact counting is a correctness requirement (SURVEY.md §7 "Exactness"):
# pattern counts overflow int32 on large graphs, so int64 accumulators must
# be real. All hot arrays are explicitly dtyped int32/uint32, so this does
# not widen the data path.
import jax as _jax

_jax.config.update("jax_enable_x64", True)

# Persist compiled executables across processes (role of the reference's
# ahead-of-time C++ binaries): on the tunnel-attached chip a cold compile
# costs tens of seconds, and the driver/bench/CLI all re-launch Python.
import os as _os

if not _os.environ.get("GMS_TPU_NO_COMPILE_CACHE"):
    _jax.config.update("jax_compilation_cache_dir",
                       _os.path.expanduser("~/.cache/jax"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gms_tpu.graphs.csr import CSRGraph
from gms_tpu.graphs.tiles import PaddedGraph
from gms_tpu.graphs.bitmap import BitmapGraph

__all__ = [
    "CSRGraph",
    "PaddedGraph",
    "BitmapGraph",
    "read_graph",
    "build_csr",
    "triangle_count",
    "kclique_count",
    "bron_kerbosch",
    "kclique_star_list",
    "subgraph_isomorphism",
    "jones_plassmann",
    "vertex_similarity",
    "AUCPlan",
]

# lazy top-level conveniences (avoid import cycles)
_LAZY = {
    "read_graph": ("gms_tpu.io.readers", "read_graph"),
    "build_csr": ("gms_tpu.io.builder", "build_csr"),
    "triangle_count": ("gms_tpu.algorithms.triangle_count",
                       "triangle_count"),
    "kclique_count": ("gms_tpu.algorithms.k_clique", "kclique_count"),
    "bron_kerbosch": ("gms_tpu.algorithms.bron_kerbosch", "bron_kerbosch"),
    "kclique_star_list": ("gms_tpu.algorithms.k_clique_star",
                          "kclique_star_list"),
    "subgraph_isomorphism": ("gms_tpu.algorithms.subgraph_iso",
                             "subgraph_isomorphism"),
    "jones_plassmann": ("gms_tpu.algorithms.coloring", "jones_plassmann"),
    "vertex_similarity": ("gms_tpu.algorithms.similarity",
                          "vertex_similarity"),
    "AUCPlan": ("gms_tpu.algorithms.link_prediction", "AUCPlan"),
}


def __getattr__(name):
    try:
        mod, attr = _LAZY[name]
    except KeyError:
        raise AttributeError(name) from None
    import importlib

    return getattr(importlib.import_module(mod), attr)
