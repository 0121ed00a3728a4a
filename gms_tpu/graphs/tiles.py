"""Padded dense-tile graph layout — the TPU-native "SortedSet graph".

Role of `SetGraph<SortedSet>` (reference gms/representations/graphs/set_graph.h
:10-233 over gms/representations/sets/sorted_set.h): adjacency as sorted
neighbor lists. TPU-first re-design: instead of a vector of variable-length
vectors, the whole adjacency is ONE rectangular int32 array

    nbr : int32[V_pad, D_pad]   rows sorted ascending, padded with SENTINEL
    deg : int32[V_pad]          true row lengths

so that set algebra over *batches of rows* is dense vectorized work (VPU
broadcast-compare, searchsorted) with zero pointer chasing, and rows gather
cleanly by vertex id. SENTINEL = int32 max keeps padded rows sorted, so
searchsorted and merge logic need no special cases; validity is `x != SENTINEL`.

D_pad rounds up to a lane multiple (128); V_pad to a sublane multiple (8).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

SENTINEL = np.int32(np.iinfo(np.int32).max)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class PaddedGraph:
    """Rectangular padded adjacency resident on device."""

    def __init__(self, nbr, deg, num_nodes: int, num_edges: int):
        self.nbr = nbr  # int32[V_pad, D_pad]
        self.deg = deg  # int32[V_pad]
        self.num_nodes = int(num_nodes)
        self.num_edges = int(num_edges)  # directed (stored) edge count

    @property
    def v_pad(self) -> int:
        return self.nbr.shape[0]

    @property
    def d_pad(self) -> int:
        return self.nbr.shape[1]

    @classmethod
    def from_csr(cls, g, *, d_pad: int | None = None, v_pad: int | None = None,
                 lane: int = 128, sublane: int = 8) -> "PaddedGraph":
        """Build from a host CSRGraph (role of SetGraph::FromCGraph,
        set_graph.h:162-168 — but one bulk scatter, not per-vertex builds)."""
        n = g.num_nodes
        deg = g.degrees.astype(np.int32)
        dmax = int(deg.max(initial=0))
        D = round_up(max(d_pad or 0, dmax, 1), lane)
        # always reserve >= 1 all-SENTINEL row beyond the real vertices:
        # algorithms pad work arrays with vertex id v_pad and rely on
        # mode="clip" gathers landing on an empty row (k_clique.py,
        # bron_kerbosch.py) — with V == n the clip would hit vertex n-1
        V = round_up(max(v_pad or 0, n + 1, 1), sublane)
        nbr = np.full((V, D), SENTINEL, dtype=np.int32)
        # bulk scatter: position of each CSR entry within its row
        if g.num_edges:
            rows = np.repeat(np.arange(n), deg.astype(np.int64))
            offs = np.arange(g.num_edges, dtype=np.int64) - np.repeat(g.indptr[:-1], deg.astype(np.int64))
            nbr[rows, offs] = g.indices
        deg_full = np.zeros(V, dtype=np.int32)
        deg_full[:n] = deg
        from gms_tpu.harness import checks
        if checks.paranoid():  # sanitizer-build analog (GMS_TPU_PARANOID=1)
            checks.validate_padded(nbr, deg_full, n, name="PaddedGraph")
        return cls(jnp.asarray(nbr), jnp.asarray(deg_full), n, g.num_edges)

    def rows(self, vids):
        """Gather neighbor rows for a batch of vertex ids: int32[B, D_pad]."""
        return jnp.take(self.nbr, vids, axis=0)

    def degrees_of(self, vids):
        return jnp.take(self.deg, vids, axis=0)
