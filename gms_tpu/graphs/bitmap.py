"""Bitmap-tile graph layout — the TPU-native "Roaring graph".

Role of `SetGraph<RoaringSet>` (reference gms/representations/sets/roaring_set.h
:15-234 over CRoaring): neighborhoods as compressed bitmaps, intersection =
word-AND + popcount. TPU-first re-design: an UNcompressed rectangular bitmap

    words : uint32[V_pad, W_pad]   bit j of word w of row v set iff edge v->(32w+j)

because on the VPU a dense AND+popcount over 8x128 tiles at HBM bandwidth
beats any branchy compressed decode. Memory is V^2/8 bits, so this layout is
for moderate V (the whole-graph consumer is
algorithms/triangle_count.py:triangle_count_dense) or for *local* universes
(per-root induced bitsets in Bron-Kerbosch / kClist, where the universe is
one neighborhood <= core bound; see gms_tpu/algorithms/bron_kerbosch.py,
k_clique.py — that is where the reference uses Roaring subgraphs too, e.g.
sub_graph/roaring_sub_graph.h:13-132).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gms_tpu.graphs.tiles import round_up


class BitmapGraph:
    def __init__(self, words, num_nodes: int, num_edges: int):
        self.words = words  # uint32[V_pad, W_pad]
        self.num_nodes = int(num_nodes)
        self.num_edges = int(num_edges)

    @property
    def v_pad(self) -> int:
        return self.words.shape[0]

    @property
    def w_pad(self) -> int:
        return self.words.shape[1]

    @classmethod
    def from_csr(cls, g, *, lane: int = 128, sublane: int = 8) -> "BitmapGraph":
        n = g.num_nodes
        W = round_up(max((n + 31) // 32, 1), lane)
        V = round_up(max(n, 1), sublane)
        words = np.zeros((V, W), dtype=np.uint32)
        if g.num_edges:
            rows = np.repeat(np.arange(n), g.degrees.astype(np.int64))
            cols = g.indices.astype(np.int64)
            np.bitwise_or.at(words, (rows, cols >> 5), np.uint32(1) << (cols & 31).astype(np.uint32))
        return cls(jnp.asarray(words), n, g.num_edges)

    def rows(self, vids):
        return jnp.take(self.words, vids, axis=0)
