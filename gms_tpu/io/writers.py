"""Graph writers.

Role of GAPBS `WriterBase` (reference gms/third_party/gapbs/writer.h:29-90):
edge-list export (`WriteEL`, writer.h:30-35) and the binary serialized graph
(`WriteSerializedGraph`, writer.h:37-75) used to skip re-parsing on later
runs. The `.sg`/`.wsg` files written here are BIT-COMPATIBLE with the
reference's layout (reader.h:252-305):

    [directed: 1 byte bool]
    [num_edges: int64]            # directed edge slots (len(indices))
    [num_nodes: int64]
    [offsets: (num_nodes+1) x int64]
    [neighbors: num_edges x int32]            # .sg
    [neighbors: num_edges x (int32 id, int32 weight)]   # .wsg, interleaved
    [if directed: inverse offsets + inverse neighbors]

so graphs serialized by the C++ reference load here and vice versa.
"""

from __future__ import annotations

import numpy as np

from gms_tpu.graphs.csr import CSRGraph


def write_el(g: CSRGraph, path: str) -> None:
    """Plain edge-list export (writer.h WriteEL): every stored arc once."""
    e = g.edge_array()
    np.savetxt(path, e, fmt="%d %d")


def write_wel(g: CSRGraph, path: str) -> None:
    """Weighted edge-list export: `u v w` per stored arc."""
    if g.weights is None:
        raise ValueError("graph has no weights; use write_el")
    e = g.edge_array()
    out = np.column_stack([e, g.weights])
    np.savetxt(path, out, fmt="%d %d %d")


def _inverse_csr(g: CSRGraph) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(indptr, indices, weights) of the transposed graph."""
    src = np.repeat(np.arange(g.num_nodes, dtype=np.int32),
                    g.degrees.astype(np.int64))
    order = np.lexsort((src, g.indices))
    inv_indices = src[order]
    counts = np.bincount(g.indices, minlength=g.num_nodes)
    indptr = np.zeros(g.num_nodes + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    w = None if g.weights is None else g.weights[order]
    return indptr, inv_indices, w


def _interleave_weighted(indices: np.ndarray, weights: np.ndarray) -> np.ndarray:
    out = np.empty(2 * len(indices), dtype=np.int32)
    out[0::2] = indices
    out[1::2] = weights.astype(np.int32)
    return out


def write_sg(g: CSRGraph, path: str) -> None:
    """Serialized graph, reference `.sg` layout (writer.h:37-75)."""
    with open(path, "wb") as f:
        f.write(np.uint8(1 if g.directed() else 0).tobytes())
        f.write(np.int64(g.num_edges).tobytes())
        f.write(np.int64(g.num_nodes).tobytes())
        f.write(g.indptr.astype(np.int64).tobytes())
        f.write(g.indices.astype(np.int32).tobytes())
        if g.directed():
            inv_ptr, inv_idx, _ = _inverse_csr(g)
            f.write(inv_ptr.tobytes())
            f.write(inv_idx.astype(np.int32).tobytes())


def write_wsg(g: CSRGraph, path: str) -> None:
    """Serialized weighted graph, reference `.wsg` layout (interleaved
    (node, weight) int32 pairs as NodeWeight<int32,int32>)."""
    if g.weights is None:
        raise ValueError("graph has no weights; use write_sg")
    with open(path, "wb") as f:
        f.write(np.uint8(1 if g.directed() else 0).tobytes())
        f.write(np.int64(g.num_edges).tobytes())
        f.write(np.int64(g.num_nodes).tobytes())
        f.write(g.indptr.astype(np.int64).tobytes())
        f.write(_interleave_weighted(g.indices, g.weights).tobytes())
        if g.directed():
            inv_ptr, inv_idx, inv_w = _inverse_csr(g)
            f.write(inv_ptr.tobytes())
            f.write(_interleave_weighted(inv_idx, inv_w).tobytes())


def write_graph(g: CSRGraph, path: str) -> None:
    """Dispatch on suffix (writer.h WriteGraph): .sg/.wsg binary, else EL."""
    if path.endswith(".wsg"):
        write_wsg(g, path)
    elif path.endswith(".sg"):
        write_sg(g, path)
    elif path.endswith(".wel"):
        write_wel(g, path)
    else:
        write_el(g, path)
