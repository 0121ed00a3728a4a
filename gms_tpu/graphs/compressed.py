"""Compressed graph representations — k-bit, varint, hybrid (bit-tree role).

Role of the reference's Log(Graph) layer (gms/representations/graphs/):
  * Kbit_Adjacency_Array (log_graph/kbit_adjacency_array.h:17-60): neighbor
    ids packed at ⌈log2 n⌉ bits, global width — here `KbitGraph`, packed
    into uint32 lanes with a fully vectorized device decode (gather + two
    shifts per lane), so every padded-row kernel in the suite can run
    straight off the compressed form.
  * per-neighborhood local widths (`_Local` variants) — here
    `KbitGraphBucketed`: rows grouped into width buckets {8,16,24,32}, one
    packed array per bucket (ragged per-row widths do not map to a vector
    unit; bucketing keeps the footprint win AND static shapes).
  * Varint byte-based coders (coders/varint_byte_based_graph.h:9-70,
    varint_utils.h:26-115): delta + continuation-bit bytes — here host-side
    vectorized codecs (`varint_encode_graph` / `varint_decode_graph`), the
    storage/IO footprint option (sequential decode is hostile to the VPU;
    k-bit is the compute-from-compressed path on device).
  * Bit_Tree_Graph per-vertex encoding choice (log_graph/bit_tree_graph.h:
    26-50) — here `HybridGraph`: per-row choice between k-bit packing and a
    dense bitmap over the vertex space, by which is smaller.

All decoders return SENTINEL-padded int32 rows, so compressed graphs are
drop-in inputs for every set-algebra kernel.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from gms_tpu.graphs.csr import CSRGraph
from gms_tpu.graphs.tiles import PaddedGraph, SENTINEL, round_up


def _bits_for(n: int) -> int:
    return max(1, int(np.ceil(np.log2(max(n, 2)))))


@functools.partial(jax.jit, static_argnames=("k", "d_pad"))
def kbit_decode_rows(packed, deg, vids, *, k: int, d_pad: int):
    """Decode padded neighbor rows from k-bit packed words.

    packed: uint32[V_pad, W]; vids: int32[B] -> int32[B, d_pad] rows.
    """
    rows = jnp.take(packed, vids, axis=0, mode="clip")          # [B, W]
    d = jnp.take(deg, vids, mode="clip")                        # [B]
    j = jnp.arange(d_pad, dtype=jnp.int32)                      # lanes
    bitpos = j * k
    w0i, s = bitpos >> 5, (bitpos & 31).astype(jnp.uint32)
    W = packed.shape[1]
    w0 = jnp.take(rows, w0i, axis=1)                            # [B, d_pad]
    w1 = jnp.take(rows, jnp.minimum(w0i + 1, W - 1), axis=1)
    lo = w0 >> s[None, :]
    hi = jnp.where(s == 0, jnp.uint32(0), w1 << (jnp.uint32(32) - s)[None, :])
    val = (lo | hi) & jnp.uint32((1 << k) - 1)
    out = val.astype(jnp.int32)
    return jnp.where(j[None, :] < d[:, None], out, SENTINEL)


class KbitGraph:
    """Global-width k-bit packed adjacency (Kbit_Adjacency_Array role)."""

    def __init__(self, packed, deg, k: int, d_pad: int, num_nodes: int,
                 num_edges: int):
        self.packed = packed        # uint32[V_pad, W]
        self.deg = deg              # int32[V_pad]
        self.k = k
        self.d_pad = d_pad
        self.num_nodes = num_nodes
        self.num_edges = num_edges

    @classmethod
    def from_csr(cls, g: CSRGraph, *, k: int | None = None) -> "KbitGraph":
        pg = PaddedGraph.from_csr(g)
        k = k or _bits_for(g.num_nodes)
        nbr = np.asarray(pg.nbr).astype(np.uint64)
        nbr[nbr == np.uint64(np.uint32(SENTINEL))] = 0  # padding packs as 0
        V, D = nbr.shape
        W = round_up(D * k, 32) // 32
        packed = np.zeros((V, W), dtype=np.uint32)
        j = np.arange(D)
        bitpos = j * k
        w0i = bitpos >> 5
        s = (bitpos & 31).astype(np.uint64)
        lo = (nbr << s) & np.uint64(0xFFFFFFFF)
        # scatter-accumulate (distinct bit ranges per lane -> OR == add safe
        # only within one row-word; use np.bitwise_or.at)
        rows = np.repeat(np.arange(V), D).reshape(V, D)
        np.bitwise_or.at(packed, (rows, np.broadcast_to(w0i, (V, D))),
                         lo.astype(np.uint32))
        hi_mask = s + np.uint64(k) > 32
        if hi_mask.any():
            hi_vals = (nbr >> (np.uint64(32) - s))
            sel = np.broadcast_to(hi_mask, (V, D))
            np.bitwise_or.at(
                packed, (rows[sel], np.broadcast_to(w0i + 1, (V, D))[sel]),
                hi_vals.astype(np.uint32)[sel])
        return cls(jnp.asarray(packed), pg.deg, k, D, g.num_nodes,
                   g.num_edges)

    @property
    def nbr(self):
        """Materialized padded rows (for whole-graph kernels)."""
        return self.rows(jnp.arange(self.packed.shape[0], dtype=jnp.int32))

    def rows(self, vids):
        return kbit_decode_rows(self.packed, self.deg, vids, k=self.k,
                                d_pad=self.d_pad)

    def bits_per_edge(self) -> float:
        return self.packed.size * 32 / max(self.num_edges, 1)


class KbitGraphBucketed:
    """Per-neighborhood local widths, bucketed ({8,16,24,32} bits) —
    the `_Local` variants' TPU form."""

    BUCKETS = (8, 16, 24, 32)

    def __init__(self, parts, num_nodes: int, num_edges: int, v_pad: int):
        self.parts = parts          # {k: (KbitGraph-like, vids)}
        self.num_nodes = num_nodes
        self.num_edges = num_edges
        self.v_pad = v_pad

    @classmethod
    def from_csr(cls, g: CSRGraph) -> "KbitGraphBucketed":
        # row's local width = bits of its max neighbor id; rows are sorted,
        # so the max is the last CSR entry of each non-empty row (bulk
        # gather — the reference builder's O(m) pass, builder.h:328-781)
        maxn = np.ones(g.num_nodes, dtype=np.int64)
        nz = g.degrees > 0
        if g.num_edges:
            maxn[nz] = g.indices[np.asarray(g.indptr[1:])[nz] - 1]
        kreq = np.ceil(np.log2(np.maximum(maxn + 1, 2))).astype(np.int64)
        parts = {}
        pg_vpad = round_up(max(g.num_nodes, 1), 8)
        for kb in cls.BUCKETS:
            sel = (kreq <= kb)
            for smaller in cls.BUCKETS:
                if smaller < kb:
                    sel &= kreq > smaller
            vids = np.nonzero(sel)[0].astype(np.int32)
            if not len(vids):
                continue
            sub = _induce_rows(g, vids)
            parts[kb] = (KbitGraph.from_csr(sub, k=kb), vids)
        return cls(parts, g.num_nodes, g.num_edges, pg_vpad)

    def decode_all(self) -> np.ndarray:
        """int32[V_pad, D_pad] padded rows (host), for verification."""
        d_pad = max((p.d_pad for p, _ in self.parts.values()), default=1)
        out = np.full((self.v_pad, d_pad), SENTINEL, dtype=np.int32)
        for kb, (kg, vids) in self.parts.items():
            rows = np.asarray(kg.rows(jnp.arange(len(vids), dtype=jnp.int32)))
            out[vids, : kg.d_pad] = rows[: len(vids)]
        return out

    def bits_per_edge(self) -> float:
        total = sum(int(p.packed.size) * 32 for p, _ in self.parts.values())
        return total / max(self.num_edges, 1)


def _gather_rows(g: CSRGraph, deg: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Bulk CSR row gather: new (indptr, indices) keeping deg[v] entries of
    each row (deg[v] in {0, degree(v)}) — one repeat + one fancy gather,
    no per-vertex Python loop."""
    deg = deg.astype(np.int64)
    indptr = np.zeros(len(deg) + 1, dtype=np.int64)
    np.cumsum(deg, out=indptr[1:])
    total = int(indptr[-1])
    src_start = np.asarray(g.indptr[:-1], dtype=np.int64)
    pos = (np.repeat(src_start, deg)
           + np.arange(total, dtype=np.int64)
           - np.repeat(indptr[:-1], deg))
    return indptr, g.indices[pos].astype(np.int32)


def _induce_rows(g: CSRGraph, vids: np.ndarray) -> CSRGraph:
    """CSR containing only the rows of vids (compacted), ids unchanged."""
    deg = np.zeros(len(vids), dtype=np.int64)
    deg[:] = g.degrees[vids]
    sub_start = np.asarray(g.indptr[:-1], dtype=np.int64)[vids]
    indptr = np.zeros(len(vids) + 1, dtype=np.int64)
    np.cumsum(deg, out=indptr[1:])
    total = int(indptr[-1])
    pos = (np.repeat(sub_start, deg)
           + np.arange(total, dtype=np.int64)
           - np.repeat(indptr[:-1], deg))
    return CSRGraph(indptr, g.indices[pos].astype(np.int32), directed=True)


class KbitWeightedGraph:
    """Weighted k-bit adjacency (Kbit_Weighted_Adjacency_Array role,
    gapbs/builder.h:440,488 csrToKbitWeighted*; log_graph/
    kbit_adjacency_array.h weighted variants).

    Two packed planes sharing slot order: neighbor ids at ceil(log2 n) bits
    and weights at ceil(log2 (wmax+1)) bits — both decoded fully vectorized
    on device, so weighted kernels (SSSP) compute straight from the
    compressed form. Planes are separate (rather than the reference's
    interleaved tokens) so each keeps its minimal width without a 32-bit
    combined-token ceiling."""

    def __init__(self, ids: KbitGraph, wplane, kw: int):
        self.ids = ids
        self.wplane = wplane      # uint32[V_pad, Ww]
        self.kw = kw
        self.num_nodes = ids.num_nodes
        self.num_edges = ids.num_edges

    @classmethod
    def from_csr(cls, g: CSRGraph, weights: np.ndarray | None = None,
                 *, k: int | None = None) -> "KbitWeightedGraph":
        if weights is None:
            weights = (g.weights if g.weights is not None
                       else np.ones(g.num_edges, dtype=np.int32))
        ids = KbitGraph.from_csr(g, k=k)
        kw = _bits_for(int(np.max(weights, initial=1)) + 1)
        # weight rows laid out like the padded adjacency, then packed
        V, D = np.asarray(ids.deg).shape[0], ids.d_pad
        wrows = np.zeros((V, D), dtype=np.uint64)
        deg = g.degrees.astype(np.int64)
        rows = np.repeat(np.arange(g.num_nodes), deg)
        offs = (np.arange(g.num_edges, dtype=np.int64)
                - np.repeat(np.asarray(g.indptr[:-1], dtype=np.int64), deg))
        wrows[rows, offs] = np.asarray(weights, dtype=np.uint64)
        Ww = round_up(D * kw, 32) // 32
        packed = np.zeros((V, Ww), dtype=np.uint32)
        j = np.arange(D)
        bitpos = j * kw
        w0i, s = bitpos >> 5, (bitpos & 31).astype(np.uint64)
        rix = np.repeat(np.arange(V), D).reshape(V, D)
        np.bitwise_or.at(packed, (rix, np.broadcast_to(w0i, (V, D))),
                         ((wrows << s) & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        hi = s + np.uint64(kw) > 32
        if hi.any():
            sel = np.broadcast_to(hi, (V, D))
            np.bitwise_or.at(
                packed, (rix[sel], np.broadcast_to(w0i + 1, (V, D))[sel]),
                (wrows >> (np.uint64(32) - s)).astype(np.uint32)[sel])
        return cls(ids, jnp.asarray(packed), kw)

    @property
    def nbr(self):
        return self.ids.nbr

    def weight_rows(self):
        """int32[V_pad, D_pad] per-slot weights (0 on padding)."""
        vids = jnp.arange(self.wplane.shape[0], dtype=jnp.int32)
        w = kbit_decode_rows(self.wplane, self.ids.deg, vids, k=self.kw,
                             d_pad=self.ids.d_pad)
        return jnp.where(w == SENTINEL, 0, w)  # pad slots -> weight 0

    def bits_per_edge(self) -> float:
        total = (self.ids.packed.size + self.wplane.size) * 32
        return total / max(self.num_edges, 1)


# ---------------------------------------------------------------------------
# varint (delta + continuation bytes) — host storage codec
# ---------------------------------------------------------------------------

def varint_encode_graph(g: CSRGraph) -> dict:
    """Delta + varint bytes per row (varint_byte_based_graph.h role).

    First value per row is the raw id; the rest are gaps-1 (rows are sorted
    strictly increasing after squish). Fully vectorized: per-token byte
    lengths, one cumsum for positions, one masked store per byte lane —
    O(m) like the reference's builder pass (builder.h:560-654), not a
    Python loop over vertices.
    """
    n = g.num_nodes
    m = int(g.num_edges)
    idx = g.indices.astype(np.int64)
    indptr = np.asarray(g.indptr, dtype=np.int64)
    starts = indptr[:-1][g.degrees > 0]          # first-token positions
    vals = np.empty(m, dtype=np.int64)
    if m:
        vals[1:] = idx[1:] - idx[:-1] - 1
        vals[starts] = idx[starts]
    # bytes per token: ceil(bit_length/7), min 1
    nb = np.ones(m, dtype=np.int64)
    v = vals >> 7
    while v.any():
        nb[v > 0] += 1
        v >>= 7
    cum = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(nb, out=cum[1:])
    payload = np.zeros(int(cum[-1]), dtype=np.uint8)
    for b in range(int(nb.max(initial=0))):
        sel = nb > b
        more = nb > b + 1
        payload[cum[:-1][sel] + b] = (
            ((vals[sel] >> (7 * b)) & 0x7F) | np.where(more[sel], 0x80, 0)
        ).astype(np.uint8)
    offsets = cum[indptr]
    return {"payload": payload.tobytes(), "offsets": offsets,
            "num_nodes": n, "directed": g.directed()}


def varint_decode_graph(data: dict) -> CSRGraph:
    buf = np.frombuffer(data["payload"], dtype=np.uint8)
    offsets = data["offsets"]
    n = data["num_nodes"]
    # vectorized continuation-bit parse over the whole payload
    cont = (buf & 0x80) > 0
    ends = np.nonzero(~cont)[0]
    starts = np.concatenate([[0], ends[:-1] + 1])
    vals = np.zeros(len(ends), dtype=np.int64)
    width = ends - starts + 1
    for b in range(int(width.max(initial=0))):
        sel = width > b
        vals[sel] |= (buf[starts[sel] + b] & 0x7F).astype(np.int64) << (7 * b)
    # map token index ranges back to rows
    tok_of_byte = np.zeros(len(buf) + 1, dtype=np.int64)
    tok_of_byte[ends + 1] = 1
    tok_of_byte = np.cumsum(tok_of_byte)
    indptr = tok_of_byte[offsets]
    # segment prefix-sum: token t in row v decodes to
    # first + Σ(gap_i + 1) = csum[t] - (csum[start] - vals[start])
    m = int(indptr[-1])
    deg = np.diff(indptr)
    row_start = indptr[:-1][deg > 0]
    adj = vals + 1
    if m:
        adj[row_start] = vals[row_start]
    csum = np.cumsum(adj)
    base = np.zeros(m, dtype=np.int64)
    if m:
        base[:] = np.repeat(csum[row_start] - vals[row_start], deg[deg > 0])
    indices = csum - base
    return CSRGraph(indptr, indices.astype(np.int32),
                    directed=data["directed"])


def varint_encode_graph_words(g: CSRGraph) -> dict:
    """WORD-packed delta varint (VarintWordBasedGraph role — the
    reference ships both byte- and word-based variants,
    varint_byte_based_graph.h:7 / builder.h csrToVarintWordBased:656):
    each token is a run of uint32 words carrying 31 payload bits plus an
    MSB continuation bit. Wider tokens than the byte codec for small
    gaps, but decode touches word-aligned lanes only — the layout that
    vectorizes on 32-bit registers. Same delta scheme as
    `varint_encode_graph` (first token per row raw, rest gap-1)."""
    n = g.num_nodes
    m = int(g.num_edges)
    idx = g.indices.astype(np.int64)
    indptr = np.asarray(g.indptr, dtype=np.int64)
    starts = indptr[:-1][g.degrees > 0]
    vals = np.empty(m, dtype=np.int64)
    if m:
        vals[1:] = idx[1:] - idx[:-1] - 1
        vals[starts] = idx[starts]
    nw = np.ones(m, dtype=np.int64)
    v = vals >> 31
    while v.any():
        nw[v > 0] += 1
        v >>= 31
    cum = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(nw, out=cum[1:])
    payload = np.zeros(int(cum[-1]), dtype=np.uint32)
    for w in range(int(nw.max(initial=0))):
        sel = nw > w
        more = nw > w + 1
        payload[cum[:-1][sel] + w] = (
            ((vals[sel] >> (31 * w)) & 0x7FFFFFFF)
            | np.where(more[sel], np.int64(1) << 31, 0)
        ).astype(np.uint32)
    offsets = cum[indptr]
    return {"payload": payload.tobytes(), "offsets": offsets,
            "num_nodes": n, "directed": g.directed(), "word": True}


def varint_decode_graph_words(data: dict) -> CSRGraph:
    buf = np.frombuffer(data["payload"], dtype=np.uint32)
    offsets = data["offsets"]
    n = data["num_nodes"]
    cont = (buf >> 31) > 0
    ends = np.nonzero(~cont)[0]
    starts = np.concatenate([[0], ends[:-1] + 1])
    vals = np.zeros(len(ends), dtype=np.int64)
    width = ends - starts + 1
    for w in range(int(width.max(initial=0))):
        sel = width > w
        vals[sel] |= ((buf[starts[sel] + w] & 0x7FFFFFFF)
                      .astype(np.int64) << (31 * w))
    tok_of_word = np.zeros(len(buf) + 1, dtype=np.int64)
    tok_of_word[ends + 1] = 1
    tok_of_word = np.cumsum(tok_of_word)
    indptr = tok_of_word[offsets]
    m = int(indptr[-1])
    deg = np.diff(indptr)
    row_start = indptr[:-1][deg > 0]
    adj = vals + 1
    if m:
        adj[row_start] = vals[row_start]
    csum = np.cumsum(adj)
    base = np.zeros(m, dtype=np.int64)
    if m:
        base[:] = np.repeat(csum[row_start] - vals[row_start],
                            deg[deg > 0])
    indices = csum - base
    return CSRGraph(indptr, indices.astype(np.int32),
                    directed=data["directed"])


# ---------------------------------------------------------------------------
# hybrid per-row representation (Bit_Tree_Graph role)
# ---------------------------------------------------------------------------

class HybridGraph:
    """Per-row k-bit vs dense-bitmap choice by footprint
    (bit_tree_graph.h:26-50 Offset_Or_Address role)."""

    def __init__(self, kbit: KbitGraph, bitmap_rows, bitmap_vids,
                 num_nodes: int, num_edges: int):
        self.kbit = kbit
        self.bitmap_rows = bitmap_rows    # uint32[Nb, V_words]
        self.bitmap_vids = bitmap_vids    # int32[Nb]
        self.num_nodes = num_nodes
        self.num_edges = num_edges

    @classmethod
    def from_csr(cls, g: CSRGraph) -> "HybridGraph":
        k = _bits_for(g.num_nodes)
        vwords = round_up(max(g.num_nodes, 32), 32) // 32
        deg = g.degrees
        # bitmap wins when deg * k > V bits
        use_bitmap = deg.astype(np.int64) * k > 32 * vwords
        bm_vids = np.nonzero(use_bitmap)[0].astype(np.int32)
        bm = np.zeros((len(bm_vids), vwords), dtype=np.uint32)
        for i, v in enumerate(bm_vids):
            row = g.out_neigh(int(v))
            np.bitwise_or.at(bm[i], row >> 5,
                             (np.uint32(1) << (row.astype(np.uint32) & 31)))
        # k-bit part stores non-bitmap rows (bitmap rows truncated to empty)
        g2 = _mask_rows(g, bm_vids)
        return cls(KbitGraph.from_csr(g2, k=k), jnp.asarray(bm),
                   jnp.asarray(bm_vids), g.num_nodes, g.num_edges)

    def decode_all(self) -> np.ndarray:
        from gms_tpu.sets.bitmap_ops import cardinality, to_ids

        kb = np.asarray(self.kbit.nbr)
        width = kb.shape[1]
        if len(self.bitmap_vids):
            bm_deg = int(np.asarray(cardinality(self.bitmap_rows)).max(initial=0))
            width = max(width, round_up(max(bm_deg, 1), 128))
        out = np.full((kb.shape[0], width), SENTINEL, dtype=np.int32)
        out[:, : kb.shape[1]] = kb
        if len(self.bitmap_vids):
            w = min(width, self.bitmap_rows.shape[1] * 32)
            ids = np.asarray(to_ids(self.bitmap_rows, w))
            out[np.asarray(self.bitmap_vids), :w] = ids
        return out

    def bits_per_edge(self) -> float:
        total = int(self.kbit.packed.size) * 32 + int(self.bitmap_rows.size) * 32
        return total / max(self.num_edges, 1)


def as_csr(rep) -> CSRGraph:
    """Decode any compressed representation back to a host CSRGraph.

    Bridge for algorithms whose preparation is host-side (e.g. the tiered
    TrianglePlan): the compressed form is the storage/footprint option
    (log_graph converter.cc role); kernels that can compute from padded
    rows take the rep directly via gapbs._prep.
    """
    if isinstance(rep, CSRGraph):
        return rep
    if isinstance(rep, KbitGraph):
        rows = np.asarray(rep.nbr)[: rep.num_nodes]
    elif isinstance(rep, (KbitGraphBucketed, HybridGraph)):
        rows = rep.decode_all()[: rep.num_nodes]
    else:
        raise TypeError(f"unsupported representation: {type(rep)!r}")
    sent = np.int32(SENTINEL)
    deg = (rows != sent).sum(axis=1)
    indptr = np.zeros(rep.num_nodes + 1, dtype=np.int64)
    indptr[1:] = np.cumsum(deg)
    indices = rows[rows != sent].astype(np.int32)
    return CSRGraph(indptr, indices, directed=False)


def _mask_rows(g: CSRGraph, vids: np.ndarray) -> CSRGraph:
    """CSR with the rows of vids emptied (bulk gather, no Python loop)."""
    deg = g.degrees.astype(np.int64).copy()
    deg[vids] = 0
    indptr, indices = _gather_rows(g, deg)
    return CSRGraph(indptr, indices, directed=True)
