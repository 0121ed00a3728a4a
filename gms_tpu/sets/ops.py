"""Batched set algebra over padded sorted rows — the Set concept, TPU-native.

Role of the reference's Set concept (gms/representations/sets/sorted_set.h:89-262:
cardinality / intersect / intersect_count / union / difference / contains) and
its merge kernels (sorted_set_operations.h:29-106). TPU-first re-design: every
op takes a *batch* of set pairs as two rectangular int32 arrays

    a : int32[B, Da]    b : int32[B, Db]

rows sorted ascending, padded with SENTINEL (int32 max). The unit of work is
"all pairs in a shard", never one pair — a scalar two-pointer merge would
serialize the VPU.

Two intersection strategies, selected by tile size:
  * broadcast-compare: (a[:,:,None] == b[:,None,:]) masked + reduced. Pure
    dense VPU work, XLA fuses compare+reduce, no gathers. Wins for small/mid
    degrees (the common case after degeneracy orientation).
  * searchsorted: binary-search b for each element of a (O(Da log Db)
    gathers). Wins for very wide rows.

All counts are exact integers (int32 per pair, accumulate in int64 above).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gms_tpu.graphs.tiles import SENTINEL

# Above this compare-matrix size per pair, switch to searchsorted.
_COMPARE_LIMIT = 1 << 21


def valid_mask(rows):
    return rows != SENTINEL


def cardinality(rows):
    """int32[B] true sizes (sorted_set.h cardinality)."""
    return jnp.sum(valid_mask(rows), axis=-1, dtype=jnp.int32)


# ---------------------------------------------------------------------------
# membership cores
# ---------------------------------------------------------------------------

def _member_compare(a, b):
    """bool[B, Da]: a[i] in b-row, via dense broadcast equality."""
    eq = a[:, :, None] == b[:, None, :]
    hit = jnp.any(eq, axis=2)
    return hit & valid_mask(a)


def _member_searchsorted(a, b):
    """bool[B, Da]: a[i] in b-row, via per-row binary search."""
    idx = jax.vmap(lambda bb, aa: jnp.searchsorted(bb, aa, side="left"))(b, a)
    idx = jnp.minimum(idx, b.shape[1] - 1)
    found = jnp.take_along_axis(b, idx, axis=1) == a
    return found & valid_mask(a)


def member(a, b, *, method: str = "auto"):
    """bool[B, Da]: membership of each a-element in its paired b-row."""
    if method == "auto":
        method = "compare" if a.shape[1] * b.shape[1] <= _COMPARE_LIMIT else "searchsorted"
    if method == "compare":
        return _member_compare(a, b)
    return _member_searchsorted(a, b)


# ---------------------------------------------------------------------------
# the Set concept ops
# ---------------------------------------------------------------------------

def intersect_count(a, b, *, method: str = "auto"):
    """int32[B] = |a_i ∩ b_i| (sorted_set.h:176-182 / vec_set_intersect_count)."""
    return jnp.sum(member(a, b, method=method), axis=1, dtype=jnp.int32)


def intersect(a, b, *, method: str = "auto"):
    """int32[B, Da] = sorted (a_i ∩ b_i), SENTINEL-padded (sorted_set.h:160-166)."""
    m = member(a, b, method=method)
    return jnp.sort(jnp.where(m, a, SENTINEL), axis=1)


def difference(a, b, *, method: str = "auto"):
    """int32[B, Da] = sorted (a_i \\ b_i) (sorted_set.h:184-216)."""
    m = member(a, b, method=method)
    keep = valid_mask(a) & ~m
    return jnp.sort(jnp.where(keep, a, SENTINEL), axis=1)


def union(a, b):
    """int32[B, Da+Db] = sorted (a_i ∪ b_i) (sorted_set.h:104-158).

    concat -> sort -> drop duplicates (neighbor-equal after sort) -> re-sort.
    """
    cat = jnp.sort(jnp.concatenate([a, b], axis=1), axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((cat.shape[0], 1), dtype=bool), cat[:, 1:] == cat[:, :-1]], axis=1
    )
    keep = valid_mask(cat) & ~dup
    return jnp.sort(jnp.where(keep, cat, SENTINEL), axis=1)


def union_count(a, b):
    """int32[B] = |a_i ∪ b_i| without materializing (|a|+|b|-|a∩b|)."""
    return cardinality(a) + cardinality(b) - intersect_count(a, b)


def difference_count(a, b):
    return cardinality(a) - intersect_count(a, b)


def contains(rows, x):
    """bool[B]: x_i ∈ row_i (sorted_set.h:218 lower_bound probe)."""
    x = x[:, None]
    idx = jax.vmap(lambda r, v: jnp.searchsorted(r, v, side="left"))(rows, x)
    idx = jnp.minimum(idx, rows.shape[1] - 1)
    return (jnp.take_along_axis(rows, idx, axis=1) == x)[:, 0] & (x[:, 0] != SENTINEL)


def add(rows, x):
    """int32[B, D+1]: insert x_i into each row (sorted_set.h add)."""
    return jnp.sort(jnp.concatenate([rows, x[:, None]], axis=1), axis=1)


def remove(rows, x):
    """int32[B, D]: delete x_i from each row if present."""
    hit = rows == x[:, None]
    return jnp.sort(jnp.where(hit, SENTINEL, rows), axis=1)


def to_array(row):
    """Host-side: compact one padded row to its true elements (numpy)."""
    import numpy as np

    row = np.asarray(row)
    return row[row != SENTINEL]


def from_array(values, width: int):
    """Host-side: pad a sorted 1-D array to a padded row of `width`."""
    import numpy as np

    values = np.sort(np.asarray(values, dtype=np.int32))
    out = np.full(width, SENTINEL, dtype=np.int32)
    out[: len(values)] = values
    return jnp.asarray(out)
