"""Batched set algebra over bitmap tiles (uint32 words).

Role of the reference's RoaringSet ops (gms/representations/sets/roaring_set.h
:77-225: &, |, -, and_cardinality). TPU-native form: rows are fixed-width
uint32 word vectors; intersection is word-AND, cardinality is
`lax.population_count` + sum — pure VPU work at HBM bandwidth, no
container/run/array polymorphism (dense beats compressed on a vector unit).

All rows: uint32[B, W]. Element j of the set <-> bit (j & 31) of word (j >> 5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def popcount(words):
    return jax.lax.population_count(words)


def cardinality(rows):
    """int32[B]."""
    return jnp.sum(popcount(rows), axis=-1, dtype=jnp.int32)


def intersect(a, b):
    return a & b


def intersect_count(a, b):
    """int32[B] = popcount(a & b) — Roaring and_cardinality equivalent."""
    return cardinality(a & b)


def union(a, b):
    return a | b


def union_count(a, b):
    return cardinality(a | b)


def difference(a, b):
    return a & ~b


def difference_count(a, b):
    return cardinality(a & ~b)


def contains(rows, x):
    """bool[B]: bit x_i set in row_i."""
    word = jnp.take_along_axis(rows, (x[:, None] >> 5).astype(jnp.int32), axis=1)[:, 0]
    return (word >> (x.astype(jnp.uint32) & 31)) & 1 == 1


def add(rows, x):
    onehot_word = jax.nn.one_hot(x >> 5, rows.shape[1], dtype=jnp.uint32)
    bit = (jnp.uint32(1) << (x.astype(jnp.uint32) & 31))[:, None]
    return rows | (onehot_word * bit)


def remove(rows, x):
    onehot_word = jax.nn.one_hot(x >> 5, rows.shape[1], dtype=jnp.uint32)
    bit = (jnp.uint32(1) << (x.astype(jnp.uint32) & 31))[:, None]
    return rows & ~(onehot_word * bit)


def from_ids(ids_rows, width_words: int):
    """Convert padded sorted int rows -> bitmap rows.

    ids_rows: int32[B, D] SENTINEL-padded. Returns uint32[B, W].
    """
    from gms_tpu.graphs.tiles import SENTINEL

    B, _ = ids_rows.shape
    word_idx = jnp.where(ids_rows == SENTINEL, width_words, ids_rows >> 5)
    bit = jnp.where(
        ids_rows == SENTINEL,
        jnp.uint32(0),
        jnp.uint32(1) << (ids_rows.astype(jnp.uint32) & 31),
    )
    # scatter-OR rows into word lanes: one_hot over word index then OR-reduce
    onehot = jax.nn.one_hot(word_idx, width_words, dtype=jnp.uint32)  # [B, D, W]
    vals = onehot * bit[:, :, None]
    return jax.lax.reduce(
        vals, jnp.uint32(0), jax.lax.bitwise_or, (1,)
    )


def to_ids(bitmap_rows, width_ids: int):
    """Convert bitmap rows -> padded sorted int rows of width `width_ids`."""
    from gms_tpu.graphs.tiles import SENTINEL

    B, W = bitmap_rows.shape
    n = W * 32
    ids = jax.lax.broadcasted_iota(jnp.int32, (B, n), 1)
    word = jnp.repeat(bitmap_rows, 32, axis=1)  # position j holds word j>>5
    bitset = (word >> (ids.astype(jnp.uint32) & 31)) & 1 == 1
    padded = jnp.where(bitset, ids, SENTINEL)
    return jax.lax.slice_in_dim(jnp.sort(padded, axis=1), 0, width_ids, axis=1)
