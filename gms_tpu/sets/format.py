"""Set formatting / conversion helpers.

Role of gms/common/format.h:9-104 (set2str, printSet, printArray,
printSubgraphNeighborhoods) and gms/common/conversions.h:8-29
(setToVector, setsToVector) — debugging and interop sugar over the padded
row / bitmap representations.
"""

from __future__ import annotations

import sys

import numpy as np

from gms_tpu.graphs.tiles import SENTINEL


def set_to_vector(row) -> np.ndarray:
    """Padded row -> compact int array (conversions.h setToVector)."""
    row = np.asarray(row)
    return row[row != SENTINEL]


def sets_to_vector(rows) -> list[np.ndarray]:
    """[B, D] padded rows -> list of compact arrays (setsToVector)."""
    return [set_to_vector(r) for r in np.asarray(rows)]


def set2str(row) -> str:
    """`{a, b, c}` rendering (format.h set2str)."""
    return "{" + ", ".join(str(int(x)) for x in set_to_vector(row)) + "}"


def print_set(row, *, label: str = "", out=None):
    print((label + " " if label else "") + set2str(row),
          file=out or sys.stdout)


def print_array(label: str, values, out=None):
    """`label: v0 v1 ...` (format.h printArray)."""
    vals = " ".join(str(v) for v in np.asarray(values).tolist())
    print(f"{label}: {vals}", file=out or sys.stdout)


def print_graph_neighborhoods(g, vertices=None, out=None):
    """Per-vertex neighborhood dump (format.h printSubgraphNeighborhoods)."""
    out = out or sys.stdout
    for v in (vertices if vertices is not None else range(g.num_nodes)):
        row = g.out_neigh(int(v))
        print(f"{v}: " + "{" + ", ".join(map(str, row.tolist())) + "}",
              file=out)


def bitmap_to_vector(words) -> np.ndarray:
    """uint32 bitmap words -> sorted int array of set bit positions."""
    words = np.asarray(words, dtype=np.uint32)
    out = []
    for w, word in enumerate(words):
        word = int(word)
        while word:
            b = (word & -word).bit_length() - 1
            out.append(w * 32 + b)
            word &= word - 1
    return np.asarray(out, dtype=np.int32)
