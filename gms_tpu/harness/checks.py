"""Paranoid-mode invariant checking — the sanitizer-build analog.

Role of the reference's `DEBUG_WITH_SANITIZERS` CMake option
(/root/reference/CMakeLists.txt:5,24-30: ASan+UBSan on Debug builds) and its
pervasive asserts (`check_is_sorted`, sorted_set.h:265-268). A JAX program
has no out-of-bounds UB to sanitize — gathers clip, scatters drop — but the
FAILURE MODE those modes would catch here is silent data corruption through
a malformed padded layout (unsorted rows, holes before the SENTINEL tail,
a clobbered guard row, deg/row mismatch). Enable with GMS_TPU_PARANOID=1:

  * `PaddedGraph.from_csr` validates every graph it builds;
  * `validate_padded` can be called directly around custom layouts;
  * jax_debug_nans is switched on (float paths: similarity, coloring).

Checks are O(V*D) host numpy — debug builds only, like the reference's.
"""

from __future__ import annotations

import os

import numpy as np

SENTINEL = np.int32(np.iinfo(np.int32).max)


def paranoid() -> bool:
    return bool(os.environ.get("GMS_TPU_PARANOID"))


def enable(flag: bool = True) -> None:
    """Programmatic switch (also flips jax_debug_nans)."""
    import jax

    os.environ["GMS_TPU_PARANOID"] = "1" if flag else ""
    jax.config.update("jax_debug_nans", flag)


def validate_padded(nbr, deg, num_nodes: int, *, name: str = "graph") -> None:
    """Assert the padded-adjacency invariants every kernel relies on:

      1. each row's first deg[v] slots are sorted strictly ascending, in
         [0, num_nodes), with no SENTINEL holes;
      2. everything at or beyond deg[v] is SENTINEL;
      3. at least one all-SENTINEL guard row exists past the real vertices
         (clip-gather target for pad ids);
      4. deg matches the SENTINEL boundary exactly.
    """
    nbr = np.asarray(nbr)
    deg = np.asarray(deg)
    V, D = nbr.shape
    if V < num_nodes + 1:
        raise AssertionError(f"{name}: no guard row (V={V}, n={num_nodes})")
    lanes = np.arange(D)[None, :]
    valid = nbr != SENTINEL
    count = valid.sum(axis=1)
    if not (count == deg[:V]).all():
        bad = int(np.nonzero(count != deg[:V])[0][0])
        raise AssertionError(
            f"{name}: row {bad} has {count[bad]} entries but deg {deg[bad]}")
    in_deg = lanes < deg[:V, None]
    if (valid != in_deg).any():
        bad = int(np.nonzero((valid != in_deg).any(axis=1))[0][0])
        raise AssertionError(f"{name}: row {bad} has SENTINEL holes")
    body = np.where(in_deg, nbr, np.int32(-1))
    if body.max(initial=-1) >= num_nodes or (
            np.where(in_deg, nbr, 0) < 0).any():
        raise AssertionError(f"{name}: neighbor id out of [0, n)")
    nxt = np.where(in_deg[:, 1:] & in_deg[:, :-1],
                   nbr[:, 1:] - nbr[:, :-1], 1)
    if (nxt <= 0).any():
        bad = int(np.nonzero((nxt <= 0).any(axis=1))[0][0])
        raise AssertionError(f"{name}: row {bad} not strictly sorted")
    if (nbr[num_nodes:] != SENTINEL).any():
        raise AssertionError(f"{name}: guard rows clobbered")
