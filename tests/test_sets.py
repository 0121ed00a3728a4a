"""Set-algebra property suite — role of testing/sets.cpp TYPED_TEST over
{SortedSet, RoaringSet, RobinHoodSet}; here typed over the two TPU layouts
(padded sorted rows, bitmap words), checked against Python set oracles."""

import numpy as np
import pytest
import jax.numpy as jnp

from gms_tpu.graphs.tiles import SENTINEL
from gms_tpu.sets import ops, bitmap_ops


def make_cases(seed=0, num=32, universe=200, max_len=40):
    rng = np.random.default_rng(seed)
    cases = []
    # deliberate edge cases: empty/empty, empty/full, identical, disjoint
    cases.append((np.array([], dtype=np.int64), np.array([], dtype=np.int64)))
    cases.append((np.array([], dtype=np.int64), np.arange(10)))
    cases.append((np.arange(10), np.arange(10)))
    cases.append((np.arange(0, 20, 2), np.arange(1, 21, 2)))
    for _ in range(num - len(cases)):
        la = rng.integers(0, max_len)
        lb = rng.integers(0, max_len)
        a = np.unique(rng.integers(0, universe, la))
        b = np.unique(rng.integers(0, universe, lb))
        cases.append((a, b))
    return cases


def pad_batch(sets, width):
    out = np.full((len(sets), width), SENTINEL, dtype=np.int32)
    for i, s in enumerate(sets):
        s = np.sort(np.asarray(s, dtype=np.int32))
        out[i, : len(s)] = s
    return jnp.asarray(out)


def unpad(row):
    row = np.asarray(row)
    return set(row[row != int(SENTINEL)].tolist())


CASES = make_cases()
A = pad_batch([a for a, _ in CASES], 64)
B = pad_batch([b for _, b in CASES], 48)
ORACLE = [(set(a.tolist()), set(b.tolist())) for a, b in CASES]


class TestSortedRows:
    def test_cardinality(self):
        got = np.asarray(ops.cardinality(A))
        for i, (a, _) in enumerate(ORACLE):
            assert got[i] == len(a)

    @pytest.mark.parametrize("method", ["compare", "searchsorted"])
    def test_intersect_count(self, method):
        got = np.asarray(ops.intersect_count(A, B, method=method))
        for i, (a, b) in enumerate(ORACLE):
            assert got[i] == len(a & b), i

    @pytest.mark.parametrize("method", ["compare", "searchsorted"])
    def test_intersect(self, method):
        got = ops.intersect(A, B, method=method)
        for i, (a, b) in enumerate(ORACLE):
            assert unpad(got[i]) == a & b, i

    def test_union(self):
        got = ops.union(A, B)
        for i, (a, b) in enumerate(ORACLE):
            assert unpad(got[i]) == a | b, i

    def test_union_count(self):
        got = np.asarray(ops.union_count(A, B))
        for i, (a, b) in enumerate(ORACLE):
            assert got[i] == len(a | b), i

    def test_difference(self):
        got = ops.difference(A, B)
        for i, (a, b) in enumerate(ORACLE):
            assert unpad(got[i]) == a - b, i

    def test_difference_count(self):
        got = np.asarray(ops.difference_count(A, B))
        for i, (a, b) in enumerate(ORACLE):
            assert got[i] == len(a - b), i

    def test_contains(self):
        probes = jnp.asarray(
            np.array([list(a)[0] if a else 123456 for a, _ in ORACLE], dtype=np.int32)
        )
        got = np.asarray(ops.contains(A, probes))
        for i, (a, _) in enumerate(ORACLE):
            assert got[i] == (len(a) > 0)

    def test_add_remove(self):
        x = jnp.asarray(np.full(len(CASES), 7, dtype=np.int32))
        added = ops.add(A, x)
        for i, (a, _) in enumerate(ORACLE):
            assert unpad(added[i]) == a | {7}
        removed = ops.remove(A, x)
        for i, (a, _) in enumerate(ORACLE):
            assert unpad(removed[i]) == a - {7}

    def test_rows_stay_sorted_and_padded(self):
        for out in [ops.intersect(A, B), ops.union(A, B), ops.difference(A, B)]:
            arr = np.asarray(out)
            for row in arr:
                vals = row[row != int(SENTINEL)]
                assert np.all(np.diff(vals) > 0)
                # padding strictly at the end
                k = len(vals)
                assert np.all(row[k:] == int(SENTINEL))


WORDS = 8  # universe 200 < 256 bits


class TestBitmapRows:
    @pytest.fixture(scope="class")
    def ab(self):
        a = bitmap_ops.from_ids(A, WORDS)
        b = bitmap_ops.from_ids(B, WORDS)
        return a, b

    def test_from_ids_cardinality(self, ab):
        a, b = ab
        ca = np.asarray(bitmap_ops.cardinality(a))
        for i, (sa, _) in enumerate(ORACLE):
            assert ca[i] == len(sa)

    def test_intersect_count(self, ab):
        a, b = ab
        got = np.asarray(bitmap_ops.intersect_count(a, b))
        for i, (sa, sb) in enumerate(ORACLE):
            assert got[i] == len(sa & sb)

    def test_union_difference(self, ab):
        a, b = ab
        uc = np.asarray(bitmap_ops.union_count(a, b))
        dc = np.asarray(bitmap_ops.difference_count(a, b))
        for i, (sa, sb) in enumerate(ORACLE):
            assert uc[i] == len(sa | sb)
            assert dc[i] == len(sa - sb)

    def test_to_ids_roundtrip(self, ab):
        a, _ = ab
        back = bitmap_ops.to_ids(a, 64)
        for i, (sa, _) in enumerate(ORACLE):
            assert unpad(back[i]) == sa

    def test_contains_add_remove(self, ab):
        a, _ = ab
        x = jnp.asarray(np.full(len(CASES), 7, dtype=np.int32))
        got = np.asarray(bitmap_ops.contains(a, x))
        for i, (sa, _) in enumerate(ORACLE):
            assert got[i] == (7 in sa)
        added = bitmap_ops.add(a, x)
        removed = bitmap_ops.remove(a, x)
        ca = np.asarray(bitmap_ops.cardinality(added))
        cr = np.asarray(bitmap_ops.cardinality(removed))
        for i, (sa, _) in enumerate(ORACLE):
            assert ca[i] == len(sa | {7})
            assert cr[i] == len(sa - {7})


def test_format_helpers(capsys):
    import numpy as np
    from gms_tpu.sets import format as fmt
    from gms_tpu.graphs.tiles import SENTINEL
    from gms_tpu.io.builder import build_csr

    row = np.array([1, 5, 9, SENTINEL, SENTINEL], dtype=np.int32)
    np.testing.assert_array_equal(fmt.set_to_vector(row), [1, 5, 9])
    assert fmt.set2str(row) == "{1, 5, 9}"
    fmt.print_set(row, label="s")
    fmt.print_array("a", [1, 2, 3])
    g = build_csr(np.array([[0, 1], [1, 2]], dtype=np.int64), num_nodes=3)
    fmt.print_graph_neighborhoods(g)
    out = capsys.readouterr().out
    assert "s {1, 5, 9}" in out and "a: 1 2 3" in out and "1: {0, 2}" in out
    np.testing.assert_array_equal(
        fmt.bitmap_to_vector(np.array([0b1010, 1], dtype=np.uint32)), [1, 3, 32])
    assert len(fmt.sets_to_vector(np.stack([row, row]))) == 2
