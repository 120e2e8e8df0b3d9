"""Column maps (index.colmap): correctness of the anchor-coordinate system."""

import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st

from rambl_tpu.index.colmap import _nw_map, anchor_of_leaf, build_col_maps


def test_identity_for_equal_sequences():
    a = np.array([0, 1, 2, 3, 0, 1], np.int8)
    m = _nw_map(a, a)
    np.testing.assert_array_equal(m, np.arange(6))


def test_substitution_only_is_identity():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 4, 200).astype(np.int8)
    b = a.copy()
    b[[10, 50, 120]] = (b[[10, 50, 120]] + 1) % 4
    np.testing.assert_array_equal(_nw_map(a, b), np.arange(200))


def test_deletion_shifts_map():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 4, 100).astype(np.int8)
    b = np.delete(a, 40)  # b misses a's column 40
    m = _nw_map(a, b)
    np.testing.assert_array_equal(m[:40], np.arange(40))
    np.testing.assert_array_equal(m[40:], np.arange(41, 100))


def test_insertion_maps_to_minus_one():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 4, 100).astype(np.int8)
    b = np.insert(a, 60, (a[60] + 1) % 4)  # extra base not in a
    m = _nw_map(a, b)
    assert (m == -1).sum() == 1
    kept = m[m >= 0]
    np.testing.assert_array_equal(kept, np.arange(100))


@given(st.integers(0, 2 ** 31 - 1), st.integers(20, 80))
@settings(max_examples=30, deadline=None)
def test_map_monotone_and_bounded(seed, L):
    """Mapped columns are strictly increasing (alignment monotonicity) and
    within the anchor's range."""
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 4, L).astype(np.int8)
    # mutate + indel
    b = a.copy()
    mask = rng.random(L) < 0.1
    b[mask] = (b[mask] + 1) % 4
    if L > 10 and rng.random() < 0.5:
        b = np.delete(b, int(rng.integers(1, L - 1)))
    m = _nw_map(a, b)
    mapped = m[m >= 0]
    assert (np.diff(mapped) > 0).all()
    if mapped.size:
        assert mapped.min() >= 0 and mapped.max() < L


def test_anchor_of_leaf():
    taxa = np.array([5, 5, 7, 5, 7], np.int32)
    np.testing.assert_array_equal(anchor_of_leaf(taxa), [0, 0, 2, 0, 2])


def test_build_col_maps_shapes(small_ds, small_tax):
    cm = build_col_maps(small_ds.ref_seqs, small_ds.ref_lens,
                        small_tax.ref_taxon)
    assert cm.shape == small_ds.ref_seqs.shape
    # anchors are identity over their length
    anchors = anchor_of_leaf(small_tax.ref_taxon)
    for r in np.nonzero(anchors == np.arange(len(anchors)))[0][:3]:
        L = int(small_ds.ref_lens[r])
        np.testing.assert_array_equal(cm[r, :L], np.arange(L))
        assert (cm[r, L:] == -1).all()
