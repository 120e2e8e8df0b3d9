"""Smith-Waterman oracle: batch wavefront == scalar DP, traceback parity.

This pins the alignment spec of SURVEY.md section 3.2 (banded affine-gap SW
with locked tie-breaking) that every faster implementation must match.
"""

import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st

from rambl_tpu.config import ScoringParams
from rambl_tpu.oracle.sw import (
    sw_batch,
    sw_scalar,
    traceback_batch,
    traceback_scalar,
)

SC = ScoringParams()


def _assert_pair_matches(q, w):
    s, ie, je, Hch, Eo, Fo = sw_scalar(q, w, SC)
    sb, ieb, jeb, dirp = sw_batch(q[None, :], w[None, :], SC)
    assert sb[0] == s
    assert (ieb[0], jeb[0]) == (ie, je)
    rc_s = traceback_scalar(Hch, Eo, Fo, ie, je, len(q))
    rc_b = traceback_batch(dirp, ieb, jeb, len(q))[0]
    np.testing.assert_array_equal(rc_s, rc_b)
    return s, rc_s


def test_exact_match():
    q = np.array([0, 1, 2, 3, 0, 1, 2, 3], np.int8)
    w = np.concatenate([[3, 3], q, [3, 3]]).astype(np.int8)
    s, rc = _assert_pair_matches(q, w)
    assert s == 8 * SC.match
    np.testing.assert_array_equal(rc, np.arange(2, 10))


def test_mismatch_in_middle():
    q = np.array([0, 1, 2, 3, 0, 1, 2, 3], np.int8)
    w = q.copy()
    w[4] = 3
    s, rc = _assert_pair_matches(q, w)
    # 7 matches + 1 mismatch vs clipping to the better side
    assert s == max(7 * SC.match + SC.mismatch, 4 * SC.match)


def test_gap_alignment():
    # query = window with one base deleted; context long enough that the
    # affine gap (cost 7) beats clipping to one side
    rng = np.random.default_rng(7)
    w = rng.integers(0, 4, 30).astype(np.int8)
    q = np.delete(w, 15)
    s, rc = _assert_pair_matches(q, w)
    assert s == 29 * SC.match - SC.gap_open - SC.gap_extend
    # traceback must skip window column 15
    assert 15 not in rc.tolist()
    # all other columns aligned in order
    assert rc[14] == 14 and rc[15] == 16


def test_n_never_matches():
    q = np.full(6, 4, np.int8)
    w = np.full(8, 4, np.int8)
    s, *_ = sw_scalar(q, w, SC)
    assert s == 0


def test_no_alignment_when_all_mismatch():
    q = np.zeros(5, np.int8)          # AAAAA
    w = np.full(7, 3, np.int8)        # TTTTTTT
    s, ie, je, *_ = sw_scalar(q, w, SC)
    assert s == 0 and ie == 0 and je == 0


@given(
    st.integers(0, 2 ** 31 - 1),
    st.integers(4, 20),
    st.integers(6, 28),
    st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_random_pairs_batch_equals_scalar(seed, L, W, plant):
    rng = np.random.default_rng(seed)
    q = rng.integers(0, 5, L).astype(np.int8)
    w = rng.integers(0, 5, W).astype(np.int8)
    if plant and W > 8:
        n = min(L, W - 2)
        w[2 : 2 + n] = q[:n]
    _assert_pair_matches(q, w)


def test_batch_rows_independent():
    rng = np.random.default_rng(0)
    q = rng.integers(0, 4, (8, 16)).astype(np.int8)
    w = rng.integers(0, 4, (8, 24)).astype(np.int8)
    s_all, ie_all, je_all, _ = sw_batch(q, w, SC)
    for b in range(8):
        s1, ie1, je1, _ = sw_batch(q[b : b + 1], w[b : b + 1], SC)
        assert s_all[b] == s1[0] and ie_all[b] == ie1[0] and je_all[b] == je1[0]
