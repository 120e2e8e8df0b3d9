"""Pallas wavefront SW kernel == oracle, in interpreter mode (CPU tier).

Compiled-mode parity runs on the real chip via scripts/profile_align.py and
the bench; this is the CI "sanitizer" tier (SURVEY.md section 5 race
detection: interpret mode surfaces OOB/semaphore misuse).
"""

import numpy as np
import pytest

from rambl_tpu.config import ScoringParams
from rambl_tpu.oracle.sw import sw_batch
from rambl_tpu.ops.sw import sw_align, sw_traceback
from rambl_tpu.ops.sw_pallas import (
    sw_align_pallas,
    sw_score_pallas,
    sw_traceback_packed,
)

SC = ScoringParams()


def _gapped_cases(seed, B, L, W):
    """Random q/w with planted homology including indels (gapped paths)."""
    rng = np.random.default_rng(seed)
    q = rng.integers(0, 5, (B, L)).astype(np.int8)
    w = rng.integers(0, 5, (B, W)).astype(np.int8)
    for b in range(B):
        n = min(L, W) - 6
        frag = q[b, 1 : 1 + n].copy()
        if b % 3 == 1 and n > 8:           # deletion in the window copy
            frag = np.concatenate([frag[: n // 2], frag[n // 2 + 1 :]])
        if b % 3 == 2 and n > 8:           # insertion in the window copy
            frag = np.concatenate(
                [frag[: n // 2], rng.integers(0, 4, 1).astype(np.int8), frag])
        m = min(frag.shape[0], W - 2)
        w[b, 2 : 2 + m] = frag[:m]
    return q, w


@pytest.mark.parametrize("seed,L,W", [(0, 32, 48), (1, 16, 24), (2, 64, 80)])
def test_interpret_parity(seed, L, W):
    rng = np.random.default_rng(seed)
    B = 128
    q = rng.integers(0, 5, (B, L)).astype(np.int8)
    w = rng.integers(0, 5, (B, W)).astype(np.int8)
    for b in range(0, B, 3):  # plant homology in a third of rows
        n = min(L, W) - 4
        w[b, 2 : 2 + n] = q[b, 1 : 1 + n]
    s_np, ie_np, je_np, _ = sw_batch(q, w, SC, want_dirs=False)
    s, ie, je = sw_score_pallas(q, w, SC, interpret=True)
    np.testing.assert_array_equal(s_np, np.asarray(s))
    np.testing.assert_array_equal(ie_np, np.asarray(ie))
    np.testing.assert_array_equal(je_np, np.asarray(je))


def test_all_n_scores_zero():
    q = np.full((128, 16), 4, np.int8)
    w = np.full((128, 24), 4, np.int8)
    s, ie, je = sw_score_pallas(q, w, SC, interpret=True)
    assert (np.asarray(s) == 0).all()
    assert (np.asarray(ie) == 0).all() and (np.asarray(je) == 0).all()


def test_multi_tile_batches():
    rng = np.random.default_rng(3)
    B, L, W = 256, 24, 32
    q = rng.integers(0, 5, (B, L)).astype(np.int8)
    w = rng.integers(0, 5, (B, W)).astype(np.int8)
    s_np, *_ = sw_batch(q, w, SC, want_dirs=False)
    s, _, _ = sw_score_pallas(q, w, SC, interpret=True)
    np.testing.assert_array_equal(s_np, np.asarray(s))


@pytest.mark.parametrize("seed,L,W", [(5, 32, 48), (6, 24, 24)])
def test_align_pallas_dirs_parity(seed, L, W):
    # the dirs-emitting kernel + packed traceback == the lax.scan second DP
    # (score/end cell AND the full traced ref_col path, gapped cases incl.)
    q, w = _gapped_cases(seed, 128, L, W)
    s0, ie0, je0, dirs0 = sw_align(q, w, SC)
    rc0 = sw_traceback(dirs0, ie0, je0, L, W)
    s1, ie1, je1, packed = sw_align_pallas(q, w, SC, interpret=True)
    rc1 = sw_traceback_packed(packed, ie1, je1, L, W)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(ie0), np.asarray(ie1))
    np.testing.assert_array_equal(np.asarray(je0), np.asarray(je1))
    np.testing.assert_array_equal(np.asarray(rc0), np.asarray(rc1))


def test_align_pallas_rows_truncation():
    rng = np.random.default_rng(7)
    B, L, W = 128, 64, 80
    q = np.full((B, L), 4, np.int8)
    lens = rng.integers(8, 41, B)
    for b in range(B):
        q[b, : lens[b]] = rng.integers(0, 4, lens[b])
    w = rng.integers(0, 5, (B, W)).astype(np.int8)
    for b in range(0, B, 2):
        n = int(lens[b]) - 4
        w[b, 3 : 3 + n] = q[b, 1 : 1 + n]
    s0, ie0, je0, dirs0 = sw_align(q, w, SC)
    rc0 = sw_traceback(dirs0, ie0, je0, L, W)
    s1, ie1, je1, packed = sw_align_pallas(q, w, SC, interpret=True, rows=48)
    rc1 = sw_traceback_packed(packed, ie1, je1, L, W)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(rc0), np.asarray(rc1))


def test_rows_truncation_exact():
    # rows=48 over 64-padded queries whose real reads are <= 40 long: the
    # truncated wavefront must equal the FULL DP (incl. tie-break positions)
    # because pad-row cells can never win (see sw_score_pallas docstring)
    rng = np.random.default_rng(4)
    B, L, W = 256, 64, 80
    q = np.full((B, L), 4, np.int8)
    lens = rng.integers(8, 41, B)
    for b in range(B):
        q[b, : lens[b]] = rng.integers(0, 4, lens[b])
    w = rng.integers(0, 5, (B, W)).astype(np.int8)
    for b in range(0, B, 2):  # plant homology (incl. gapped) in half the rows
        n = int(lens[b]) - 4
        w[b, 3 : 3 + n] = q[b, 1 : 1 + n]
        if b % 4 == 0 and n > 10:
            w[b, 3 + n // 2] = (q[b, 1 + n // 2] + 1) % 4  # mid mismatch
    s_np, ie_np, je_np, _ = sw_batch(q, w, SC, want_dirs=False)
    s, ie, je = sw_score_pallas(q, w, SC, interpret=True, rows=48)
    np.testing.assert_array_equal(s_np, np.asarray(s))
    np.testing.assert_array_equal(ie_np, np.asarray(ie))
    np.testing.assert_array_equal(je_np, np.asarray(je))
