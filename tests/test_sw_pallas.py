"""Pallas wavefront SW kernel == oracle, in interpreter mode (CPU tier).

Compiled-mode parity runs on the real chip via scripts/profile_align.py and
the bench; this is the CI "sanitizer" tier (SURVEY.md section 5 race
detection: interpret mode surfaces OOB/semaphore misuse).
"""

import numpy as np
import pytest

from rambl_tpu.config import ScoringParams
from rambl_tpu.oracle.sw import sw_batch
from rambl_tpu.ops.sw_pallas import sw_score_pallas

SC = ScoringParams()


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
