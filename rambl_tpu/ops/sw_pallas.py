"""Pallas TPU kernel: banded affine-gap Smith-Waterman, wavefront layout.

The hand-written replacement for BWA-MEM's C inner loop (SURVEY.md
section 2.2 item 1 / 7.4.5). Bit-identical outputs to ops.sw.sw_score
(same recurrence, masks and tie-break key), tested in tests/test_sw_pallas.py.

Layout (the speed-of-light plan from SURVEY.md section 7.4.5):
- 128 independent alignments per grid step ride the LANE axis;
- query position i (1..L) rides the SUBLANE axis;
- the DP advances over anti-diagonals d = i + j: cells on one anti-diagonal
  have no mutual dependencies, so each step is ~a dozen (L, 128) VPU ops;
- state (H at d-1/d-2, E, F, reversed-window register, running best key)
  lives entirely in VMEM scratch; HBM traffic is one (L, 128) query tile and
  one (L+W, 128) window tile in, one (8, 128) best-key tile out.

The window register trick: rrev[si] must hold w[d - si - 2] at step d;
shifting rrev down one sublane per step and inserting row w[d-2] at the top
(pltpu.roll + dynamic row read) keeps the per-step window access to a single
contiguous row instead of a diagonal gather.

Borders come out of masking for free: invalid slots are forced to
(H=0, E=NEG, F=NEG) each step, which is exactly the DP border condition the
next anti-diagonal needs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rambl_tpu.config import ScoringParams

TILE = 128
_TIE = 32768
_NONE = -(1 << 30)


def _score_kernel(qT_ref, wT_ref, out_ref, H1, H2, E1, F1, rrev, best,
                  *, sc: ScoringParams, L: int, W: int):
    NEG = sc.neg_inf
    go_ge = sc.gap_open + sc.gap_extend
    ge = sc.gap_extend

    H1[:] = jnp.zeros((L, TILE), jnp.int32)
    H2[:] = jnp.zeros((L, TILE), jnp.int32)
    E1[:] = jnp.full((L, TILE), NEG, jnp.int32)
    F1[:] = jnp.full((L, TILE), NEG, jnp.int32)
    rrev[:] = jnp.full((L, TILE), 4, jnp.int32)
    best[:] = jnp.full((L, TILE), _NONE, jnp.int32)

    q = qT_ref[:]                                     # (L, TILE)
    si = jax.lax.broadcasted_iota(jnp.int32, (L, TILE), 0)

    def step(d, _):
        # window register: shift down, insert w[d-2] at the top
        r = pltpu.roll(rrev[:], 1, axis=0)
        rrev[:] = r
        rrev[pl.ds(0, 1), :] = wT_ref[pl.ds(d - 2, 1), :]
        r = rrev[:]

        sub = jnp.where((q == r) & (q < 4) & (r < 4),
                        jnp.int32(sc.match), jnp.int32(sc.mismatch))

        h1 = H1[:]
        h2 = H2[:]
        f1 = F1[:]
        e1 = E1[:]

        # shift-down predecessors with border rows
        hdiag = pltpu.roll(h2, 1, axis=0)
        hup = pltpu.roll(h1, 1, axis=0)
        fup = pltpu.roll(f1, 1, axis=0)
        row0 = si == 0
        hdiag = jnp.where(row0, 0, hdiag)
        hup = jnp.where(row0, 0, hup)
        fup = jnp.where(row0, NEG, fup)

        enew = jnp.maximum(h1 - go_ge, e1 - ge)
        fnew = jnp.maximum(hup - go_ge, fup - ge)
        diag = hdiag + sub
        hnew = jnp.maximum(
            jnp.maximum(diag, 0), jnp.maximum(enew, fnew)
        )

        valid = (si <= d - 2) & (si >= d - 1 - W)
        hnew = jnp.where(valid, hnew, 0)
        enew = jnp.where(valid, enew, NEG)
        fnew = jnp.where(valid, fnew, NEG)

        # best-cell key: H * 32768 - (i * (W + 1) + j), j = d - i, i = si + 1
        key = hnew * _TIE - ((si + 1) * (W + 1) + (d - si - 1))
        key = jnp.where(valid & (hnew > 0), key, _NONE)
        best[:] = jnp.maximum(best[:], key)

        H2[:] = h1
        H1[:] = hnew
        E1[:] = enew
        F1[:] = fnew
        return 0

    jax.lax.fori_loop(2, L + W + 1, step, 0)
    # (8, TILE) out tile (Mosaic needs sublane >= 8); row 0 carries the result
    m = jnp.max(best[:], axis=0, keepdims=True)
    out_ref[:] = jnp.broadcast_to(m, (1, 8, TILE))


def sw_score_pallas(q: jax.Array, w: jax.Array, sc: ScoringParams,
                    interpret: bool = False):
    """Drop-in for ops.sw.sw_score. q: (B, L) int8, w: (B, W) int8.

    B must be a multiple of 128 (pad with all-N rows; they score 0).
    Returns (score, i_end, j_end) (B,) int32.
    """
    B, L = q.shape
    W = w.shape[1]
    assert B % TILE == 0, "batch must be a multiple of 128"
    nb = B // TILE

    # lanes = batch: transpose to (L, B) / (L + W, B); pad rows with code 4
    qT = q.astype(jnp.int32).T
    wT = jnp.concatenate(
        [w.astype(jnp.int32), jnp.full((B, L + 1), 4, jnp.int32)], axis=1
    ).T                                                   # (W + L + 1, B)

    kern = functools.partial(_score_kernel, sc=sc, L=L, W=W)
    best = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((L, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((W + L + 1, TILE), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, TILE), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 8, TILE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((L, TILE), jnp.int32)] * 6,
        cost_estimate=pl.CostEstimate(
            flops=12 * (L + W) * L * TILE * nb,
            bytes_accessed=(L + W + L) * TILE * 4 * nb,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qT, wT)

    best = best[:, 0, :].reshape(B)
    none = best == _NONE
    score = -(-best // _TIE)
    r = score * _TIE - best
    i_end = r // (W + 1)
    j_end = r % (W + 1)
    score = jnp.where(none, 0, score).astype(jnp.int32)
    i_end = jnp.where(none, 0, i_end).astype(jnp.int32)
    j_end = jnp.where(none, 0, j_end).astype(jnp.int32)
    return score, i_end, j_end
