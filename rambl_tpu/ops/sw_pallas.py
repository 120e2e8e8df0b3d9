"""Pallas TPU kernel: banded affine-gap Smith-Waterman, wavefront layout.

The hand-written replacement for BWA-MEM's C inner loop (SURVEY.md
section 2.2 item 1 / 7.4.5). Bit-identical outputs to ops.sw.sw_score
(same recurrence, masks and tie-break ordering), tested in
tests/test_sw_pallas.py.

Layout (the speed-of-light plan from SURVEY.md section 7.4.5):
- 128 independent alignments per grid step ride the LANE axis;
- query position i (1..L) rides the SUBLANE axis;
- the DP advances over anti-diagonals d = i + j: cells on one anti-diagonal
  have no mutual dependencies, so each step is ~a dozen (L, 128) VPU ops;
- ALL DP state is int16 (scores are bounded by L * match << 32767), which
  doubles VPU element throughput vs int32;
- state (H at d-1/d-2, E, F, reversed-window register, per-row best) lives
  entirely in VMEM scratch; HBM traffic is one query tile and one window tile
  in, one (8, 128) result tile out.

The window register trick: rrev[si] must hold w[d - si - 2] at step d;
shifting rrev down one sublane per step and inserting row w[d-2] at the top
(pltpu.roll + dynamic row read) keeps the per-step window access to one
contiguous row instead of a diagonal gather.

Best-cell tie-break (max H, then smallest i, then smallest j) without 32-bit
packed keys: per row si, j increases monotonically with d, so a STRICT
greater-than running max keeps the smallest j for that row's max H (store the
anti-diagonal d alongside); the final cross-row reduction takes the smallest
si among rows attaining the global max. Ordering is identical to the oracle's
packed-key rule.

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
_NEG16 = -8192  # int16 "minus infinity": drift-bounded (max L+W extend steps)


def _score_kernel(qT_ref, wT_ref, out_ref, H1, H2, E1, F1, rrev, bh, bd,
                  *, sc: ScoringParams, L: int, W: int):
    i16 = jnp.int16
    NEG = jnp.int16(_NEG16)
    go_ge = jnp.int16(sc.gap_open + sc.gap_extend)
    ge = jnp.int16(sc.gap_extend)
    match = jnp.int16(sc.match)
    mismatch = jnp.int16(sc.mismatch)

    H1[:] = jnp.zeros((L, TILE), i16)
    H2[:] = jnp.zeros((L, TILE), i16)
    E1[:] = jnp.full((L, TILE), NEG, i16)
    F1[:] = jnp.full((L, TILE), NEG, i16)
    rrev[:] = jnp.full((L, TILE), 4, i16)
    bh[:] = jnp.zeros((L, TILE), i16)     # best H per (row, lane); 0 = none
    bd[:] = jnp.zeros((L, TILE), i16)     # anti-diagonal d of that best

    q = qT_ref[:].astype(i16)                          # (L, TILE)
    si = jax.lax.broadcasted_iota(jnp.int16, (L, TILE), 0)

    def step(d, _):
        d16 = d.astype(i16)
        # window register: shift down, insert w[d-2] at the top
        r = pltpu.roll(rrev[:], 1, axis=0)
        rrev[:] = r
        rrev[pl.ds(0, 1), :] = wT_ref[pl.ds(d - 2, 1), :].astype(i16)
        r = rrev[:]

        sub = jnp.where((q == r) & (q < 4) & (r < 4), match, mismatch)

        h1 = H1[:]
        h2 = H2[:]
        f1 = F1[:]
        e1 = E1[:]

        # shift-down predecessors with border rows
        hdiag = pltpu.roll(h2, 1, axis=0)
        hup = pltpu.roll(h1, 1, axis=0)
        fup = pltpu.roll(f1, 1, axis=0)
        row0 = si == 0
        zero16 = jnp.int16(0)
        hdiag = jnp.where(row0, zero16, hdiag)
        hup = jnp.where(row0, zero16, hup)
        fup = jnp.where(row0, NEG, fup)

        enew = jnp.maximum(h1 - go_ge, e1 - ge)
        fnew = jnp.maximum(hup - go_ge, fup - ge)
        diag = hdiag + sub
        hnew = jnp.maximum(jnp.maximum(diag, zero16), jnp.maximum(enew, fnew))

        valid = (si <= d16 - 2) & (si >= d16 - 1 - jnp.int16(W))
        hnew = jnp.where(valid, hnew, zero16)
        enew = jnp.where(valid, enew, NEG)
        fnew = jnp.where(valid, fnew, NEG)

        # per-row strict running max: keeps the smallest j (= earliest d)
        better = hnew > bh[:]
        bh[:] = jnp.where(better, hnew, bh[:])
        bd[:] = jnp.where(better, d16, bd[:])

        H2[:] = h1
        H1[:] = hnew
        E1[:] = enew
        F1[:] = fnew
        return 0

    jax.lax.fori_loop(2, L + W + 1, step, 0, unroll=2)

    # cross-row reduction: global max H, tie -> smallest row (si)
    bhv = bh[:].astype(jnp.int32)
    bdv = bd[:].astype(jnp.int32)
    si32 = jax.lax.broadcasted_iota(jnp.int32, (L, TILE), 0)
    m = jnp.max(bhv, axis=0, keepdims=True)                    # (1, TILE)
    is_best = bhv == m
    i_end = jnp.min(jnp.where(is_best, si32 + 1, L + 1), axis=0,
                    keepdims=True)                             # 1-based i
    d_at = jnp.sum(jnp.where(is_best & (si32 + 1 == i_end), bdv, 0),
                   axis=0, keepdims=True)
    j_end = d_at - i_end
    none = m[0:1] <= 0
    score = jnp.where(none, 0, m)
    i_out = jnp.where(none, 0, i_end)
    j_out = jnp.where(none, 0, j_end)
    zeros = jnp.zeros((1, TILE), jnp.int32)
    out_ref[:] = jnp.concatenate(
        [score, i_out, j_out, zeros, zeros, zeros, zeros, zeros], axis=0
    )[None]


def sw_score_pallas(q: jax.Array, w: jax.Array, sc: ScoringParams,
                    interpret: bool = False):
    """Drop-in for ops.sw.sw_score. q: (B, L) int8, w: (B, W) int8.

    B must be a multiple of 128 (pad with all-N rows; they score 0).
    Returns (score, i_end, j_end) (B,) int32 (1-based end cell).
    """
    B, L = q.shape
    W = w.shape[1]
    assert B % TILE == 0, "batch must be a multiple of 128"
    assert L * sc.match < 8192, "scores must fit the int16 headroom"
    nb = B // TILE

    # lanes = batch: transpose to (L, B) / (L + W + 1, B); pad rows = code 4
    qT = q.astype(jnp.int8).T
    wT = jnp.concatenate(
        [w, jnp.full((B, L + 1), 4, jnp.int8)], axis=1
    ).T                                                   # (W + L + 1, B)

    kern = functools.partial(_score_kernel, sc=sc, L=L, W=W)
    out = pl.pallas_call(
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
        scratch_shapes=[pltpu.VMEM((L, TILE), jnp.int16)] * 7,
        cost_estimate=pl.CostEstimate(
            flops=12 * (L + W) * L * TILE * nb,
            bytes_accessed=(L + W + L) * TILE * 4 * nb,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qT, wT)

    score = out[:, 0, :].reshape(B)
    i_end = out[:, 1, :].reshape(B)
    j_end = out[:, 2, :].reshape(B)
    return score, i_end, j_end
