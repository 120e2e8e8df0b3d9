"""SW wavefront kernel variant shootout (round-3 GCUPS push, VERDICT #2).

Variants are generated from one parameterized kernel builder:
  preshift   - store the diag predecessor H2 already shifted+bordered
               (saves one roll + one select per step)
  phases     - split the fori_loop into ramp-up / full-band / ramp-down so
               the validity mask costs nothing for the W+1-L middle steps
  rowkey     - track per-row best key as H*_TIE - d (apply the si*W+W row
               offset once at the end instead of per step)
  tile       - lanes per grid step (128 = production, 256/512 = wider ops,
               fewer grid steps)
  unroll     - fori_loop unroll factor for the middle phase

Every variant is parity-checked against the NumPy oracle before timing.
Timing = 4 pipelined dispatches of 131072 pairs + one fetch (the tunnel's
~25ms dispatch floor amortizes; CLAUDE.md timing notes).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_sw_variants.py
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rambl_tpu.config import ScoringParams
from rambl_tpu.oracle.sw import sw_batch

_TIE = 32768
_NONE = -(1 << 30)


def make_score_fn(sc: ScoringParams, L: int, W: int, *, preshift: bool,
                  phases: bool, rowkey: bool, tile: int = 128,
                  mid_unroll: bool = False):
    NEG = sc.neg_inf
    go_ge = sc.gap_open + sc.gap_extend
    ge = sc.gap_extend
    TILE = tile

    def kernel(qT_ref, wT_ref, out_ref, H1, H2, E1, F1, rrev, best):
        H1[:] = jnp.zeros((L, TILE), jnp.int32)
        H2[:] = jnp.zeros((L, TILE), jnp.int32)
        E1[:] = jnp.full((L, TILE), NEG, jnp.int32)
        F1[:] = jnp.full((L, TILE), NEG, jnp.int32)
        rrev[:] = jnp.full((L, TILE), 9, jnp.int32)
        best[:] = jnp.full((L, TILE), _NONE, jnp.int32)

        q = qT_ref[:]
        si = jax.lax.broadcasted_iota(jnp.int32, (L, TILE), 0)
        row0 = si == 0
        siw = si * W + W

        def step(d, mask_mode):
            r = pltpu.roll(rrev[:], 1, axis=0)
            rrev[:] = r
            rrev[pl.ds(0, 1), :] = wT_ref[pl.ds(d - 2, 1), :]
            r = rrev[:]
            sub = jnp.where(q == r, jnp.int32(sc.match), jnp.int32(sc.mismatch))
            h1 = H1[:]
            f1 = F1[:]
            e1 = E1[:]
            if preshift:
                hdiag = H2[:]
            else:
                hdiag = jnp.where(row0, 0, pltpu.roll(H2[:], 1, axis=0))
            hup = jnp.where(row0, 0, pltpu.roll(h1, 1, axis=0))
            fup = jnp.where(row0, NEG, pltpu.roll(f1, 1, axis=0))
            enew = jnp.maximum(h1 - go_ge, e1 - ge)
            fnew = jnp.maximum(hup - go_ge, fup - ge)
            hnew = jnp.maximum(jnp.maximum(hdiag + sub, 0),
                               jnp.maximum(enew, fnew))
            if mask_mode == 0:
                hnew = jnp.where(si <= d - 2, hnew, 0)
            elif mask_mode == 2:
                hnew = jnp.where(si >= d - 1 - W, hnew, 0)
            elif mask_mode == 3:
                hnew = jnp.where((si <= d - 2) & (si >= d - 1 - W), hnew, 0)
            if rowkey:
                best[:] = jnp.maximum(best[:], hnew * _TIE - d)
            else:
                best[:] = jnp.maximum(best[:], hnew * _TIE - (siw + d))
            H2[:] = hup if preshift else h1
            H1[:] = hnew
            E1[:] = enew
            F1[:] = fnew
            return 0

        if phases:
            assert L <= W + 1
            jax.lax.fori_loop(2, L + 1, lambda d, c: step(d, 0), 0)
            if mid_unroll:
                for d in range(L + 1, W + 2):
                    step(d, 1)
            else:
                jax.lax.fori_loop(L + 1, W + 2, lambda d, c: step(d, 1), 0)
            jax.lax.fori_loop(W + 2, L + W + 1, lambda d, c: step(d, 2), 0)
        else:
            jax.lax.fori_loop(2, L + W + 1, lambda d, c: step(d, 3), 0)

        b = best[:]
        if rowkey:
            b = b - siw
        m = jnp.max(b, axis=0, keepdims=True)
        out_ref[:] = jnp.broadcast_to(m, (1, 8, TILE))

    def score(q, w, interpret=False):
        B = q.shape[0]
        assert B % TILE == 0
        nb = B // TILE
        qT = q.astype(jnp.int32).T
        w32 = w.astype(jnp.int32)
        w32 = jnp.where(w32 < 4, w32, 9)
        wT = jnp.concatenate(
            [w32, jnp.full((B, L + 1), 9, jnp.int32)], axis=1).T
        best = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((L, TILE), lambda t: (0, t),
                             memory_space=pltpu.VMEM),
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
        score = -(-best // _TIE)
        r = score * _TIE - best
        i_end = r // (W + 1)
        j_end = r % (W + 1)
        none = score <= 0
        score = jnp.where(none, 0, score).astype(jnp.int32)
        i_end = jnp.where(none, 0, i_end).astype(jnp.int32)
        j_end = jnp.where(none, 0, j_end).astype(jnp.int32)
        return score, i_end, j_end

    return score


def fetch(out):
    return np.asarray(out[0]).ravel()[:4].sum()


def main():
    from rambl_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    sc = ScoringParams()
    L, W = 128, 161
    pairs = 131072
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(0, 5, (pairs, L)).astype("int8"))
    w = jnp.asarray(rng.integers(0, 4, (pairs, W)).astype("int8"))
    qn = np.asarray(q[:256])
    wn = np.asarray(w[:256])
    s_np, ie_np, je_np = sw_batch(qn, wn, sc, want_dirs=False)[:3]

    # production baseline
    from rambl_tpu.ops.sw_pallas import sw_score_pallas
    variants = [("prod-r02", jax.jit(functools.partial(sw_score_pallas, sc=sc)))]

    def add(name, **kw):
        variants.append((name, jax.jit(make_score_fn(sc, L, W, **kw))))

    add("preshift", preshift=True, phases=False, rowkey=False)
    add("phases", preshift=False, phases=True, rowkey=False)
    add("pre+ph", preshift=True, phases=True, rowkey=False)
    add("pre+rk", preshift=True, phases=False, rowkey=True)
    add("all3", preshift=True, phases=True, rowkey=True)
    add("all3+mu", preshift=True, phases=True, rowkey=True, mid_unroll=True)

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    results = {}
    for name, fn in variants:
        t0 = time.time()
        try:
            out = fn(q, w)
            s_tp, ie_tp, je_tp = (np.asarray(x)[:256] for x in out)
        except Exception as e:
            print(f"{name:14s} FAILED: {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            continue
        tc = time.time() - t0
        ok = (np.array_equal(s_np, s_tp) and np.array_equal(ie_np, ie_tp)
              and np.array_equal(je_np, je_tp))
        if not ok:
            print(f"{name:14s} PARITY FAIL (compile {tc:.0f}s)", flush=True)
            continue
        # pipelined timing: 8 dispatches, fetch at the end; best of 3 rounds
        best_per = 1e9
        for _ in range(3):
            t0 = time.time()
            outs = [fn(q, w) for _ in range(8)]
            for o in outs:
                fetch(o)
            best_per = min(best_per, (time.time() - t0) / 8)
        gcups = pairs * L * W / best_per / 1e9
        results[name] = gcups
        print(f"{name:14s} {best_per * 1000:7.1f} ms  {gcups:6.1f} GCUPS  "
              f"(compile {tc:.0f}s)", flush=True)

    best = max(results, key=results.get)
    print(f"winner: {best} at {results[best]:.1f} GCUPS")


if __name__ == "__main__":
    main()
