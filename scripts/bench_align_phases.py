"""Cumulative-prefix timing of align_batch internals (scalar-reduced fetches).

Each prefix is its own jit; successive differences give true device cost per
phase (every measurement carries the same ~25-30ms tunnel dispatch floor).
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from rambl_tpu.config import PipelineConfig
from rambl_tpu.data.simulate import toy_dataset
from rambl_tpu.index.builder import build_seed_index
from rambl_tpu.ops.seed import (
    SeedTable,
    gather_windows_jax,
    revcomp_jax,
    seed_candidates_jax,
)
from rambl_tpu.ops.sw import sw_align, sw_traceback
from rambl_tpu.ops.sw_pallas import sw_score_pallas
from rambl_tpu.pipeline.align import align_batch


def t(name, f, *args, n=3):
    g = jax.jit(f)
    np.asarray(g(*args))
    t0 = time.time()
    for _ in range(n):
        np.asarray(g(*args))
    print(f"{name}: {(time.time() - t0) / n * 1e3:8.1f} ms", flush=True)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    cfg = PipelineConfig()
    ds = toy_dataset(n_reads=B)
    index = build_seed_index(ds.ref_seqs, ds.ref_lens, k=cfg.k)
    table = SeedTable.from_index(index)
    refs = jnp.asarray(ds.ref_seqs)
    r = jnp.asarray(ds.reads[:B])
    l = jnp.asarray(ds.read_lens[:B])
    W = cfg.window_len
    C = cfg.max_candidates
    sc = cfg.scoring
    print(f"B={B}", flush=True)

    def pre(reads, lens):
        rc_reads = revcomp_jax(reads, lens)
        cands_f = seed_candidates_jax(reads, lens, table, cfg)
        cands_r = seed_candidates_jax(rc_reads, lens, table, cfg)
        cref = jnp.concatenate([cands_f["cand_ref"], cands_r["cand_ref"]], axis=1)
        cws = jnp.concatenate([cands_f["cand_wstart"], cands_r["cand_wstart"]], axis=1)
        cval = jnp.concatenate([cands_f["cand_valid"], cands_r["cand_valid"]], axis=1)
        return rc_reads, cref, cws, cval

    def gath(reads, lens):
        rc_reads, cref, cws, cval = pre(reads, lens)
        wins = gather_windows_jax(refs, cref, cws, W)
        q_pairs = jnp.concatenate(
            [jnp.broadcast_to(reads[:, None, :], (B, C, reads.shape[1])),
             jnp.broadcast_to(rc_reads[:, None, :], (B, C, reads.shape[1]))],
            axis=1)
        return wins, q_pairs, cref, cws, cval, rc_reads

    def scor(reads, lens):
        wins, q_pairs, cref, cws, cval, rc = gath(reads, lens)
        L = reads.shape[1]
        score, p_ie, p_je = sw_score_pallas(
            q_pairs.reshape(B * 2 * C, L), wins.reshape(B * 2 * C, W), sc)
        return score, p_ie, p_je

    def s(x):
        return sum(jnp.sum(v.astype(jnp.int32)) if v.dtype == bool
                   else jnp.sum(v) for v in jax.tree_util.tree_leaves(x))

    t("seed+rc+concat   ", lambda a, b: s(pre(a, b)), r, l)
    t("+windows+qpairs  ", lambda a, b: s(gath(a, b)[:2]), r, l)
    t("+pallas score    ", lambda a, b: s(scor(a, b)), r, l)
    t("align_batch full ", lambda a, b: s(align_batch(a, b, table, refs, cfg)), r, l)

    # compact traceback cost in isolation (cap-sized)
    cap = max(128, B // 8)
    rng = np.random.default_rng(0)
    qs = jnp.asarray(rng.integers(0, 4, (cap, cfg.read_len_max)).astype(np.int8))
    ws = jnp.asarray(rng.integers(0, 4, (cap, W)).astype(np.int8))

    def tb(qq, ww):
        _, ie, je, dirs = sw_align(qq, ww, sc)
        return s(sw_traceback(dirs, ie, je, cfg.read_len_max, W))
    t(f"sw_align+tb cap={cap}", tb, qs, ws)


if __name__ == "__main__":
    main()
