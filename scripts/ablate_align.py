"""Ablation timing of align_batch stages (TIMING ONLY - some variants are
not output-correct). One large dispatch per variant, forced fetch."""

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
    SeedTable, gather_windows_jax, revcomp_jax, seed_candidates_jax)
from rambl_tpu.ops.sw_pallas import sw_score_pallas


def timed(name, f, *args):
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:4].sum()
    t0 = time.time()
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:4].sum()
    print(f"{name}: {(time.time() - t0) * 1e3:8.1f} ms", flush=True)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    cfg = PipelineConfig()
    ds = toy_dataset(n_reads=B)
    index = build_seed_index(ds.ref_seqs, ds.ref_lens, k=cfg.k)
    table = SeedTable.from_index(index)
    refs = jnp.asarray(ds.ref_seqs)
    r = jnp.asarray(ds.reads[:B])
    l = jnp.asarray(ds.read_lens[:B])
    C = cfg.max_candidates
    L = cfg.read_len_max
    W = cfg.window_len
    sc = cfg.scoring

    def upto_candidates(reads, lens):
        rc = revcomp_jax(reads, lens)
        cf = seed_candidates_jax(reads, lens, table, cfg)
        cr = seed_candidates_jax(rc, lens, table, cfg)
        return cf["cand_ref"], cr["cand_ref"]

    timed("A candidates (2x seed)", jax.jit(upto_candidates), r, l)

    def upto_windows(reads, lens):
        rc = revcomp_jax(reads, lens)
        cf = seed_candidates_jax(reads, lens, table, cfg)
        cr = seed_candidates_jax(rc, lens, table, cfg)
        cref = jnp.concatenate([cf["cand_ref"], cr["cand_ref"]], axis=1)
        cws = jnp.concatenate([cf["cand_wstart"], cr["cand_wstart"]], axis=1)
        return gather_windows_jax(refs, cref, cws, W)

    timed("B + windows gather", jax.jit(upto_windows), r, l)

    def upto_score(reads, lens):
        rc = revcomp_jax(reads, lens)
        cf = seed_candidates_jax(reads, lens, table, cfg)
        cr = seed_candidates_jax(rc, lens, table, cfg)
        cref = jnp.concatenate([cf["cand_ref"], cr["cand_ref"]], axis=1)
        cws = jnp.concatenate([cf["cand_wstart"], cr["cand_wstart"]], axis=1)
        wins = gather_windows_jax(refs, cref, cws, W)
        q_pairs = jnp.concatenate(
            [jnp.broadcast_to(reads[:, None, :], (B, C, L)),
             jnp.broadcast_to(rc[:, None, :], (B, C, L))], axis=1)
        s, ie, je = sw_score_pallas(
            q_pairs.reshape(B * 2 * C, L), wins.reshape(B * 2 * C, W), sc)
        return s

    timed("C + pallas score 8xB pairs", jax.jit(upto_score), r, l)

    from rambl_tpu.pipeline.align import align_batch

    timed("D full align_batch", jax.jit(
        functools.partial(align_batch, table=table, ref_seqs=refs, cfg=cfg)), r, l)


if __name__ == "__main__":
    main()
