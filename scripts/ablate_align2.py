"""Pipelined ablation of align_batch stages at production config (sw_rows=104)
— TIMING ONLY, some variants are not output-correct.

Unlike scripts/ablate_align.py (single dispatch, carries the ~26 ms tunnel
floor per call), every variant here is timed the way the production stream
runs: N async dispatches, one fetch at the end (CLAUDE.md timing notes).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ablate_align2.py [B]
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
    SeedTable, gather_windows_jax, revcomp_jax, seed_candidates_jax)
from rambl_tpu.ops.sw_pallas import sw_score_pallas
from rambl_tpu.utils.cache import enable_compile_cache


def timed(name, f, args0, args1, reps=8):
    out = f(*args0)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:4].sum()
    t0 = time.time()
    outs = [f(*(args0 if i % 2 == 0 else args1)) for i in range(reps)]
    for o in outs:
        np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[:4].sum()
    dt = (time.time() - t0) / reps
    print(f"{name}: {dt * 1e3:8.1f} ms/batch pipelined", flush=True)
    return dt


def main():
    enable_compile_cache()
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    cfg = PipelineConfig(batch_size=B, sw_rows=104)
    ds = toy_dataset(n_reads=2 * B)
    index = build_seed_index(ds.ref_seqs, ds.ref_lens, k=cfg.k)
    table = SeedTable.from_index(index)
    refs = jnp.asarray(ds.ref_seqs)
    a0 = (jnp.asarray(ds.reads[:B]), jnp.asarray(ds.read_lens[:B]))
    a1 = (jnp.asarray(ds.reads[B:]), jnp.asarray(ds.read_lens[B:]))
    C = cfg.max_candidates
    L = cfg.read_len_max
    W = cfg.window_len
    sc = cfg.scoring

    def seed2(reads, lens):
        rc = revcomp_jax(reads, lens)
        cf = seed_candidates_jax(reads, lens, table, cfg)
        cr = seed_candidates_jax(rc, lens, table, cfg)
        return cf["cand_ref"], cr["cand_ref"]

    timed("A 2x seed            ", jax.jit(seed2), a0, a1)

    def seed_fused(reads, lens):
        # ONE probe over the concatenated fwd+rc block (timing probe for the
        # fused-strand variant)
        rc = revcomp_jax(reads, lens)
        both = jnp.concatenate([reads, rc])
        c = seed_candidates_jax(both, jnp.concatenate([lens, lens]), table,
                                cfg)
        return c["cand_ref"]

    timed("A' fused-strand seed ", jax.jit(seed_fused), a0, a1)

    def upto_windows(reads, lens):
        rc = revcomp_jax(reads, lens)
        cf = seed_candidates_jax(reads, lens, table, cfg)
        cr = seed_candidates_jax(rc, lens, table, cfg)
        cref = jnp.concatenate([cf["cand_ref"], cr["cand_ref"]], axis=1)
        cws = jnp.concatenate([cf["cand_wstart"], cr["cand_wstart"]], axis=1)
        return gather_windows_jax(refs, cref, cws, W, cfg)

    timed("B + windows gather   ", jax.jit(upto_windows), a0, a1)

    def upto_score(reads, lens):
        rc = revcomp_jax(reads, lens)
        cf = seed_candidates_jax(reads, lens, table, cfg)
        cr = seed_candidates_jax(rc, lens, table, cfg)
        cref = jnp.concatenate([cf["cand_ref"], cr["cand_ref"]], axis=1)
        cws = jnp.concatenate([cf["cand_wstart"], cr["cand_wstart"]], axis=1)
        wins = gather_windows_jax(refs, cref, cws, W, cfg)
        q_pairs = jnp.concatenate(
            [jnp.broadcast_to(reads[:, None, :], (B, C, L)),
             jnp.broadcast_to(rc[:, None, :], (B, C, L))], axis=1)
        s, ie, je = sw_score_pallas(
            q_pairs.reshape(B * 2 * C, L), wins.reshape(B * 2 * C, W), sc,
            rows=cfg.sw_rows)
        return s

    timed("C + pallas score     ", jax.jit(upto_score), a0, a1)

    from rambl_tpu.pipeline.align import align_batch

    full = jax.jit(functools.partial(align_batch, table=table,
                                     ref_seqs=refs, cfg=cfg))
    timed("E full align_batch   ", full, a0, a1)

    # F: full minus the traceback cond (analytic columns only; wrong for
    # gapped reads - TIMING ONLY)
    import dataclasses

    cfg_cap = dataclasses.replace(cfg)
    from rambl_tpu.pipeline import align as AL

    def full_no_tb(reads, lens):
        res = align_batch(reads, lens, table, refs, cfg_cap)
        return res.score, res.ref
    # approximate by timing align_batch already includes it; instead time
    # the bin step the production stream actually runs:
    from rambl_tpu.pipeline.binning import bin_batch
    from rambl_tpu.index.taxonomy import build_taxonomy_tables

    tax = build_taxonomy_tables(ds.tax_parent, ds.tax_depth, ds.ref_taxon)
    rt = jnp.asarray(tax.ref_taxon)
    anc = jnp.asarray(tax.anc_path)
    dep = jnp.asarray(tax.depth)

    def with_bin(reads, lens):
        res = align_batch(reads, lens, table, refs, cfg)
        return bin_batch(res, rt, anc, dep, cfg)

    timed("G align + bin        ", jax.jit(with_bin), a0, a1)


if __name__ == "__main__":
    main()
