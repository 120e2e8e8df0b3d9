"""Jitted consensus calling: (cluster, column, base) count tensors -> calls.

Replaces samtools-pileup + per-column Python (SURVEY.md L7) and matches
oracle.consensus / oracle.pipeline's variant-aware merging exactly:

- counts_eff[col] = cluster counts at trusted polymorphic columns (depth >=
  min_coverage AND unique argmax), bin-wide counts elsewhere; span (deletion)
  evidence always comes from the same population that voted the bases;
- a column is emitted iff it has base coverage, deletions do not outnumber
  bases, and it lies within [first, last] covered column;
- the called base is argmax (ties -> lowest code).

Sequences stay as fixed-width (called, emit) tensors on device; the host
compacts them to ragged gene sequences (panel management is host logic).

"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rambl_tpu.config import PipelineConfig
from rambl_tpu.pipeline.pileup import leaf_pileup, polymorphic_mask


class ConsensusOut(NamedTuple):
    called: jax.Array   # (..., ref_len) int8 argmax base
    emit: jax.Array     # (..., ref_len) bool
    n_reads: jax.Array  # (...,) int32 population size behind each call


def call_consensus_jax(counts_eff: jax.Array, span_eff: jax.Array):
    """(..., ref_len, 4) counts + (..., ref_len) span -> (called, emit)."""
    ref_len = counts_eff.shape[-2]
    base_cover = counts_eff.sum(axis=-1)
    covered = base_cover > 0
    any_cov = covered.any(axis=-1)
    lo = jnp.argmax(covered, axis=-1)
    hi = ref_len - 1 - jnp.argmax(covered[..., ::-1], axis=-1)
    dele = span_eff - base_cover
    cols = jnp.arange(ref_len, dtype=jnp.int32)
    emit = (
        covered
        & (dele <= base_cover)
        & (cols >= lo[..., None])
        & (cols <= hi[..., None])
        & any_cov[..., None]
    )
    called = jnp.argmax(counts_eff, axis=-1).astype(jnp.int8)
    return called, emit


def _unique_top(counts: jax.Array):
    """(..., 4) -> bool: strictly unique argmax."""
    srt = jnp.sort(counts, axis=-1)
    return srt[..., -1] > srt[..., -2]


def _use_cluster(poly_mask, counts_k, counts_all, cfg: PipelineConfig):
    """Columns where the cluster/exclusive population may override the
    backbone: polymorphic, minimum depth, unique winner, and at least
    vote_min_frac of the backbone's depth (oracle.pipeline rules)."""
    dk = counts_k.sum(axis=-1)
    dall = counts_all.sum(axis=-1)
    top = jnp.max(counts_k, axis=-1)
    strong = (
        (dk * cfg.vote_min_frac_den >= cfg.vote_min_frac_num * dall)
        | (top >= cfg.vote_min_abs)
    )
    return (
        poly_mask
        & (dk >= cfg.min_coverage)
        & strong
        & _unique_top(counts_k)
    )


def _leaf_cluster_consensus(cfg: PipelineConfig, K: int, ref_len: int, args):
    """Per-leaf cluster pileup + variant-aware consensus (round 0)."""
    q, rc, valid, assign, poly_mask, counts_all, span_all = args
    M, L = q.shape

    ok = (rc >= 0) & (q < 4) & valid[:, None]
    a = jnp.clip(assign, 0, K - 1)
    col = jnp.clip(rc, 0, ref_len - 1)
    base = jnp.clip(q, 0, 3).astype(jnp.int32)
    flat = (a[:, None] * ref_len + col) * 4 + base
    flat = jnp.where(ok, flat, K * ref_len * 4)
    cnt = jnp.zeros((K * ref_len * 4 + 1,), jnp.int32).at[flat.reshape(-1)].add(1)
    counts_k = cnt[:-1].reshape(K, ref_len, 4)

    has = ok.any(axis=1)
    lo_r = jnp.where(ok, rc, 1 << 30).min(axis=1)
    hi_r = jnp.where(ok, rc, -1).max(axis=1)
    lo_flat = a * (ref_len + 1) + jnp.clip(lo_r, 0, ref_len)
    hi_flat = a * (ref_len + 1) + jnp.clip(hi_r + 1, 0, ref_len)
    sentinel = K * (ref_len + 1)
    lo_flat = jnp.where(has, lo_flat, sentinel)
    hi_flat = jnp.where(has, hi_flat, sentinel)
    sp = jnp.zeros((K * (ref_len + 1) + 1,), jnp.int32)
    sp = sp.at[lo_flat].add(1).at[hi_flat].add(-1)
    span_k = jnp.cumsum(sp[:-1].reshape(K, ref_len + 1)[:, :-1], axis=1)

    use_k = _use_cluster(poly_mask[None, :], counts_k, counts_all[None], cfg)
    counts_eff = jnp.where(use_k[..., None], counts_k, counts_all[None])
    span_eff = jnp.where(use_k, span_k, span_all[None])
    called, emit = call_consensus_jax(counts_eff, span_eff)

    nk = jnp.sum(
        (assign[None, :] == jnp.arange(K, dtype=jnp.int32)[:, None]) & valid[None, :],
        axis=1,
    ).astype(jnp.int32)
    return called, emit, nk


def cluster_consensus_leaves(
    q_members: jax.Array,      # (NL, M, L) int8
    rc_members: jax.Array,     # (NL, M, L) int32
    member_valid: jax.Array,   # (NL, M)
    assign: jax.Array,         # (NL, M) int32
    poly_mask: jax.Array,      # (NL, ref_len) bool
    leaf_counts: jax.Array,    # (NL, ref_len, 4)
    leaf_span: jax.Array,      # (NL, ref_len)
    cfg: PipelineConfig,
) -> ConsensusOut:
    ref_len = leaf_counts.shape[1]
    K = cfg.max_clusters_per_bin
    f = functools.partial(_leaf_cluster_consensus, cfg, K, ref_len)
    called, emit, nk = jax.lax.map(
        f, (q_members, rc_members, member_valid, assign, poly_mask,
            leaf_counts, leaf_span),
    )
    return ConsensusOut(called=called, emit=emit, n_reads=nk)


class MinorHap(NamedTuple):
    """Per-leaf minor-haplotype consensus (frequency phasing; see
    oracle.pipeline's minor-haplotype rule and config.minorhap_*)."""

    called: jax.Array   # (NL, ref_len) int8
    emit: jax.Array     # (NL, ref_len) bool
    n_reads: jax.Array  # (NL,) int32 min qualifying minor depth
    n_cols: jax.Array   # (NL,) int32 qualifying columns


def minor_haplotype_leaves(
    excl_counts: jax.Array,   # (NL, ref_len, 4) leaf-EXCLUSIVE pileup
    leaf_counts: jax.Array,   # (NL, ref_len, 4) chain-merged backbone
    leaf_span: jax.Array,     # (NL, ref_len)
    cfg: PipelineConfig,
) -> MinorHap:
    """Device twin of the oracle's minor-haplotype gene: substitute the
    leaf-exclusive second allele at every qualifying column of the backbone
    consensus. All thresholds integer-exact."""
    tot_ex = excl_counts.sum(axis=-1)
    srt = jnp.sort(excl_counts, axis=-1)
    mm = srt[..., -2]
    qual = (
        (tot_ex >= cfg.min_coverage)
        & (mm >= cfg.minorhap_min_abs)
        & (mm * cfg.minorhap_max_den <= cfg.minorhap_max_num * tot_ex)
        & (mm * cfg.minorhap_frac_den >= cfg.minorhap_frac_num * tot_ex)
        & (srt[..., -2] > srt[..., -3])
    )
    b1 = jnp.argmax(excl_counts, axis=-1)
    lanes = jnp.arange(4, dtype=jnp.int32)
    c2 = jnp.where(lanes == b1[..., None], -1, excl_counts)
    b2 = jnp.argmax(c2, axis=-1)                       # unique where qual
    tot_all = leaf_counts.sum(axis=-1)
    counts_mh = jnp.where(
        qual[..., None],
        jnp.where(lanes == b2[..., None], tot_all[..., None], 0),
        leaf_counts,
    )
    called, emit = call_consensus_jax(counts_mh, leaf_span)
    n_cols = qual.sum(axis=-1).astype(jnp.int32)
    n_reads = jnp.where(qual, mm, 1 << 30).min(axis=-1).astype(jnp.int32)
    return MinorHap(called=called, emit=emit, n_reads=n_reads, n_cols=n_cols)


def _chain_read_count(read_count, nodes, anc_path, depth,
                      share_depth=None):
    """Reads binned on each node's ancestor chain within share_depth ranks
    (leaf membership count without materializing per-read masks)."""
    from rambl_tpu.index.taxonomy import MAX_DEPTH
    from rambl_tpu.pipeline.pileup import chain_use_mask

    paths = anc_path[nodes]
    use = chain_use_mask(
        nodes, depth, MAX_DEPTH if share_depth is None else share_depth)
    return jnp.sum(read_count[paths] * use, axis=1).astype(jnp.int32)
