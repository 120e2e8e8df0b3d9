"""Jitted taxonomic binning: LCA segment-reduce (SURVEY.md section 2.2).

Bit-identical to oracle.binning.bin_reads / index.taxonomy.lca_of_set:
candidate taxa are gathered through dense ancestor-path tables and the LCA is
the deepest depth at which all valid candidates' paths agree - a pure vector
reduction over the (B, 2C, MAX_DEPTH) gather, no tree walking.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rambl_tpu.config import PipelineConfig
from rambl_tpu.index.taxonomy import MAX_DEPTH
from rambl_tpu.pipeline.align import AlignRecords


def lca_of_set_jax(anc_path, depth, nodes, valid):
    """Vectorized LCA. anc_path (N, D) int32, depth (N,) int32;
    nodes (..., C) int32, valid (..., C) bool -> (...,) int32."""
    paths = anc_path[nodes]                                  # (..., C, D)
    depths = depth[nodes]                                    # (..., C)
    any_valid = valid.any(axis=-1)
    first_idx = jnp.argmax(valid, axis=-1)
    first_path = jnp.take_along_axis(
        paths, first_idx[..., None, None].repeat(MAX_DEPTH, -1), axis=-2
    ).squeeze(-2)                                            # (..., D)
    eff_paths = jnp.where(valid[..., None], paths, first_path[..., None, :])
    agree = (eff_paths == first_path[..., None, :]).all(axis=-2)
    min_depth = jnp.where(valid, depths, 1 << 30).min(axis=-1)
    min_depth = jnp.minimum(min_depth, MAX_DEPTH - 1)
    dd = jnp.arange(MAX_DEPTH, dtype=jnp.int32)
    prefix_agree = jnp.cumprod(agree.astype(jnp.int32), axis=-1) > 0
    ok = prefix_agree & (dd <= min_depth[..., None])
    best_d = jnp.where(ok, dd, -1).max(axis=-1)
    best_d = jnp.maximum(best_d, 0)
    lca = jnp.take_along_axis(first_path, best_d[..., None], axis=-1).squeeze(-1)
    return jnp.where(any_valid, lca, 0).astype(jnp.int32)


def bin_batch(
    res: AlignRecords,
    ref_taxon: jax.Array,
    anc_path: jax.Array,
    depth: jax.Array,
    cfg: PipelineConfig,
) -> jax.Array:
    """(B,) int32 bin node per read (-1 = unaligned)."""
    best = res.score[:, None]
    tied = (
        res.pair_valid
        & (res.pair_score >= cfg.min_score)
        & (res.pair_score >= best - cfg.bin_score_delta)
    )
    taxa = ref_taxon[jnp.clip(res.pair_ref, 0, ref_taxon.shape[0] - 1)]
    lca = lca_of_set_jax(anc_path, depth, taxa, tied)
    return jnp.where(res.aligned, lca, -1).astype(jnp.int32)
