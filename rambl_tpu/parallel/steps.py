"""shard_map pipeline steps: data-parallel align+bin+pileup with psum merge.

The hot path of SURVEY.md section 3.4: reads shard over the 'data' axis, the
seed table + reference panel are replicated (cfg.shard_index=False) or ring-
sharded (parallel.ring), and the node-space pileup/count accumulators are
psum-merged across the mesh so every device (and the host) sees the global
tensors - bit-identical to the single-device path because counts are integers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from rambl_tpu.config import PipelineConfig
from rambl_tpu.ops.seed import SeedTable
from rambl_tpu.parallel.mesh import DATA_AXIS
from rambl_tpu.pipeline.align import align_batch
from rambl_tpu.pipeline.binning import bin_batch
from rambl_tpu.pipeline.pileup import node_pileup, node_slot_pileup


@functools.lru_cache(maxsize=64)
def make_align_bin_step(mesh, cfg: PipelineConfig, n_bits: int,
                        ring: bool = False):
    """Lean per-batch align+bin step for the streaming assembly driver:
    NO pileup, NO collectives - per-read outputs stay sharded over 'data'
    and the pileup merge happens ONCE per stream in make_pileup_merge_step
    (psum-per-batch of the (n_nodes, ref_len, 4) accumulator would dominate
    the step at scale; deferring it moves the collective off the hot loop).

    step(reads, lens, bucket_start, entries, ref_seqs, ref_taxon, anc_path,
         depth, col_map) -> (query, proj_ref_col, bins, score, ref, strand),
    all sharded over 'data'. Bit-identical to assemble._align_bin_batch.

    Cached per (mesh, cfg, n_bits, ring) so successive assembly rounds reuse
    one compiled executable (jit caches on function identity).
    """

    def step(reads, lens, bucket_start, entries,
             ref_seqs, ref_taxon, anc_path, depth, col_map):
        if ring:
            from rambl_tpu.parallel.ring import ring_align_batch

            res = ring_align_batch(
                reads, lens, bucket_start, entries, ref_seqs, cfg, n_bits)
        else:
            table = SeedTable(bucket_start, entries, n_bits)
            res = align_batch(reads, lens, table, ref_seqs, cfg)
        bins = bin_batch(res, ref_taxon, anc_path, depth, cfg)
        refc = jnp.clip(res.ref, 0, ref_seqs.shape[0] - 1)
        rc = res.ref_col
        proj = jnp.where(
            rc >= 0,
            col_map[refc[:, None], jnp.clip(rc, 0, ref_seqs.shape[1] - 1)],
            -1,
        ).astype(jnp.int32)
        return res.query, proj, bins, res.score, res.ref, res.strand

    data = P(DATA_AXIS)
    data2 = P(DATA_AXIS, None)
    repl = P()
    table_spec = data if ring else repl
    in_specs = (data2, data, table_spec, table_spec,
                repl, repl, repl, repl, repl)
    out_specs = (data2, data2, data, data, data, data)
    return jax.jit(jax.shard_map(
        step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False))


@functools.lru_cache(maxsize=64)
def make_pileup_merge_step(mesh, n_nodes: int, ref_len: int,
                           shard_positions: bool = False):
    """One-shot pileup over the full streamed read tensors + cross-device
    merge (BASELINE.json:5 psum before reconstruction). Integer scatter-adds
    commute, so pileup-at-the-end is bitwise equal to the single-device
    per-batch accumulation.

    step(query, proj, bins) -> (counts, span_diff, read_count) merged.
    With shard_positions the span axis is padded to ref_len + n_dev (see
    make_align_pileup_step's width contract) and merged via psum_scatter.
    """
    n_dev = mesh.devices.size
    span_w = ref_len + 1
    if shard_positions:
        assert ref_len % n_dev == 0, "ref_len must divide the mesh"
        span_w = ref_len + n_dev

    def step(query, proj, bins):
        counts, span_diff = node_pileup(query, proj, bins, n_nodes, ref_len)
        rc = jnp.zeros((n_nodes + 1,), jnp.int32).at[
            jnp.where(bins >= 0, bins, n_nodes)
        ].add(1)[:-1]
        rc = jax.lax.psum(rc, DATA_AXIS)
        if shard_positions:
            pad = jnp.zeros((n_nodes, span_w - ref_len - 1), jnp.int32)
            span_diff = jnp.concatenate([span_diff, pad], axis=1)
            counts = jax.lax.psum_scatter(
                counts, DATA_AXIS, scatter_dimension=1, tiled=True)
            span_diff = jax.lax.psum_scatter(
                span_diff, DATA_AXIS, scatter_dimension=1, tiled=True)
        else:
            counts = jax.lax.psum(counts, DATA_AXIS)
            span_diff = jax.lax.psum(span_diff, DATA_AXIS)
        return counts, span_diff, rc

    data = P(DATA_AXIS)
    data2 = P(DATA_AXIS, None)
    repl = P()
    out_specs = (
        P(None, DATA_AXIS, None) if shard_positions else repl,
        P(None, DATA_AXIS) if shard_positions else repl,
        repl,
    )
    return jax.jit(jax.shard_map(
        step, mesh=mesh, in_specs=(data2, data2, data),
        out_specs=out_specs, check_vma=False))


@functools.lru_cache(maxsize=64)
def make_slot_pileup_step(mesh, n_slots: int, ref_len: int):
    """Slot-compacted pileup (full-Greengenes-scale taxonomies) + psum merge.

    step(query, proj, bins, node2slot) -> (counts_s, span_s) merged."""

    def step(query, proj, bins, node2slot):
        c, s = node_slot_pileup(query, proj, bins, node2slot, n_slots, ref_len)
        return jax.lax.psum(c, DATA_AXIS), jax.lax.psum(s, DATA_AXIS)

    data = P(DATA_AXIS)
    data2 = P(DATA_AXIS, None)
    repl = P()
    return jax.jit(jax.shard_map(
        step, mesh=mesh, in_specs=(data2, data2, data, repl),
        out_specs=(repl, repl), check_vma=False))


@functools.lru_cache(maxsize=64)
def make_read_count_step(mesh, n_nodes: int):
    """Merged per-node read counts from sharded bins (slot mode needs the
    global counts BEFORE the pileup scatter to pick active nodes)."""

    def step(bins):
        rc = jnp.zeros((n_nodes + 1,), jnp.int32).at[
            jnp.where(bins >= 0, bins, n_nodes)
        ].add(1)[:-1]
        return jax.lax.psum(rc, DATA_AXIS)

    return jax.jit(jax.shard_map(
        step, mesh=mesh, in_specs=(P(DATA_AXIS),), out_specs=P(),
        check_vma=False))


def make_align_pileup_step(mesh, cfg: PipelineConfig, n_bits: int,
                           n_nodes: int, ref_len: int, ring: bool = False,
                           shard_positions: bool = False):
    """Build the jitted shard_map step.

    step(reads, lens, bucket_start, entries, ref_seqs, ref_taxon, anc_path,
         depth, col_map)
      -> (query, ref_col, bins, score  [sharded over 'data'],
          counts, span_diff, read_count [psum-merged])

    col_map is the anchor-coordinate projection (index.colmap.build_col_maps).
    With ring=True the seed-table arrays are expected bucket-range sharded
    over 'data' (see parallel.ring.build_ring_shards) and lookups rotate the
    shards around the mesh.

    shard_positions=True merges the pileup accumulators with
    jax.lax.psum_scatter over the COLUMN axis instead of a full psum: each
    device keeps 1/N of the columns and the collective moves 1/N of the
    bytes (reduce-scatter vs all-reduce) - the position-sharded pileup for
    deep configs (BASELINE config 5) where the merge dominates DCN traffic.
    The returned global array is bit-identical; only residency changes.

    RETURN-WIDTH CONTRACT with shard_positions=True: span_diff comes back
    (n_nodes, ref_len + n_dev) - the span axis is zero-PADDED so it divides
    the mesh. Callers MUST slice back to [:, :ref_len + 1] before feeding
    leaf_pileup (which cumsums over [:, :-1]); the padding columns are
    always zero, so the slice is exact. assemble_jax's mesh path does this
    immediately after the step.
    """
    n_dev = mesh.devices.size
    span_w = ref_len + 1
    if shard_positions:
        assert ref_len % n_dev == 0, "ref_len must divide the mesh"
        span_w = ref_len + n_dev      # pad so the span axis divides too

    def step(reads, lens, bucket_start, entries,
             ref_seqs, ref_taxon, anc_path, depth, col_map):
        if ring:
            from rambl_tpu.parallel.ring import ring_align_batch

            res = ring_align_batch(
                reads, lens, bucket_start, entries, ref_seqs, cfg, n_bits,
            )
        else:
            table = SeedTable(bucket_start, entries, n_bits)
            res = align_batch(reads, lens, table, ref_seqs, cfg)
        bins = bin_batch(res, ref_taxon, anc_path, depth, cfg)
        refc = jnp.clip(res.ref, 0, ref_seqs.shape[0] - 1)
        rc = res.ref_col
        proj = jnp.where(
            rc >= 0,
            col_map[refc[:, None], jnp.clip(rc, 0, ref_seqs.shape[1] - 1)],
            -1,
        ).astype(jnp.int32)
        counts, span_diff = node_pileup(
            res.query, proj, bins, n_nodes, ref_len
        )
        read_count = jnp.zeros((n_nodes + 1,), jnp.int32).at[
            jnp.where(bins >= 0, bins, n_nodes)
        ].add(1)[:-1]
        # cross-device/-host merge (BASELINE.json:5)
        read_count = jax.lax.psum(read_count, DATA_AXIS)
        if shard_positions:
            pad = jnp.zeros((n_nodes, span_w - ref_len - 1), jnp.int32)
            span_diff = jnp.concatenate([span_diff, pad], axis=1)
            counts = jax.lax.psum_scatter(
                counts, DATA_AXIS, scatter_dimension=1, tiled=True)
            span_diff = jax.lax.psum_scatter(
                span_diff, DATA_AXIS, scatter_dimension=1, tiled=True)
        else:
            counts = jax.lax.psum(counts, DATA_AXIS)
            span_diff = jax.lax.psum(span_diff, DATA_AXIS)
        return res.query, proj, bins, res.score, counts, span_diff, read_count

    data = P(DATA_AXIS)
    data2 = P(DATA_AXIS, None)
    repl = P()
    table_spec = data if ring else repl
    in_specs = (
        data2, data,                      # reads, lens
        table_spec, table_spec,           # seed table: bucket_start, entries
        repl, repl, repl, repl, repl,     # ref_seqs, ref_taxon, anc, depth, col_map
    )
    pile_spec = P(None, DATA_AXIS) if shard_positions else repl
    out_specs = (data2, data2, data, data,
                 P(None, DATA_AXIS, None) if shard_positions else repl,
                 pile_spec, repl)
    return jax.jit(
        jax.shard_map(
            step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=64)
def make_cluster_step(mesh, cfg: PipelineConfig, slots: bool = False):
    """Leaf-sharded round-0 clustering: the EP analogue (SURVEY.md
    section 2.3 - per-taxon bins are the 'experts', sharded over the mesh for
    the per-bin DP-means/consensus phase; read tensors are replicated).

    step(query, ref_col, bins, counts, span_diff, read_count, leaves,
         anc_path, depth) with `leaves` (NL,) sharded over 'data' (NL must
    divide by mesh size; pad with leaf 0 and ignore padded outputs).
    With slots=True the step takes a trailing node2slot argument and the
    count accumulators are slot-compacted (pipeline.pileup slot mode).
    Outputs (ConsensusOut, kact, n_mem, MinorHap) sharded over their leaf dim.
    """
    from rambl_tpu.pipeline.assemble import cluster_round0_core

    def step(query, ref_col, bins, counts, span_diff, read_count, leaves,
             anc_path, depth, *slot_arg):
        return cluster_round0_core(
            query, ref_col, bins, counts, span_diff, read_count, leaves,
            anc_path, depth, cfg,
            node2slot=slot_arg[0] if slots else None,
        )

    from rambl_tpu.pipeline.consensus import ConsensusOut, MinorHap

    repl = P()
    data = P(DATA_AXIS)
    in_specs = (repl, repl, repl, repl, repl, repl, data, repl, repl)
    if slots:
        in_specs = in_specs + (repl,)
    out_specs = (
        ConsensusOut(called=data, emit=data, n_reads=data),
        data,                # kact
        data,                # n_mem
        MinorHap(called=data, emit=data, n_reads=data, n_cols=data),
    )
    return jax.jit(
        jax.shard_map(step, mesh=mesh, in_specs=in_specs,
                      out_specs=out_specs, check_vma=False)
    )
