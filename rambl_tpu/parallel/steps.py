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


# Streamed per-read retention layout (scale-shaped, VERDICT r2 #4): the
# driver retains query/ref_col/bins as (nb, batch, ...) arrays sharded
# P(None, 'data', ...) - device d holds rows [d*bs/N, (d+1)*bs/N) of EVERY
# batch, so each batch's sharded align output writes its own shard locally
# (no resharding, no replication; per-device memory ~ B/N rows). Stream-order
# read index g maps to (batch g // bs, row g % bs).
RETAIN3 = P(None, DATA_AXIS, None)
RETAIN2 = P(None, DATA_AXIS)


@functools.lru_cache(maxsize=64)
def make_retain_step(mesh):
    """Donated in-place write of batch i's sharded align outputs into the
    (nb, bs, ...) retention buffers (the mesh analogue of assemble._fill_rows;
    ref_col narrows to the buffer dtype - int16 when ref_len fits, exact).

    fill(qbuf, rbuf, bbuf, q, rc, bins, i) -> (qbuf, rbuf, bbuf)."""

    def fill(qbuf, rbuf, bbuf, q, rc, bins, i):
        qbuf = jax.lax.dynamic_update_slice(qbuf, q[None], (i, 0, 0))
        rbuf = jax.lax.dynamic_update_slice(
            rbuf, rc.astype(rbuf.dtype)[None], (i, 0, 0))
        bbuf = jax.lax.dynamic_update_slice(bbuf, bins[None], (i, 0))
        return qbuf, rbuf, bbuf

    data = P(DATA_AXIS)
    data2 = P(DATA_AXIS, None)
    return jax.jit(
        jax.shard_map(
            fill, mesh=mesh,
            in_specs=(RETAIN3, RETAIN3, RETAIN2, data2, data2, data, P()),
            out_specs=(RETAIN3, RETAIN3, RETAIN2), check_vma=False),
        donate_argnums=(0, 1, 2))


def _flat_local(q_sh, rc_sh, bins_sh):
    """Local (nb, bs/N, ...) retention shards -> flat per-read arrays for
    scatter consumers (order-independent integer adds)."""
    nb, bl, L = q_sh.shape
    return (q_sh.reshape(nb * bl, L),
            rc_sh.reshape(nb * bl, L).astype(jnp.int32),
            bins_sh.reshape(nb * bl))


@functools.lru_cache(maxsize=64)
def make_pileup_merge_step(mesh, n_nodes: int, ref_len: int,
                           shard_positions: bool = False):
    """One-shot pileup over the full streamed read tensors + cross-device
    merge (BASELINE.json:5 psum before reconstruction). Integer scatter-adds
    commute, so pileup-at-the-end is bitwise equal to the single-device
    per-batch accumulation.

    step(qbuf, rbuf, bbuf) -> (counts, span_diff, read_count) merged; inputs
    in the RETAIN3/RETAIN2 streamed layout (pad reads bin to -1 and scatter
    into the inert overflow slot). With shard_positions the span axis is
    padded to ref_len + n_dev (see make_align_pileup_step's width contract)
    and merged via psum_scatter: the collective moves 1/N of the bytes
    (reduce-scatter vs all-reduce; BASELINE config 5) and each device keeps
    1/N of the columns - consumers that need the full rows trigger the
    deferred all-gather on first use.
    """
    n_dev = mesh.devices.size
    span_w = ref_len + 1
    if shard_positions:
        assert ref_len % n_dev == 0, "ref_len must divide the mesh"
        span_w = ref_len + n_dev

    def step(q_sh, rc_sh, bins_sh):
        query, proj, bins = _flat_local(q_sh, rc_sh, bins_sh)
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

    repl = P()
    # counts rows are FLAT (n_nodes, ref_len*4) - node_pileup layout
    out_specs = (
        P(None, DATA_AXIS) if shard_positions else repl,
        P(None, DATA_AXIS) if shard_positions else repl,
        repl,
    )
    return jax.jit(jax.shard_map(
        step, mesh=mesh, in_specs=(RETAIN3, RETAIN3, RETAIN2),
        out_specs=out_specs, check_vma=False))


@functools.lru_cache(maxsize=64)
def make_slot_pileup_step(mesh, n_slots: int, ref_len: int):
    """Slot-compacted pileup (full-Greengenes-scale taxonomies) + psum merge.

    step(qbuf, rbuf, bbuf, node2slot) -> (counts_s, span_s) merged; read
    inputs in the streamed RETAIN3/RETAIN2 layout."""

    def step(q_sh, rc_sh, bins_sh, node2slot):
        query, proj, bins = _flat_local(q_sh, rc_sh, bins_sh)
        c, s = node_slot_pileup(query, proj, bins, node2slot, n_slots, ref_len)
        return jax.lax.psum(c, DATA_AXIS), jax.lax.psum(s, DATA_AXIS)

    repl = P()
    return jax.jit(jax.shard_map(
        step, mesh=mesh, in_specs=(RETAIN3, RETAIN3, RETAIN2, repl),
        out_specs=(repl, repl), check_vma=False))


@functools.lru_cache(maxsize=64)
def make_read_count_step(mesh, n_nodes: int):
    """Merged per-node read counts from the sharded bins retention (slot mode
    needs the global counts BEFORE the pileup scatter to pick active nodes)."""

    def step(bins_sh):
        bins = bins_sh.reshape(-1)
        rc = jnp.zeros((n_nodes + 1,), jnp.int32).at[
            jnp.where(bins >= 0, bins, n_nodes)
        ].add(1)[:-1]
        return jax.lax.psum(rc, DATA_AXIS)

    return jax.jit(jax.shard_map(
        step, mesh=mesh, in_specs=(RETAIN2,), out_specs=P(),
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
    # counts rows are FLAT (n_nodes, ref_len*4) - node_pileup layout
    out_specs = (data2, data2, data, data,
                 pile_spec, pile_spec, repl)
    return jax.jit(
        jax.shard_map(
            step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=64)
def make_cluster_step(mesh, cfg: PipelineConfig, slots: bool = False,
                      spawn: bool = True):
    """Leaf-sharded round-0 clustering: the EP analogue (SURVEY.md
    section 2.3 - per-taxon bins are the 'experts', sharded over the mesh for
    the per-bin DP-means/consensus phase) over the SHARDED streamed read
    retention (scale-shaped, VERDICT r2 #4 - the full per-read tensors never
    replicate).

    step(qbuf, rbuf, bins, counts, span_diff, read_count, leaves, anc_path,
         depth) with qbuf/rbuf in the RETAIN3 streamed layout, `bins` the
    (B,) replicated stream-order bin vector (small), and `leaves` (NL,)
    REPLICATED with NL a multiple of the mesh size (pad with leaf 0).

    Inside the step: every device derives the member index table from the
    replicated bins (bitwise the single-device rule), gathers ONLY the
    (NL, M, L) member rows from the read shards - each stream row has exactly
    one owner, so a masked local gather + integer psum completes the
    all-to-all - then slices its own NL/n leaf range for the cluster/
    consensus compute. Per-device memory: read shards (~B/N rows) + the
    member-table block, never the full read set.

    With slots=True the step takes a trailing node2slot argument and the
    count accumulators are slot-compacted (pipeline.pileup slot mode).
    Outputs (ConsensusOut, kact, n_mem, MinorHap) sharded over their leaf dim.
    """
    from rambl_tpu.pipeline.assemble import cluster_round0_members
    from rambl_tpu.pipeline.cluster import bin_sort, member_table_ranges

    n_dev = mesh.devices.size

    def step(q_sh, rc_sh, bins, counts, span_diff, read_count, leaves,
             anc_path, depth, *slot_arg):
        me = jax.lax.axis_index(DATA_AXIS)
        nb, bs_loc, L = q_sh.shape
        bs = bs_loc * n_dev
        B = bins.shape[0]
        # member index from replicated bins: identical on every device and
        # bitwise the single-device cluster_round0_core rule
        order, nstart, nend = bin_sort(bins, anc_path.shape[0])
        midx, mvalid = member_table_ranges(
            order, nstart, nend, leaves, anc_path, depth,
            min(cfg.max_bin_reads, B), cfg.bin_share_depth)
        bins_m = bins[midx]
        # distributed member gather: stream row g lives on device
        # (g % bs) // bs_loc at local (g // bs, (g % bs) % bs_loc)
        bi = midx // bs
        r = midx % bs
        lo = me * bs_loc
        own = (r >= lo) & (r < lo + bs_loc)
        rl = jnp.clip(r - lo, 0, bs_loc - 1)
        qm = jnp.where(own[..., None], q_sh[bi, rl], jnp.int8(0))
        qm = jax.lax.psum(qm, DATA_AXIS)            # one owner -> exact
        rcl = rc_sh[bi, rl]
        rcm = jnp.where(own[..., None], rcl, jnp.zeros((), rcl.dtype))
        rcm = jax.lax.psum(rcm, DATA_AXIS)
        # leaf shard (EP): this device's NL/n leaf slice
        NL = leaves.shape[0]
        nl = NL // n_dev
        sl = me * nl
        qm = jax.lax.dynamic_slice_in_dim(qm, sl, nl, 0)
        rcm = jax.lax.dynamic_slice_in_dim(rcm, sl, nl, 0).astype(jnp.int32)
        mvalid_l = jax.lax.dynamic_slice_in_dim(mvalid, sl, nl, 0)
        bins_m_l = jax.lax.dynamic_slice_in_dim(bins_m, sl, nl, 0)
        leaves_l = jax.lax.dynamic_slice_in_dim(leaves, sl, nl, 0)
        return cluster_round0_members(
            qm, rcm, bins_m_l,
            mvalid_l, counts, span_diff, read_count, leaves_l, anc_path,
            depth, cfg, node2slot=slot_arg[0] if slots else None, spawn=spawn)

    from rambl_tpu.pipeline.consensus import ConsensusOut, MinorHap

    repl = P()
    data = P(DATA_AXIS)
    in_specs = (RETAIN3, RETAIN3, repl, repl, repl, repl, repl, repl, repl)
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
