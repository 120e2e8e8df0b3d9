"""Distributed invariance tests on the forced 8-device CPU mesh
(SURVEY.md section 4.2): sharded == replicated == single-device, bitwise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rambl_tpu.config import PipelineConfig
from rambl_tpu.ops.seed import SeedTable, seed_candidates_jax
from rambl_tpu.parallel.mesh import data_mesh, put_replicated, put_sharded
from rambl_tpu.parallel.ring import build_ring_shards
from rambl_tpu.parallel.steps import make_align_pileup_step
from rambl_tpu.pipeline.align import align_batch
from rambl_tpu.pipeline.binning import bin_batch
from rambl_tpu.pipeline.pileup import node_pileup


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (fake) devices"
)

B = 128  # batch, divisible by 8


@pytest.fixture(scope="module")
def mesh():
    return data_mesh(8)


def _col_map(ds, tax):
    from rambl_tpu.index.colmap import build_col_maps

    return build_col_maps(ds.ref_seqs, ds.ref_lens,
                          ds.ref_seqs[0, : ds.ref_lens[0]])


def _single_device_reference(ds, index, tax, cfg):
    table = SeedTable.from_index(index)
    res = align_batch(
        jnp.asarray(ds.reads[:B]), jnp.asarray(ds.read_lens[:B]), table,
        jnp.asarray(ds.ref_seqs), cfg,
    )
    bins = bin_batch(
        res, jnp.asarray(tax.ref_taxon), jnp.asarray(tax.anc_path),
        jnp.asarray(tax.depth), cfg,
    )
    cmap = jnp.asarray(_col_map(ds, tax))
    refc = jnp.clip(res.ref, 0, ds.ref_seqs.shape[0] - 1)
    rc = res.ref_col
    proj = jnp.where(
        rc >= 0,
        cmap[refc[:, None], jnp.clip(rc, 0, ds.ref_seqs.shape[1] - 1)],
        -1,
    ).astype(jnp.int32)
    counts, span = node_pileup(
        res.query, proj, bins, tax.n_nodes, ds.ref_seqs.shape[1]
    )
    return res, proj, bins, np.asarray(counts), np.asarray(span)


def test_sharded_step_matches_single_device(small_ds, small_index, small_tax, cfg, mesh):
    res1, proj1, bins1, counts1, span1 = _single_device_reference(
        small_ds, small_index, small_tax, cfg
    )

    step = make_align_pileup_step(
        mesh, cfg, small_index.n_bits, small_tax.n_nodes,
        small_ds.ref_seqs.shape[1],
    )
    table = SeedTable.from_index(small_index)
    reads = put_sharded(small_ds.reads[:B], mesh)
    lens = put_sharded(small_ds.read_lens[:B], mesh)
    args = [put_replicated(np.asarray(x), mesh) for x in
            (table.bucket_start, table.entries, small_ds.ref_seqs,
             small_tax.ref_taxon, small_tax.anc_path, small_tax.depth,
             _col_map(small_ds, small_tax))]
    q, rc, bins, score, counts, span, rcount = step(reads, lens, *args)

    np.testing.assert_array_equal(np.asarray(q), np.asarray(res1.query))
    np.testing.assert_array_equal(np.asarray(rc), np.asarray(proj1))
    np.testing.assert_array_equal(np.asarray(bins), np.asarray(bins1))
    np.testing.assert_array_equal(np.asarray(score), np.asarray(res1.score))
    np.testing.assert_array_equal(np.asarray(counts), counts1)
    np.testing.assert_array_equal(np.asarray(span), span1)
    binned = np.asarray(bins1)
    expect_rcount = np.bincount(binned[binned >= 0], minlength=small_tax.n_nodes)
    np.testing.assert_array_equal(np.asarray(rcount), expect_rcount)


def test_ring_sharded_index_matches_replicated(small_ds, small_index, small_tax, cfg, mesh):
    step = make_align_pileup_step(
        mesh, cfg, small_index.n_bits, small_tax.n_nodes,
        small_ds.ref_seqs.shape[1], ring=True,
    )
    shards = build_ring_shards(small_index, 8)
    reads = put_sharded(small_ds.reads[:B], mesh)
    lens = put_sharded(small_ds.read_lens[:B], mesh)
    shard_args = [put_sharded(shards[k], mesh) for k in
                  ("bucket_start", "entries")]
    repl_args = [put_replicated(np.asarray(x), mesh) for x in
                 (small_ds.ref_seqs, small_tax.ref_taxon,
                  small_tax.anc_path, small_tax.depth,
                  _col_map(small_ds, small_tax))]
    q, rc, bins, score, counts, span, rcount = step(
        reads, lens, *shard_args, *repl_args
    )

    res1, proj1, bins1, counts1, span1 = _single_device_reference(
        small_ds, small_index, small_tax, cfg
    )
    np.testing.assert_array_equal(np.asarray(score), np.asarray(res1.score))
    np.testing.assert_array_equal(np.asarray(bins), np.asarray(bins1))
    np.testing.assert_array_equal(np.asarray(rc), np.asarray(proj1))
    np.testing.assert_array_equal(np.asarray(counts), counts1)


def test_ring_shards_roundtrip(small_index):
    """Shard slicing preserves every entry exactly once (pack_entries
    chunk-row layout: keys live in lanes 0:32 of every (128,) int32 row)."""
    shards = build_ring_shards(small_index, 8)
    total = 0
    keys_all = []
    for s in range(8):
        # keys are >= 0 by construction; padding is -1
        k = shards["entries"][s, :, 0:32].ravel()
        total += int((k >= 0).sum())
        keys_all.append(k[k >= 0])
    assert total == small_index.n_entries
    np.testing.assert_array_equal(
        np.sort(np.concatenate(keys_all)), np.sort(small_index.entry_key))


def test_position_sharded_pileup_matches_replicated(
        small_ds, small_index, small_tax, cfg, mesh):
    """psum_scatter-merged (position-sharded) pileups == full psum, bitwise
    (BASELINE config 5: the deep-config merge rides reduce-scatter and each
    device keeps 1/N of the columns)."""
    res1, proj1, bins1, counts1, span1 = _single_device_reference(
        small_ds, small_index, small_tax, cfg
    )
    step = make_align_pileup_step(
        mesh, cfg, small_index.n_bits, small_tax.n_nodes,
        small_ds.ref_seqs.shape[1], shard_positions=True,
    )
    table = SeedTable.from_index(small_index)
    reads = put_sharded(small_ds.reads[:B], mesh)
    lens = put_sharded(small_ds.read_lens[:B], mesh)
    args = [put_replicated(np.asarray(x), mesh) for x in
            (table.bucket_start, table.entries, small_ds.ref_seqs,
             small_tax.ref_taxon, small_tax.anc_path, small_tax.depth,
             _col_map(small_ds, small_tax))]
    q, rc, bins, score, counts, span, rcount = step(reads, lens, *args)

    # sharded over the flat (col, base) axis but logically the same global
    # tensors (counts rows are FLAT (n_nodes, ref_len*4) - node_pileup
    # layout; ref_len % n_dev == 0 keeps device slices on whole columns)
    assert counts.sharding.spec == jax.sharding.PartitionSpec(None, "data")
    np.testing.assert_array_equal(np.asarray(counts), counts1)
    ref_len = small_ds.ref_seqs.shape[1]
    np.testing.assert_array_equal(
        np.asarray(span)[:, : ref_len + 1], span1)
    assert not np.asarray(span)[:, ref_len + 1:].any()


# ---------------------------------------------------------------------------
# End-to-end assembly on a mesh (VERDICT round-1 item 1): the PRODUCT path -
# full discovery + refinement + polish under shard_map must be bitwise equal
# to the single-device assembly, in every index mode.
# ---------------------------------------------------------------------------

def _assembly_keys(res):
    return [
        (g.key(), g.n_reads, g.leaf, g.cluster, g.taxon, g.offset)
        for g in res.genes
    ]


@pytest.fixture(scope="module")
def e2e_problem():
    from rambl_tpu.data.simulate import simulate_dataset
    from rambl_tpu.index.taxonomy import build_taxonomy_tables

    cfg = PipelineConfig(max_assembly_iters=2, batch_size=128)
    ds = simulate_dataset(
        n_species=3, refs_per_species=2, n_reads=400, seed=2,
        skewed_abundance=False,
    )
    tax = build_taxonomy_tables(ds.tax_parent, ds.tax_depth, ds.ref_taxon)
    return cfg, ds, tax


@pytest.fixture(scope="module")
def e2e_single(e2e_problem):
    from rambl_tpu.pipeline.assemble import assemble_jax

    cfg, ds, tax = e2e_problem
    return assemble_jax(ds.reads, ds.read_lens, ds.ref_seqs, ds.ref_lens,
                        tax, cfg)


def test_full_assembly_on_mesh_matches_single_device(
        e2e_problem, e2e_single, mesh):
    from rambl_tpu.pipeline.assemble import assemble_jax

    cfg, ds, tax = e2e_problem
    r_mesh = assemble_jax(ds.reads, ds.read_lens, ds.ref_seqs, ds.ref_lens,
                          tax, cfg, mesh=mesh)
    assert r_mesh.n_rounds == e2e_single.n_rounds
    assert r_mesh.converged == e2e_single.converged
    assert _assembly_keys(r_mesh) == _assembly_keys(e2e_single)


def test_full_assembly_on_mesh_ring_index(e2e_problem, e2e_single, mesh):
    """shard_index=True: the seed table ring-rotates around the mesh for
    EVERY round (discovery, panel realign, polish recompute)."""
    import dataclasses

    from rambl_tpu.pipeline.assemble import assemble_jax

    cfg, ds, tax = e2e_problem
    cfg_ring = dataclasses.replace(cfg, shard_index=True)
    r_mesh = assemble_jax(ds.reads, ds.read_lens, ds.ref_seqs, ds.ref_lens,
                          tax, cfg_ring, mesh=mesh)
    assert _assembly_keys(r_mesh) == _assembly_keys(e2e_single)


def test_host_config_sync_exercises_broadcast(monkeypatch):
    """Fake a 2-process world (VERDICT r2 #7): sync_host_config must route
    through the multihost broadcast and adopt process 0's config; the
    fingerprint check must raise on drift."""
    import dataclasses

    import rambl_tpu.parallel.mesh as m
    from jax.experimental import multihost_utils

    cfg0 = PipelineConfig()
    cfg_drift = dataclasses.replace(cfg0, batch_size=4096)
    calls = []

    # process-0's payload arrives regardless of the local value
    payload0 = {"v": cfg0.to_json().encode()}

    def fake_b1a(x, is_source=None):
        calls.append(np.asarray(x).copy())
        arr = np.frombuffer(payload0["v"], np.uint8)
        if np.asarray(x).size == 1:            # the length exchange
            return np.asarray([arr.size], np.int32)
        return arr

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    monkeypatch.setattr(multihost_utils, "broadcast_one_to_all", fake_b1a)

    got = m.sync_host_config(cfg_drift)
    assert calls, "broadcast path was not exercised"
    assert got == cfg0                          # process 0 wins

    # fingerprint agreement: same payload passes, drifted payload raises
    payload0["v"] = b"fingerprint-of-process-0"
    m.assert_hosts_agree("reference FASTA", b"fingerprint-of-process-0")
    with pytest.raises(ValueError, match="multi-host mismatch"):
        m.assert_hosts_agree("reference FASTA", b"something-else")


def test_mesh_stream_retention_stays_sharded(
        small_ds, small_index, small_tax, cfg, mesh):
    """Scale-shaped mesh streaming (VERDICT r2 #4): the per-read retention
    buffers stay sharded over 'data' (never replicated), ref_col narrows to
    int16, and the merged pileups are bitwise the single-device stream's."""
    import dataclasses

    from rambl_tpu.pipeline.assemble import _stream_align

    cfg_b = dataclasses.replace(cfg, batch_size=256)
    n = 600
    rec1, counts1, span1, rcount1 = _stream_align(
        small_ds.reads[:n], small_ds.read_lens[:n], small_index,
        small_ds.ref_seqs, small_ds.ref_lens, small_tax, cfg_b)
    recm, countsm, spanm, rcountm = _stream_align(
        small_ds.reads[:n], small_ds.read_lens[:n], small_index,
        small_ds.ref_seqs, small_ds.ref_lens, small_tax, cfg_b, mesh=mesh)

    # residency: (nb, bs, L) retention sharded over the batch-row axis
    spec = jax.sharding.PartitionSpec
    assert recm["query"].shape[0] * recm["query"].shape[1] >= n
    assert recm["query"].sharding.spec == spec(None, "data", None)
    assert recm["ref_col"].sharding.spec == spec(None, "data", None)
    assert recm["ref_col"].dtype == jnp.int16      # coordinate compaction
    assert recm["bins_sh"].sharding.spec == spec(None, "data")

    # content: stream order (batch g//bs, row g%bs) == flat single-device
    nbm, bsm, L = recm["query"].shape
    qm = np.asarray(recm["query"]).reshape(nbm * bsm, L)[:n]
    rm = np.asarray(recm["ref_col"]).reshape(nbm * bsm, L)[:n]
    np.testing.assert_array_equal(qm, np.asarray(rec1["query"]))
    np.testing.assert_array_equal(rm, np.asarray(rec1["ref_col"]))
    np.testing.assert_array_equal(np.asarray(recm["bins"]),
                                  np.asarray(rec1["bins"]))
    np.testing.assert_array_equal(np.asarray(countsm), np.asarray(counts1))
    np.testing.assert_array_equal(np.asarray(spanm), np.asarray(span1))
    np.testing.assert_array_equal(np.asarray(rcountm), np.asarray(rcount1))


def test_full_assembly_on_mesh_position_sharded(e2e_problem, e2e_single, mesh):
    """cfg.shard_positions: the streamed pileup merge rides psum_scatter
    (deep preset, BASELINE config 5) - full assembly stays bitwise equal."""
    import dataclasses

    from rambl_tpu.pipeline.assemble import assemble_jax

    cfg, ds, tax = e2e_problem
    cfg_ps = dataclasses.replace(cfg, shard_positions=True)
    r_mesh = assemble_jax(ds.reads, ds.read_lens, ds.ref_seqs, ds.ref_lens,
                          tax, cfg_ps, mesh=mesh)
    assert _assembly_keys(r_mesh) == _assembly_keys(e2e_single)


def test_full_assembly_on_mesh_slot_mode(e2e_problem, mesh):
    """Force the slot-compacted pileup path (full-Greengenes-scale taxonomy
    regime) on the mesh: still bitwise equal to the same config off-mesh."""
    import dataclasses

    from rambl_tpu.pipeline.assemble import assemble_jax

    cfg, ds, tax = e2e_problem
    cfg_slot = dataclasses.replace(cfg, pileup_slot_nodes=1)
    r_one = assemble_jax(ds.reads, ds.read_lens, ds.ref_seqs, ds.ref_lens,
                         tax, cfg_slot)
    r_mesh = assemble_jax(ds.reads, ds.read_lens, ds.ref_seqs, ds.ref_lens,
                          tax, cfg_slot, mesh=mesh)
    assert _assembly_keys(r_mesh) == _assembly_keys(r_one)
