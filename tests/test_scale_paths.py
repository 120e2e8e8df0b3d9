"""Scale-path parity: slot-compacted pileups and range-based member tables
must be bit-identical to the dense implementations they replace (the dense
(n_nodes, ref_len, 4) tensor and (NL, B) member mask are infeasible at
full-Greengenes taxonomy scale - BASELINE configs 3/5)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rambl_tpu.config import PipelineConfig
from rambl_tpu.data.simulate import simulate_dataset
from rambl_tpu.index.taxonomy import build_taxonomy_tables
from rambl_tpu.pipeline.cluster import (
    bin_sort,
    member_table,
    member_table_ranges,
)
from rambl_tpu.pipeline.pileup import (
    leaf_pileup,
    leaf_pileup_slots,
    node_pileup,
    node_slot_pileup,
)


@pytest.fixture(scope="module")
def toy_tax():
    # root(0) -> a(1), b(2); a -> leaves 3,4 ; b -> leaf 5
    parent = np.array([0, 0, 0, 1, 1, 2], np.int32)
    depth = np.array([0, 1, 1, 2, 2, 2], np.int32)
    ref_taxon = np.array([3, 4, 5], np.int32)
    return build_taxonomy_tables(parent, depth, ref_taxon)


def _random_reads(rng, B, L, n_nodes, ref_len):
    query = rng.integers(0, 5, size=(B, L)).astype(np.int8)
    ref_col = np.sort(rng.integers(-1, ref_len, size=(B, L)).astype(np.int32), axis=1)
    bins = rng.integers(-1, n_nodes, size=(B,)).astype(np.int32)
    return jnp.asarray(query), jnp.asarray(ref_col), jnp.asarray(bins)


def test_member_table_ranges_matches_dense(toy_tax):
    rng = np.random.default_rng(0)
    B = 500
    bins = jnp.asarray(rng.integers(-1, toy_tax.n_nodes, size=(B,)).astype(np.int32))
    leaves = jnp.asarray(np.array([3, 4, 5], np.int32))
    anc = jnp.asarray(toy_tax.anc_path)
    dep = jnp.asarray(toy_tax.depth)
    # every node as a leaf candidate, including depth-0/1 shallow ones: the
    # windowed candidate compaction (W = share_depth+1) must reproduce the
    # dense mask exactly when the window clips at the root
    all_nodes = jnp.asarray(np.arange(toy_tax.n_nodes, dtype=np.int32))
    from rambl_tpu.index.taxonomy import MAX_DEPTH

    for M in (4, 32, 1024):
        for share in (MAX_DEPTH, 3, 1, 0):
            for lv in (leaves, all_nodes):
                i1, v1 = member_table(bins, lv, anc, dep, M, share)
                order, ns, ne = bin_sort(bins, toy_tax.n_nodes)
                i2, v2 = member_table_ranges(order, ns, ne, lv, anc, dep, M,
                                             share)
                n = min(M, B)   # dense table caps its width at B
                np.testing.assert_array_equal(
                    np.asarray(v1)[:, :n], np.asarray(v2)[:, :n])
                np.testing.assert_array_equal(
                    np.asarray(i1)[:, :n], np.asarray(i2)[:, :n])
                assert not np.asarray(v2)[:, n:].any()


def test_slot_pileup_matches_dense(toy_tax):
    rng = np.random.default_rng(1)
    ref_len = 64
    q, rc, bins = _random_reads(rng, 300, 16, toy_tax.n_nodes, ref_len)
    counts, span = node_pileup(q, rc, bins, toy_tax.n_nodes, ref_len)

    # slots for every node with reads (ascending id = deterministic)
    own = np.asarray(jnp.zeros(toy_tax.n_nodes, jnp.int32).at[
        jnp.where(bins >= 0, bins, 0)].add(jnp.where(bins >= 0, 1, 0)))
    ids = np.nonzero(own > 0)[0]
    node2slot = np.full(toy_tax.n_nodes, -1, np.int32)
    node2slot[ids] = np.arange(ids.size, dtype=np.int32)
    n2s = jnp.asarray(node2slot)

    counts_s, span_s = node_slot_pileup(q, rc, bins, n2s, ids.size, ref_len)
    np.testing.assert_array_equal(
        np.asarray(counts)[ids], np.asarray(counts_s))
    np.testing.assert_array_equal(np.asarray(span)[ids], np.asarray(span_s))

    leaves = jnp.asarray(np.array([3, 4, 5], np.int32))
    anc = jnp.asarray(toy_tax.anc_path)
    dep = jnp.asarray(toy_tax.depth)
    lc1, ls1 = leaf_pileup(counts, span, leaves, anc, dep)
    lc2, ls2 = leaf_pileup_slots(counts_s, span_s, n2s, leaves, anc, dep)
    np.testing.assert_array_equal(np.asarray(lc1), np.asarray(lc2))
    np.testing.assert_array_equal(np.asarray(ls1), np.asarray(ls2))


def test_chunked_scatter_matches_oneshot(toy_tax, monkeypatch):
    """The row-chunked scan scatter (config-3 HBM bound: the one-shot 10M-read
    scatter OOMs via XLA's 3x sort temps) must be bit-identical to the
    direct scatter, including the inert-pad tail and int16 ref_col."""
    import rambl_tpu.pipeline.pileup as pu

    rng = np.random.default_rng(4)
    ref_len = 64
    q, rc, bins = _random_reads(rng, 300, 16, toy_tax.n_nodes, ref_len)
    want_c, want_s = node_pileup(q, rc, bins, toy_tax.n_nodes, ref_len)
    monkeypatch.setattr(pu, "_SCATTER_ROW_CHUNK", 64)   # 300 -> 5 chunks + pad
    got_c, got_s = node_pileup(q, rc, bins, toy_tax.n_nodes, ref_len)
    np.testing.assert_array_equal(np.asarray(want_c), np.asarray(got_c))
    np.testing.assert_array_equal(np.asarray(want_s), np.asarray(got_s))
    rc16 = rc.astype(jnp.int16)
    got_c2, got_s2 = node_pileup(q, rc16, bins, toy_tax.n_nodes, ref_len)
    np.testing.assert_array_equal(np.asarray(want_c), np.asarray(got_c2))
    np.testing.assert_array_equal(np.asarray(want_s), np.asarray(got_s2))


def test_forced_slot_assembly_matches_oracle():
    """Full device assembly in FORCED slot mode (pileup_slot_nodes=1: every
    round and the polish pass run the active-node/compacted path) must stay
    bit-identical to the oracle's dense semantics."""
    from rambl_tpu.oracle.pipeline import assemble as assemble_oracle
    from rambl_tpu.pipeline.assemble import assemble_jax

    ds = simulate_dataset(
        n_species=3, refs_per_species=2, n_reads=400, seed=2,
        skewed_abundance=False,
    )
    tax = build_taxonomy_tables(ds.tax_parent, ds.tax_depth, ds.ref_taxon)
    cfg = PipelineConfig(max_assembly_iters=2, batch_size=128,
                         pileup_slot_nodes=1)
    r_np = assemble_oracle(ds.reads, ds.read_lens, ds.ref_seqs, ds.ref_lens,
                           tax, cfg)
    r_jx = assemble_jax(ds.reads, ds.read_lens, ds.ref_seqs, ds.ref_lens,
                        tax, cfg)
    assert sorted(g.key() for g in r_np.genes) == sorted(
        g.key() for g in r_jx.genes)
    # resumed runs recompute the polish votes (no retained accumulator):
    # polish-only continuation must match the oracle's
    cfg1 = dataclasses.replace(cfg, max_assembly_iters=1)
    p_np = assemble_oracle(ds.reads, ds.read_lens, ds.ref_seqs, ds.ref_lens,
                           tax, cfg1, initial_panel=r_np.panel)
    p_jx = assemble_jax(ds.reads, ds.read_lens, ds.ref_seqs, ds.ref_lens,
                        tax, cfg1, initial_panel=r_np.panel)
    assert sorted(g.key() for g in p_np.genes) == sorted(
        g.key() for g in p_jx.genes)


def test_zero_exclusive_leaf_collapse_parity():
    """Slot-mode round 0 collapses zero-exclusive duplicate leaves (config-3:
    8533 active leaves for 500 present refs). The collapse must be invisible
    in the output: device genes == oracle genes (the oracle still iterates
    every leaf) while n_leaves shrinks below the naive active count."""
    import dataclasses

    from rambl_tpu.oracle.pipeline import assemble as assemble_oracle
    from rambl_tpu.pipeline.assemble import assemble_jax

    # leaf-per-ref tree, most refs absent: their leaves activate only via
    # shared ancestor reads (the config-3 shape in miniature)
    ds = simulate_dataset(n_species=6, refs_per_species=4, n_reads=600,
                          seed=7, leaf_per_ref=True, n_present=5)
    tax = build_taxonomy_tables(ds.tax_parent, ds.tax_depth, ds.ref_taxon)
    cfg = PipelineConfig(max_assembly_iters=2, batch_size=256,
                         pileup_slot_nodes=1, bin_share_depth=3)
    r_np = assemble_oracle(ds.reads, ds.read_lens, ds.ref_seqs, ds.ref_lens,
                           tax, cfg)
    r_jx = assemble_jax(ds.reads, ds.read_lens, ds.ref_seqs, ds.ref_lens,
                        tax, cfg)
    assert [g.key() for g in r_np.genes] == [g.key() for g in r_jx.genes]
    assert [(g.n_reads, g.leaf, g.taxon) for g in r_np.genes] == \
        [(g.n_reads, g.leaf, g.taxon) for g in r_jx.genes]
    # the collapse engaged: fewer leaves processed than refs with active
    # chains (24 leaves share 6 species chains; absent siblings collapse)
    assert r_jx.round_stats[0]["n_leaves"] < ds.n_refs


def test_huge_taxonomy_smoke():
    """Full-Greengenes-scale taxonomy (150k nodes): the dense node pileup
    would need ~5 TB, so this passing proves the slot-compacted path engages
    and assembles correctly with the reference leaves scattered across a
    huge tree."""
    from rambl_tpu.pipeline.assemble import assemble_jax

    ds = simulate_dataset(n_species=4, refs_per_species=1, n_reads=400,
                          seed=5, skewed_abundance=False)
    N = 150_000
    parent = np.zeros(N, np.int32)
    depth = np.ones(N, np.int32)
    depth[0] = 0
    leaf_ids = np.array([10, 50_000, 100_000, 149_999], np.int32)
    tax = build_taxonomy_tables(parent, depth, leaf_ids)
    cfg = PipelineConfig(max_assembly_iters=2, batch_size=128)
    res = assemble_jax(ds.reads, ds.read_lens, ds.ref_seqs, ds.ref_lens,
                       tax, cfg)
    # each species leaf should assemble at least one full-length gene
    leaves_with_genes = {g.taxon for g in res.genes}
    assert set(leaf_ids.tolist()) <= leaves_with_genes
    assert len(res.full_length(cfg)) >= 4


def test_cluster_leaf_block_parity():
    """Leaf-blocked clustering (cfg.cluster_leaf_block) is bitwise equal to
    the single-call path - leaves are independent."""
    import dataclasses

    from rambl_tpu.config import PipelineConfig
    from rambl_tpu.data.simulate import simulate_dataset
    from rambl_tpu.index.taxonomy import build_taxonomy_tables
    from rambl_tpu.pipeline.assemble import assemble_round_jax

    cfg = PipelineConfig(batch_size=128)
    ds = simulate_dataset(n_species=6, refs_per_species=2, n_reads=400,
                          seed=4, skewed_abundance=False)
    tax = build_taxonomy_tables(ds.tax_parent, ds.tax_depth, ds.ref_taxon)
    g1, _ = assemble_round_jax(ds.reads, ds.read_lens, ds.ref_seqs,
                               ds.ref_lens, tax, cfg, 0)
    cfg_b = dataclasses.replace(cfg, cluster_leaf_block=2)
    g2, _ = assemble_round_jax(ds.reads, ds.read_lens, ds.ref_seqs,
                               ds.ref_lens, tax, cfg_b, 0)
    assert [(g.key(), g.n_reads, g.leaf, g.cluster) for g in g1] == \
           [(g.key(), g.n_reads, g.leaf, g.cluster) for g in g2]


def test_leaf_features_dense_matches_sorted_formulation():
    """Direct randomized parity: leaf_features_dense ==
    leaf_features(sorted_col_base(...)) over edge cases - code-4 bases,
    invalid members, padded/invalid polymorphic columns, duplicate clip
    targets (ADVICE r4: the old featurizer's equivalence was only exercised
    indirectly through end-to-end assembly parity)."""
    from rambl_tpu.pipeline.cluster import (
        leaf_features,
        leaf_features_dense,
        sorted_col_base,
    )

    rng = np.random.default_rng(3)
    NL, M, L, P, ref_len = 5, 12, 32, 8, 64
    qm = rng.integers(0, 6, (NL, M, L)).astype(np.int8)  # incl N=4, junk 5
    # strictly increasing real columns per read, some positions unaligned
    rcm = np.full((NL, M, L), -1, np.int32)
    for a in range(NL):
        for m in range(M):
            npos = int(rng.integers(0, L))
            cols = np.sort(rng.choice(ref_len, npos, replace=False))
            pos = np.sort(rng.choice(L, npos, replace=False))
            rcm[a, m, pos] = cols
    mv = rng.random((NL, M)) < 0.8
    pc = rng.integers(0, ref_len, (NL, P)).astype(np.int32)
    pv = rng.random((NL, P)) < 0.7

    mc, mb = jax.vmap(sorted_col_base)(jnp.asarray(qm), jnp.asarray(rcm))
    ref = np.asarray(leaf_features(
        mc, mb, jnp.asarray(mv), jnp.asarray(pc), jnp.asarray(pv)))
    got = np.asarray(leaf_features_dense(
        jnp.asarray(qm), jnp.asarray(rcm), jnp.asarray(mv),
        jnp.asarray(pc), jnp.asarray(pv), ref_len, chunk=2))
    np.testing.assert_array_equal(ref, got)


def test_packed_member_gather_parity():
    """The packed int16 member gather (config.packed_member_gather, one
    256B-row gather per block instead of int8+int16) is bitwise equal to the
    two-gather path end-to-end, and the pack/unpack roundtrip is exact over
    the full (rc, q) value grid."""
    import dataclasses

    from rambl_tpu.config import PipelineConfig
    from rambl_tpu.data.simulate import simulate_dataset
    from rambl_tpu.index.taxonomy import build_taxonomy_tables
    from rambl_tpu.pipeline.assemble import _pack_retention, assemble_round_jax

    # exact roundtrip over every representable (rc, q) pair
    rc = np.repeat(np.arange(-1, 2048, dtype=np.int16), 5).reshape(-1, 5)
    q = np.tile(np.arange(5, dtype=np.int8), (rc.shape[0], 1))
    p = np.asarray(_pack_retention(jnp.asarray(q), jnp.asarray(rc))
                   ).astype(np.int32)
    np.testing.assert_array_equal(p % 8, q)
    np.testing.assert_array_equal(p // 8 - 1, rc)

    cfg = PipelineConfig(batch_size=128)  # packed_member_gather defaults on
    ds = simulate_dataset(n_species=6, refs_per_species=2, n_reads=400,
                          seed=7, skewed_abundance=False)
    tax = build_taxonomy_tables(ds.tax_parent, ds.tax_depth, ds.ref_taxon)
    g1, _ = assemble_round_jax(ds.reads, ds.read_lens, ds.ref_seqs,
                               ds.ref_lens, tax, cfg, 0)
    cfg_off = dataclasses.replace(cfg, packed_member_gather=False)
    g2, _ = assemble_round_jax(ds.reads, ds.read_lens, ds.ref_seqs,
                               ds.ref_lens, tax, cfg_off, 0)
    assert [(g.key(), g.n_reads, g.leaf, g.cluster) for g in g1] == \
           [(g.key(), g.n_reads, g.leaf, g.cluster) for g in g2]
    assert len(g1) > 0
