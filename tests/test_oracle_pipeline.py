"""Oracle pipeline components + end-to-end smoke (SURVEY.md section 4.2)."""

import numpy as np

from rambl_tpu.config import PipelineConfig
from rambl_tpu.data.simulate import simulate_dataset
from rambl_tpu.index.builder import build_seed_index
from rambl_tpu.index.taxonomy import build_taxonomy_tables, lca_of_set
from rambl_tpu.io.pack import decode_seq
from rambl_tpu.oracle.align import align_reads
from rambl_tpu.oracle.binning import bin_reads, leaf_membership
from rambl_tpu.oracle.cluster import dp_means, polymorphic_cols, bin_pileup, read_features
from rambl_tpu.oracle.consensus import call_consensus, cluster_pileup
from rambl_tpu.oracle.pipeline import assemble


def test_lca_identities(small_tax):
    x = int(small_tax.ref_taxon[0])
    y = int(small_tax.ref_taxon[-1])
    assert small_tax.lca_pair(x, x) == x
    got = lca_of_set(
        small_tax,
        np.array([[x, x], [x, y]]),
        np.array([[True, True], [True, True]]),
    )
    assert got[0] == x
    assert got[1] == small_tax.lca_pair(x, y)
    # invalid slots are neutral
    got2 = lca_of_set(small_tax, np.array([[x, y]]), np.array([[True, False]]))
    assert got2[0] == x


def test_align_spans_match_truth(small_ds, small_index, cfg):
    n = 200
    res = align_reads(
        small_ds.reads[:n], small_ds.read_lens[:n], small_ds.ref_seqs,
        small_index, cfg,
    )
    assert res.aligned.mean() > 0.95
    ok = res.aligned & (res.ref == small_ds.true_ref[:n])
    assert ok.sum() > 0
    idx = np.nonzero(ok)[0]
    # strand recovery is exact for aligned reads
    assert (res.strand[idx] == small_ds.true_strand[:n][idx]).all()
    # error-free fwd reads must start exactly at the true position
    for b in idx[:20]:
        cols = res.ref_col[b]
        cols = cols[cols >= 0]
        assert abs(int(cols.min()) - int(small_ds.true_pos[b])) <= 2


def test_binning_lca_at_conserved_reads(small_ds, small_index, small_tax, cfg):
    n = 200
    res = align_reads(
        small_ds.reads[:n], small_ds.read_lens[:n], small_ds.ref_seqs,
        small_index, cfg,
    )
    bins = bin_reads(res, small_tax, cfg)
    assert (bins[res.aligned] >= 0).all()
    assert (bins[~res.aligned] == -1).all()
    # every aligned read's bin must be an ancestor-or-self of its best ref's leaf
    for b in np.nonzero(res.aligned)[0][:50]:
        leaf = int(small_tax.ref_taxon[res.ref[b]])
        anc = set(small_tax.anc_path[leaf].tolist()) | {leaf}
        assert int(bins[b]) in anc


def test_leaf_membership_includes_ancestor_binned():
    tax = build_taxonomy_tables(
        np.array([0, 0, 1], np.int32), np.array([0, 1, 2], np.int32),
        np.array([2], np.int32),
    )
    bins = np.array([2, 1, 0, -1], np.int32)
    m = leaf_membership(bins, 2, tax)
    assert m.tolist() == [True, True, True, False]


def test_dp_means_splits_two_variants(cfg):
    rng = np.random.default_rng(0)
    N, P = 60, 8
    feat = np.zeros((N, P), np.int8)
    feat[30:] = 3  # second variant: all T at poly cols
    # random coverage mask
    mask = rng.random((N, P)) < 0.5
    feat = np.where(mask, feat, -1).astype(np.int8)
    assign, centers, K = dp_means(feat, cfg)
    assert K >= 2
    # the two variant groups end in different clusters (majority-wise)
    a0 = np.bincount(assign[:30], minlength=K).argmax()
    a1 = np.bincount(assign[30:], minlength=K).argmax()
    assert a0 != a1


def test_dp_means_deterministic(cfg):
    rng = np.random.default_rng(1)
    feat = rng.integers(-1, 4, size=(50, 10)).astype(np.int8)
    a1, c1, k1 = dp_means(feat, cfg)
    a2, c2, k2 = dp_means(feat, cfg)
    assert k1 == k2
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(c1, c2)


def test_consensus_simple():
    # 3 reads, aligned diagonally, one disagreeing base
    q = np.array([[0, 1, 2], [0, 1, 2], [0, 3, 2]], np.int8)
    rc = np.array([[5, 6, 7], [5, 6, 7], [5, 6, 7]], np.int32)
    counts, span = cluster_pileup(q, rc, 12)
    seq, off = call_consensus(counts, span)
    assert decode_seq(seq) == "ACG"
    assert off == 5


def test_consensus_deletion_column():
    # two reads skip column 6 (deletion), one covers it
    q = np.array([[0, 1, 2], [0, 1, 2], [0, 3, 2]], np.int8)
    rc = np.array([[5, 7, 8], [5, 7, 8], [5, 6, 7]], np.int32)
    counts, span = cluster_pileup(q, rc, 12)
    seq, off = call_consensus(counts, span)
    # column 6: 1 base vs 2 deletions -> dropped
    assert decode_seq(seq) == "ACG" or len(seq) == 3


def test_polymorphic_cols_strictness(cfg):
    counts = np.zeros((10, 4), np.int32)
    counts[3] = [20, 1, 0, 0]    # 1 error: not polymorphic
    counts[5] = [12, 8, 0, 0]    # true variant: polymorphic
    counts[7] = [2, 2, 0, 0]     # too thin (minor < 4)
    poly = polymorphic_cols(counts, cfg)
    assert poly.tolist() == [5]


def test_assemble_end_to_end_smoke():
    cfg = PipelineConfig(max_assembly_iters=2)
    ds = simulate_dataset(
        n_species=3, refs_per_species=1, n_reads=400, seed=3,
        skewed_abundance=False,
    )
    tax = build_taxonomy_tables(ds.tax_parent, ds.tax_depth, ds.ref_taxon)
    res = assemble(ds.reads, ds.read_lens, ds.ref_seqs, ds.ref_lens, tax, cfg)
    assert len(res.genes) >= 3
    # genes must be near-full-length and map to true refs by k-mer containment
    def kmers(s, k=25):
        return set(s[i : i + k] for i in range(len(s) - k + 1))
    refk = [
        kmers(decode_seq(ds.ref_seqs[r, : ds.ref_lens[r]]))
        for r in range(ds.n_refs)
    ]
    hit = set()
    for g in res.genes:
        gk = kmers(decode_seq(g.seq))
        best = max(range(ds.n_refs), key=lambda r: len(gk & refk[r]))
        if len(gk & refk[best]) / max(len(gk), 1) > 0.9:
            hit.add(best)
    assert len(hit) >= 2
