"""Cohort covariation phasing (config 4): unit + end-to-end + parity tests.

The statistical contract: strains whose single-sample allele frequencies
overlap (the measured config-2 wall) separate via cross-sample frequency
VECTORS. All arithmetic integer/exact (Fractions) - see oracle/cohort.py.
"""

import dataclasses

import numpy as np
import pytest

from rambl_tpu.config import PipelineConfig
from rambl_tpu.data.simulate import simulate_cohort
from rambl_tpu.index.taxonomy import build_taxonomy_tables
from rambl_tpu.oracle.cohort import (
    assemble_cohort as oracle_cohort,
    cohort_genes_for_leaf,
    cohort_phase,
    phase_columns,
    qualifying_columns,
)


def _cfg(**kw):
    return PipelineConfig(**kw)


# --------------------------------------------------------------------------
# phase_columns: clustering of frequency vectors
# --------------------------------------------------------------------------

def test_phase_columns_separates_covarying_strains():
    # two strains with distinct per-sample abundance vectors; frequencies
    # overlap within every single sample (the wall shape)
    rng = np.random.default_rng(0)
    fA = np.array([0.30, 0.10, 0.45, 0.25])
    fB = np.array([0.40, 0.35, 0.15, 0.30])      # |fA-fB| <= .3 everywhere
    t = rng.poisson(60, size=(12, 4)).astype(np.int64)
    owners = np.array([0] * 6 + [1] * 6)
    f = np.where(owners[:, None] == 0, fA, fB)
    m = rng.binomial(t, f)
    assign = phase_columns(m, t, _cfg())
    # same-strain columns together, cross-strain apart
    assert len(set(assign[:6])) == 1
    assert len(set(assign[6:])) == 1
    assert assign[0] != assign[6]


def test_phase_columns_single_sample_cannot_separate():
    # with ONE sample the same frequencies are indistinguishable -> one group
    # (the measured single-sample limit, SURVEY.md section 8)
    rng = np.random.default_rng(1)
    t = rng.poisson(60, size=(12, 1)).astype(np.int64)
    owners = np.arange(12) < 6
    f = np.where(owners[:, None], 0.30, 0.38)
    m = rng.binomial(t, f)
    assign = phase_columns(m, t, _cfg())
    # noise may split off single columns, but no grouping aligned with the
    # true strains can emerge: the largest group must mix both strains
    counts = np.bincount(assign)
    big = int(np.argmax(counts))
    assert owners[assign == big].any() and (~owners[assign == big]).any()


def test_phase_columns_deterministic_and_renumbered():
    rng = np.random.default_rng(2)
    t = rng.poisson(50, size=(9, 3)).astype(np.int64)
    m = rng.binomial(t, 0.3)
    a1 = phase_columns(m, t, _cfg())
    a2 = phase_columns(m.copy(), t.copy(), _cfg())
    np.testing.assert_array_equal(a1, a2)
    assert a1[0] == 0                       # renumbered by first appearance
    assert a1.max() + 1 == len(set(a1.tolist()))


def test_phase_columns_zero_depth_samples_ignored():
    # a sample with zero depth everywhere must not poison the distances
    t = np.array([[50, 0], [55, 0], [60, 0]], np.int64)
    m = np.array([[15, 0], [17, 0], [19, 0]], np.int64)
    assign = phase_columns(m, t, _cfg())
    assert len(set(assign.tolist())) == 1


# --------------------------------------------------------------------------
# qualifying_columns
# --------------------------------------------------------------------------

def test_qualifying_columns_pooled_thresholds():
    cfg = _cfg()
    L = 32
    stack = np.zeros((2, L, 4), np.int64)
    stack[:, :, 0] = 30                     # depth 60 pooled, all base A
    stack[0, 3, 0], stack[0, 3, 1] = 20, 10  # col 3: pooled minor C = 18
    stack[1, 3, 0], stack[1, 3, 1] = 22, 8
    stack[0, 7, 2] = 2                      # col 7: pooled minor G = 3 < min_abs
    stack[1, 7, 2] = 1
    cols, b1, b2, m, t = qualifying_columns(stack, cfg)
    assert cols.tolist() == [3]
    assert b1[0] == 0 and b2[0] == 1
    assert m.tolist() == [[10, 8]]
    assert t.tolist() == [[30, 30]]        # per-sample depth at the column


def test_qualifying_columns_majority_alleles_excluded():
    # an allele above 1/2 pooled is not "minor": the column's minor is the
    # complement side (tested via 2*minor <= tot gate)
    cfg = _cfg()
    stack = np.zeros((2, 8, 4), np.int64)
    stack[:, :, 0] = 20
    stack[0, 2] = [10, 40, 0, 0]            # pooled: A 30, C 50 -> C major
    stack[1, 2] = [20, 10, 0, 0]
    cols, b1, b2, m, t = qualifying_columns(stack, cfg)
    assert 2 in cols.tolist()               # minor = A (30/110), qualifies
    i = cols.tolist().index(2)
    assert b1[i] == 1 and b2[i] == 0


# --------------------------------------------------------------------------
# emission: reversion / complemented-dominant handling
# --------------------------------------------------------------------------

def _leaf_fixture(dom_share):
    """Anchor=all-A leaf, strain D with private T alleles at cols 4..7 and
    share dom_share per sample, strain S with private C alleles at cols
    10..13 and share 0.2/0.3/0.25."""
    L = 40
    S = 3
    shares_d = np.array([dom_share] * S)
    shares_s = np.array([0.20, 0.30, 0.25])
    depth = 200
    stack = np.zeros((S, L, 4), np.int64)
    stack[:, :, 0] = depth
    for c in range(4, 8):     # dominant's columns: allele T(3)
        for j in range(S):
            md = int(depth * shares_d[j])
            stack[j, c, 0] = depth - md
            stack[j, c, 3] = md
    for c in range(10, 14):   # minor strain's columns: allele C(1)
        for j in range(S):
            ms = int(depth * shares_s[j])
            stack[j, c, 0] = depth - ms
            stack[j, c, 1] = ms
    anchor = np.zeros(L, np.int8)           # all A
    from rambl_tpu.oracle.pipeline import Gene

    backbone = Gene(seq=anchor.copy(), n_reads=100, leaf=1, cluster=0,
                    round_born=0, taxon=1, offset=0)
    return stack, anchor, backbone


def test_emission_minor_dominant():
    # dominant share < 1/2: its alleles are pooled-minor; both strains emit
    stack, anchor, backbone = _leaf_fixture(dom_share=0.40)
    out = cohort_genes_for_leaf(stack, backbone, anchor, _cfg())
    seqs = {bytes(s.tobytes()): sup for s, off, sup, g in out}
    dom = anchor.copy(); dom[4:8] = 3
    mino = anchor.copy(); mino[10:14] = 1
    assert dom.tobytes() in seqs
    assert mino.tobytes() in seqs
    # minor gene must NOT carry the dominant's alleles
    for s, off, sup, g in out:
        assert not (np.any(s[4:8] == 3) and np.any(s[10:14] == 1))


def test_emission_reversion_dominant_over_half():
    # dominant share > 1/2 pooled: its allele becomes the pooled MAJOR, the
    # anchor base is the minor (a REVERSION group). The minor strain's gene
    # must carry the anchor base at the dominant's columns, not the
    # dominant's private allele (the chimera this logic exists to prevent).
    stack, anchor, backbone = _leaf_fixture(dom_share=0.60)
    out = cohort_genes_for_leaf(stack, backbone, anchor, _cfg())
    mino = anchor.copy(); mino[10:14] = 1     # true minor strain sequence
    seqs = [s.tobytes() for s, off, sup, g in out]
    assert mino.tobytes() in seqs
    # no emitted gene is the chimera (dominant's alleles + minor's alleles);
    # the dominant itself is the pooled majority and is the per-sample
    # assembly's job, not phasing's
    for s, off, sup, g in out:
        assert not (np.any(s[4:8] == 3) and np.any(s[10:14] == 1))


# --------------------------------------------------------------------------
# cohort_phase plumbing
# --------------------------------------------------------------------------

def test_cohort_phase_single_sample_noop():
    from rambl_tpu.oracle.pipeline import Gene

    g = Gene(seq=np.zeros(30, np.int8), n_reads=10, leaf=1, cluster=0,
             round_born=0, taxon=1)
    out = cohort_phase([[g]], [{1: np.zeros((30, 4), np.int64)}],
                       {1: np.zeros(30, np.int8)}, _cfg())
    assert len(out) == 1 and len(out[0]) == 1


def test_cohort_phase_dedupes_against_panel():
    stack, anchor, backbone = _leaf_fixture(dom_share=0.40)
    cfg = _cfg()
    counts = [{1: stack[j]} for j in range(3)]
    out = cohort_phase([[backbone]] * 3, counts, {1: anchor}, cfg)
    for j in range(3):
        keys = [g.key() for g in out[j]]
        assert len(keys) == len(set(keys))


# --------------------------------------------------------------------------
# end-to-end: oracle quality + oracle/device parity
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def small_cohort():
    """Small parity scenario + the oracle/device results computed ONCE
    (the oracle cohort run dominates this file's CPU cost)."""
    from rambl_tpu.pipeline.assemble import assemble_cohort as device_cohort

    co = simulate_cohort(n_species=2, refs_per_species=3, n_samples=3,
                         reads_per_sample=800, seed=5)
    tax = build_taxonomy_tables(co.ds.tax_parent, co.ds.tax_depth,
                                co.ds.ref_taxon)
    cfg = PipelineConfig(max_assembly_iters=2, batch_size=512, max_genes=32)
    res_o = oracle_cohort(co.samples, co.ds.ref_seqs, co.ds.ref_lens, tax, cfg)
    res_d = device_cohort(co.samples, co.ds.ref_seqs, co.ds.ref_lens, tax, cfg)
    return co, tax, cfg, res_o, res_d


def _containments(ds, results):
    from rambl_tpu.io.pack import decode_seq

    def kmers(s, k=25):
        return set(s[i: i + k] for i in range(len(s) - k + 1))

    refk = [kmers(decode_seq(ds.ref_seqs[r, : ds.ref_lens[r]]))
            for r in range(ds.n_refs)]
    best = np.zeros(ds.n_refs)
    for res in results:
        for g in res.genes:
            gk = kmers(decode_seq(g.seq))
            r = max(range(ds.n_refs), key=lambda x: len(gk & refk[x]))
            best[r] = max(best[r], len(gk & refk[r]) / max(len(gk), 1))
    return best


def test_cohort_phasing_improves_recovery():
    # the wall shape where a strain recovers ONLY through covariation
    # phasing (device path; off vs on, same reads)
    from rambl_tpu.pipeline.assemble import assemble_cohort as device_cohort

    co = simulate_cohort(n_species=2, refs_per_species=3, n_samples=4,
                         reads_per_sample=1200, seed=5)
    ds = co.ds
    tax = build_taxonomy_tables(ds.tax_parent, ds.tax_depth, ds.ref_taxon)
    cfg = PipelineConfig(max_assembly_iters=3, batch_size=512, max_genes=32)
    res_off = device_cohort(co.samples, ds.ref_seqs, ds.ref_lens, tax,
                            dataclasses.replace(cfg, cohort_phase=False))
    res_on = device_cohort(co.samples, ds.ref_seqs, ds.ref_lens, tax, cfg)
    off = (_containments(ds, res_off) > 0.95).sum()
    on = (_containments(ds, res_on) > 0.95).sum()
    assert on > off
    assert on == ds.n_refs                  # this scenario fully recovers


def test_cohort_oracle_device_parity(small_cohort):
    co, tax, cfg, res_o, res_d = small_cohort
    assert any(g.round_born == -1 for r in res_o for g in r.genes), \
        "scenario must exercise phased-gene emission"
    for a, b in zip(res_o, res_d):
        ka = [(g.key(), g.n_reads, g.taxon, g.cluster) for g in a.genes]
        kb = [(g.key(), g.n_reads, g.taxon, g.cluster) for g in b.genes]
        assert ka == kb


def test_cohort_device_mesh_parity(small_cohort):
    # full cohort (assembly + phasing) on the 8-device CPU mesh == single
    from rambl_tpu.parallel.mesh import data_mesh
    from rambl_tpu.pipeline.assemble import assemble_cohort as device_cohort

    co, tax, cfg, _, res_d = small_cohort
    ds = co.ds
    res_m = device_cohort(co.samples, ds.ref_seqs, ds.ref_lens, tax, cfg,
                          mesh=data_mesh(8))
    for a, b in zip(res_d, res_m):
        ka = [(g.key(), g.n_reads, g.taxon, g.cluster) for g in a.genes]
        kb = [(g.key(), g.n_reads, g.taxon, g.cluster) for g in b.genes]
        assert ka == kb
