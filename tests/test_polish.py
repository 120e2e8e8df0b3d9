"""Polish pass unit tests (oracle.polish): override rules on synthetic votes.

The end-to-end oracle==device polish parity is covered by
tests/test_assembly_parity.py::test_full_assembly_parity (cfg.polish defaults
on); these tests pin the column-level override semantics and the NW-based
gene->anchor coordinate mapping (robust to interior emit holes).
"""

import numpy as np

from rambl_tpu.config import PipelineConfig
from rambl_tpu.oracle.pipeline import Gene
from rambl_tpu.oracle.polish import apply_polish


def mk_gene(seq, taxon=7, offset=0):
    return Gene(seq=np.asarray(seq, np.int8), n_reads=10, leaf=taxon,
                cluster=0, round_born=0, taxon=taxon, offset=offset)


def counts_for(seq, depth, ref_len):
    c = np.zeros((ref_len, 4), np.int32)
    c[np.arange(len(seq)), np.asarray(seq)] = depth
    return c


def anchors_for(seq, taxon=7):
    # anchor == the gene layout: NW maps gene base i -> column i
    return {taxon: np.asarray(seq, np.int8)}


def test_decisive_majority_overrides():
    cfg = PipelineConfig()
    g = mk_gene([0, 1, 2, 3])
    c = counts_for([0, 1, 2, 3], 10, 8)
    c[2] = 0
    c[2, 0] = 9          # unanimous A where the gene says G
    genes, changed = apply_polish([g], {7: c}, anchors_for([0, 1, 2, 3]), cfg)
    assert changed == 1
    assert genes[0].seq.tolist() == [0, 1, 0, 3]


def test_polymorphic_column_untouched():
    """A 2:1 variant column (minor >= count+frac thresholds) belongs to the
    clustering, not to polish - even though the major holds >= 2/3."""
    cfg = PipelineConfig()
    g = mk_gene([0, 1, 2, 3])
    c = counts_for([0, 1, 2, 3], 30, 8)
    c[2] = 0
    c[2, 0] = 20         # major A (2/3)...
    c[2, 2] = 10         # ...but G is a real 1/3 minor allele: keep gene's G
    genes, changed = apply_polish([g], {7: c}, anchors_for([0, 1, 2, 3]), cfg)
    assert changed == 0
    assert genes[0].seq.tolist() == [0, 1, 2, 3]


def test_thin_or_indecisive_votes_keep_base():
    cfg = PipelineConfig()
    g = mk_gene([0, 1, 2, 3])
    c = counts_for([0, 1, 2, 3], 10, 8)
    c[1] = 0
    c[1, 0] = cfg.polish_min_depth - 1        # too thin
    c[3] = 0
    c[3, 0] = 5
    c[3, 1] = 4                               # 5/9 < 2/3: indecisive
    genes, changed = apply_polish([g], {7: c}, anchors_for([0, 1, 2, 3]), cfg)
    assert changed == 0
    assert genes[0].seq.tolist() == [0, 1, 2, 3]


def test_unmapped_and_foreign_taxon_untouched():
    cfg = PipelineConfig()
    # g1's first base is an INSERTION relative to its 1-base anchor -> NW
    # maps it to -1 (unmapped: untouched); the second base maps to column 0
    g1 = mk_gene([0, 1], taxon=7)
    g2 = mk_gene([2, 3], taxon=9)             # no counts for taxon 9
    c = np.zeros((8, 4), np.int32)
    c[0, 3] = 10
    genes, changed = apply_polish(
        [g1, g2], {7: c}, {7: np.asarray([1], np.int8)}, cfg)
    assert changed == 1                       # only g1[1] flips to T
    assert genes[0].seq.tolist() == [0, 3]
    assert genes[1].seq.tolist() == [2, 3]


def test_substitution_only_invariants():
    cfg = PipelineConfig()
    g = mk_gene([0, 1, 2, 3], offset=2)
    c = np.zeros((8, 4), np.int32)
    c[2:6, 3] = 10
    genes, changed = apply_polish([g], {7: c}, anchors_for([0, 1, 2, 3]), cfg)
    assert genes[0].seq.shape == g.seq.shape
    assert genes[0].offset == g.offset
    assert genes[0].taxon == g.taxon


def test_interior_hole_coordinates():
    """A gene whose consensus dropped an INTERIOR column must still read the
    pileup at the true downstream columns (the round-1 offset+i contiguity
    bug shifted every base after the hole and polish corrupted the tail)."""
    import dataclasses

    cfg = dataclasses.replace(PipelineConfig(), polish_fill_holes=False)
    anchor = np.asarray([0, 1, 2, 3, 0, 1, 2, 3], np.int8)
    # gene = anchor with column 3 deleted (interior hole)
    g = mk_gene([0, 1, 2, 0, 1, 2, 3], offset=0)
    c = counts_for(anchor, 10, 8)
    # deep decisive disagreement at anchor column 6 (gene position 5)
    c[6] = 0
    c[6, 0] = 9
    genes, changed = apply_polish([g], {7: c}, {7: anchor}, cfg)
    assert changed == 1
    # gene pos 5 (anchor col 6) flips to A; everything else untouched
    assert genes[0].seq.tolist() == [0, 1, 2, 0, 1, 0, 3]


def test_hole_fill_from_pileup_and_anchor():
    """Interior emit holes fill from the exclusive pileup when deep, from the
    anchor reference otherwise; edge truncation extends to the full anchor
    span with the SAME rule (cfg.polish_extend_edges): deep decisive
    evidence wins, anchor base otherwise - the reference pipeline's
    candidates start as full-length DB refs, so its uncovered edges are
    reference bases by construction. Left extension shifts the offset."""
    import dataclasses

    cfg = PipelineConfig()
    assert cfg.polish_fill_holes and cfg.polish_extend_edges
    anchor = np.asarray([0, 1, 2, 3, 0, 1, 2, 3, 0, 1], np.int8)
    # gene = anchor cols 1..8 with interior cols 3 and 6 deleted
    g = mk_gene([1, 2, 0, 1, 3, 0], offset=1)
    c = counts_for(anchor, 10, 10)
    c[3] = 0
    c[3, 3] = 9           # deep pileup says T at the first hole
    c[6] = 0              # second hole has NO depth -> anchor base (2)

    # shallow edges: anchor-base extension (reference-guided)
    c_sh = c.copy()
    c_sh[0] = 0           # left edge col below polish_min_depth
    c_sh[9] = 0           # right edge col below polish_min_depth
    genes, changed = apply_polish([g], {7: c_sh}, {7: anchor}, cfg)
    assert genes[0].seq.tolist() == anchor.tolist()
    assert changed == 4   # 2 interior holes + 2 edge columns
    assert genes[0].offset == g.offset - 1

    # deep edges: pileup winner (here == anchor), offset shifts
    genes, changed = apply_polish([g], {7: c}, {7: anchor}, cfg)
    assert genes[0].seq.tolist() == anchor.tolist()
    assert changed == 4
    assert genes[0].offset == g.offset - 1

    # deep DISAGREEING edge evidence overrides the anchor base
    c_dis = c.copy()
    c_dis[0] = 0
    c_dis[0, 3] = 9       # deep unanimous T at left edge (anchor says A)
    genes, _ = apply_polish([g], {7: c_dis}, {7: anchor}, cfg)
    assert genes[0].seq.tolist() == [3] + anchor.tolist()[1:]

    # polymorphic/tied edge columns fall back to the anchor base
    c_poly = c.copy()
    c_poly[0] = 0
    c_poly[0, 2] = 6
    c_poly[0, 3] = 6      # tie + polymorphic -> anchor base (0), not 2/3
    genes, _ = apply_polish([g], {7: c_poly}, {7: anchor}, cfg)
    assert genes[0].seq.tolist() == anchor.tolist()

    # the flag turns edge extension off entirely
    cfg_off = dataclasses.replace(cfg, polish_extend_edges=False)
    genes, changed = apply_polish([g], {7: c}, {7: anchor}, cfg_off)
    assert genes[0].seq.tolist() == [1, 2, 3, 0, 1, 2, 3, 0]
    assert genes[0].offset == g.offset


def test_canonicalize_drops_unplaceable_and_fills_holes():
    """Gene positions with no anchor column (unplaceable insertions) are
    dropped while holes fill (pair found by NW search: one interior hole at
    col 3, two inserted bases mapping to -1): the canonical gene is exactly
    the anchor-column projection."""
    cfg = PipelineConfig()
    anchor = np.asarray([3, 2, 2, 1, 1, 0, 0, 0, 0, 3, 2, 3, 2, 2, 3, 2, 2,
                         2, 2, 3], np.int8)
    gseq = [3, 2, 2, 1, 0, 0, 0, 0, 3, 2, 3, 2, 2, 3, 2, 2, 0, 2, 2, 2, 3]
    from rambl_tpu.index.colmap import _nw_map

    m = _nw_map(anchor, np.asarray(gseq, np.int8))
    assert (m == -1).sum() == 2 and 3 not in m.tolist()   # scenario holds
    g = mk_gene(gseq, offset=0)
    c = np.zeros((20, 4), np.int32)   # thin everywhere -> anchor fill
    genes, changed = apply_polish([g], {7: c}, {7: anchor}, cfg)
    assert changed == 3               # 1 hole filled + 2 insertions dropped
    s = genes[0].seq.tolist()
    # every base now maps to a unique anchor column in order: cols 0..19
    # (hole col 3 filled with the anchor base 1, both -1 positions gone)
    assert s == anchor.tolist()


def test_nw_map_batch_parity():
    """colmap._nw_map_batch must be BITWISE equal to the sequential _nw_map
    on every pair - mixed lengths, indels, substitutions, empty-ish and
    identical pairs, across chunk boundaries (tiny budget forces many
    chunks, exercising the int16 fast path and the chunking logic)."""
    from rambl_tpu.index.colmap import _nw_map, _nw_map_batch

    rng = np.random.default_rng(7)
    pairs = []
    for t in range(40):
        La = int(rng.integers(5, 220))
        a = rng.integers(0, 4, La).astype(np.int8)
        b = a.copy()
        # substitutions
        for _ in range(int(rng.integers(0, 8))):
            b[rng.integers(0, b.shape[0])] = rng.integers(0, 4)
        # indels
        for _ in range(int(rng.integers(0, 4))):
            p = int(rng.integers(0, b.shape[0]))
            if rng.random() < 0.5:
                b = np.delete(b, p)
            else:
                b = np.insert(b, p, rng.integers(0, 4))
        pairs.append((a, b.astype(np.int8)))
    pairs.append((pairs[0][0], pairs[0][0].copy()))      # identical
    pairs.append((pairs[1][0], pairs[1][0][:3].copy()))  # tiny b
    a_list = [p[0] for p in pairs]
    b_list = [p[1] for p in pairs]
    # numpy fallback path (tiny budget -> many chunks)
    batch = _nw_map_batch(a_list, b_list, budget_bytes=64 << 10,
                          native=False)
    for (a, b), m in zip(pairs, batch):
        np.testing.assert_array_equal(_nw_map(a, b), m)
    # native C++ path (skips silently to the same fallback if unbuildable)
    nat = _nw_map_batch(a_list, b_list)
    for m1, m2 in zip(batch, nat):
        np.testing.assert_array_equal(m1, m2)

    # long pair near the int16 guard bound
    a = rng.integers(0, 4, 2048).astype(np.int8)
    b = np.delete(a, [5, 900, 1500]).astype(np.int8)
    (m_long,) = _nw_map_batch([a], [b], native=False)
    np.testing.assert_array_equal(_nw_map(a, b), m_long)
    (m_nat,) = _nw_map_batch([a], [b])
    np.testing.assert_array_equal(_nw_map(a, b), m_nat)
