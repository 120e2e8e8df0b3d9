"""Polish pass unit tests (oracle.polish): override rules on synthetic votes.

The end-to-end oracle==device polish parity is covered by
tests/test_assembly_parity.py::test_full_assembly_parity (cfg.polish defaults
on); these tests pin the column-level override semantics.
"""

import numpy as np

from rambl_tpu.config import PipelineConfig
from rambl_tpu.oracle.pipeline import Gene
from rambl_tpu.oracle.polish import apply_polish


def mk_gene(seq, taxon=7, offset=0):
    return Gene(seq=np.asarray(seq, np.int8), n_reads=10, leaf=taxon,
                cluster=0, round_born=0, taxon=taxon, offset=offset)


def identity_cmap(n_genes, ref_len):
    return np.broadcast_to(
        np.arange(ref_len, dtype=np.int32), (n_genes, ref_len)).copy()


def counts_for(seq, depth, ref_len):
    c = np.zeros((ref_len, 4), np.int32)
    c[np.arange(len(seq)), np.asarray(seq)] = depth
    return c


def test_decisive_majority_overrides():
    cfg = PipelineConfig()
    g = mk_gene([0, 1, 2, 3])
    c = counts_for([0, 1, 2, 3], 10, 8)
    c[2] = 0
    c[2, 0] = 9          # unanimous A where the gene says G
    genes, changed = apply_polish([g], {7: c}, identity_cmap(1, 8), cfg)
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
    genes, changed = apply_polish([g], {7: c}, identity_cmap(1, 8), cfg)
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
    genes, changed = apply_polish([g], {7: c}, identity_cmap(1, 8), cfg)
    assert changed == 0
    assert genes[0].seq.tolist() == [0, 1, 2, 3]


def test_unmapped_and_foreign_taxon_untouched():
    cfg = PipelineConfig()
    g1 = mk_gene([0, 1], taxon=7)
    g2 = mk_gene([2, 3], taxon=9)             # no counts for taxon 9
    cmap = identity_cmap(2, 8).copy()
    cmap[0, 1] = -1                           # unmapped column
    c = np.zeros((8, 4), np.int32)
    c[0, 3] = 10
    c[1, 3] = 10
    genes, changed = apply_polish([g1, g2], {7: c}, cmap, cfg)
    assert changed == 1                       # only g1[0] flips to T
    assert genes[0].seq.tolist() == [3, 1]
    assert genes[1].seq.tolist() == [2, 3]


def test_substitution_only_invariants():
    cfg = PipelineConfig()
    g = mk_gene([0, 1, 2, 3], offset=2)
    c = np.zeros((8, 4), np.int32)
    c[2:6, 3] = 10
    cmap = identity_cmap(1, 8)
    genes, changed = apply_polish([g], {7: c}, cmap, cfg)
    assert genes[0].seq.shape == g.seq.shape
    assert genes[0].offset == g.offset
    assert genes[0].taxon == g.taxon
