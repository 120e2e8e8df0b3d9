"""Minor-haplotype (frequency phasing) rule tests: device twin semantics.

End-to-end oracle==device parity is covered by test_assembly_parity; these
pin the per-column qualification rules of
pipeline.consensus.minor_haplotype_leaves.
"""

import jax.numpy as jnp
import numpy as np

from rambl_tpu.config import PipelineConfig
from rambl_tpu.pipeline.consensus import minor_haplotype_leaves


def _counts(cols):
    """cols: list of (base -> count) dicts, one per column."""
    c = np.zeros((1, len(cols), 4), np.int32)
    for i, d in enumerate(cols):
        for b, n in d.items():
            c[0, i, b] = n
    return jnp.asarray(c)


def _span(c):
    return c.sum(axis=-1)


def test_skewed_minor_columns_flip():
    cfg = PipelineConfig()
    # backbone A everywhere; cols 1 and 3 carry a 7-deep C minor vs 25 A
    ex = _counts([{0: 32}, {0: 25, 1: 7}, {0: 32}, {0: 25, 1: 7}, {0: 32}])
    mh = minor_haplotype_leaves(ex, ex, _span(ex), cfg)
    assert int(mh.n_cols[0]) == 2
    assert int(mh.n_reads[0]) == 7
    assert np.asarray(mh.called)[0].tolist() == [0, 1, 0, 1, 0]
    assert np.asarray(mh.emit)[0].all()


def test_equal_abundance_gated_out():
    cfg = PipelineConfig()
    # 16/16 split: no frequency signal -> clustering owns it, not minorhap
    ex = _counts([{0: 32}, {0: 16, 1: 16}, {0: 16, 1: 16}, {0: 32}])
    mh = minor_haplotype_leaves(ex, ex, _span(ex), cfg)
    assert int(mh.n_cols[0]) == 0


def test_thin_minor_and_ambiguous_second_gated_out():
    cfg = PipelineConfig()
    ex = _counts([
        {0: 30, 1: cfg.minorhap_min_abs - 1},   # below absolute bar
        {0: 100, 1: 5},                          # 5% < 15% frac bar
        {0: 24, 1: 4, 2: 4},                     # tied second allele
        {0: 25, 1: 7},                           # the only qualifying col
    ])
    mh = minor_haplotype_leaves(ex, ex, _span(ex), cfg)
    assert int(mh.n_cols[0]) == 1    # < minorhap_min_cols -> host drops gene


def test_backbone_from_leaf_counts_not_exclusive():
    cfg = PipelineConfig()
    # exclusive counts qualify col 1; the BACKBONE call elsewhere must come
    # from the chain-merged leaf counts (shared reads included)
    ex = _counts([{0: 10}, {0: 25, 1: 7}, {0: 10}, {0: 25, 1: 7}])
    leaf = _counts([{2: 40}, {0: 25, 1: 7}, {2: 40}, {0: 25, 1: 7}])
    mh = minor_haplotype_leaves(ex, leaf, _span(leaf), cfg)
    assert np.asarray(mh.called)[0].tolist() == [2, 1, 2, 1]
