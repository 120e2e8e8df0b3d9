"""End-to-end parity: the device assembly == the oracle assembly, bitwise.

This is THE correctness gate (BASELINE.json:5 "identical assembled FASTA"):
the jitted pipeline (align, bin, pileup, DP-means, consensus, refinement)
must produce a byte-identical gene panel to the NumPy oracle.
"""

import numpy as np
import pytest

from rambl_tpu.config import PipelineConfig
from rambl_tpu.data.simulate import simulate_dataset
from rambl_tpu.index.taxonomy import build_taxonomy_tables
from rambl_tpu.oracle.pipeline import assemble as assemble_oracle
from rambl_tpu.oracle.pipeline import assemble_round as assemble_round_oracle
from rambl_tpu.pipeline.assemble import assemble_jax, assemble_round_jax


@pytest.fixture(scope="module")
def tiny():
    cfg = PipelineConfig(max_assembly_iters=2, batch_size=128)
    ds = simulate_dataset(
        n_species=3, refs_per_species=2, n_reads=400, seed=2,
        skewed_abundance=False,
    )
    tax = build_taxonomy_tables(ds.tax_parent, ds.tax_depth, ds.ref_taxon)
    return cfg, ds, tax


def test_round0_parity(tiny):
    cfg, ds, tax = tiny
    g_np, s_np = assemble_round_oracle(
        ds.reads, ds.read_lens, ds.ref_seqs, ds.ref_lens, tax, cfg, 0
    )
    g_jx, s_jx = assemble_round_jax(
        ds.reads, ds.read_lens, ds.ref_seqs, ds.ref_lens, tax, cfg, 0
    )
    assert len(g_np) == len(g_jx)
    for a, b in zip(g_np, g_jx):
        assert a.key() == b.key()
        assert (a.n_reads, a.leaf, a.cluster, a.taxon) == (
            b.n_reads, b.leaf, b.cluster, b.taxon)


def test_full_assembly_parity(tiny):
    cfg, ds, tax = tiny
    r_np = assemble_oracle(ds.reads, ds.read_lens, ds.ref_seqs, ds.ref_lens,
                           tax, cfg)
    r_jx = assemble_jax(ds.reads, ds.read_lens, ds.ref_seqs, ds.ref_lens,
                        tax, cfg)
    assert r_np.n_rounds == r_jx.n_rounds
    assert r_np.converged == r_jx.converged
    k_np = sorted(g.key() for g in r_np.genes)
    k_jx = sorted(g.key() for g in r_jx.genes)
    assert k_np == k_jx
