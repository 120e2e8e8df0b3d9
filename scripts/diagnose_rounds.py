"""Track per-ref best containment ROUND BY ROUND to locate where errors enter.

Replicates oracle.pipeline.assemble's loop, scoring the panel after each round.

Usage: python scripts/diagnose_rounds.py [scenario ...]
"""

import sys

import numpy as np

from rambl_tpu.config import PipelineConfig
from rambl_tpu.data.simulate import simulate_dataset
from rambl_tpu.index.taxonomy import build_taxonomy_tables
from rambl_tpu.io.pack import decode_seq
from rambl_tpu.oracle.pipeline import assemble_round, pad_panel, panel_tables

from diagnose_quality import SCENARIOS, kmers


def score_panel(genes, ds, refk, detectable):
    best = {int(r): (0.0, -1) for r in detectable}
    for gi, g in enumerate(genes):
        gk = kmers(decode_seq(g.seq))
        b = max(range(ds.n_refs), key=lambda r: len(gk & refk[r]))
        c = len(gk & refk[b]) / max(len(gk), 1)
        if b in best and c > best[b][0]:
            best[b] = (c, gi)
    return best


def main():
    names = sys.argv[1:] or list(SCENARIOS)
    cfg = PipelineConfig(max_assembly_iters=4, batch_size=512)
    for name in names:
        ds = simulate_dataset(**SCENARIOS[name])
        tax = build_taxonomy_tables(ds.tax_parent, ds.tax_depth, ds.ref_taxon)
        refk = [kmers(decode_seq(ds.ref_seqs[r, : ds.ref_lens[r]]))
                for r in range(ds.n_refs)]
        cov = np.bincount(ds.true_ref, minlength=ds.n_refs) * 100 / ds.ref_lens
        detectable = np.nonzero(cov >= 5)[0]
        print(f"=== {name} ===")
        genes, stats = assemble_round(
            ds.reads, ds.read_lens, ds.ref_seqs, ds.ref_lens, tax, cfg, 0)
        hist = {int(r): [] for r in detectable}
        best = score_panel(genes, ds, refk, detectable)
        for r in detectable:
            hist[int(r)].append(best[int(r)])
        for it in range(1, cfg.max_assembly_iters):
            if not genes:
                break
            pseqs, plens = pad_panel(genes, ds.ref_seqs.shape[1])
            ptab = panel_tables(genes, tax)
            panel_bits = max(
                8, int(np.ceil(np.log2(2 * cfg.max_genes * cfg.ref_len_max + 1))))
            genes, stats = assemble_round(
                ds.reads, ds.read_lens, pseqs, plens, ptab, cfg, it,
                n_bits=panel_bits)
            best = score_panel(genes, ds, refk, detectable)
            for r in detectable:
                hist[int(r)].append(best[int(r)])
        for r in detectable:
            row = " ".join(f"{c:.3f}/g{gi}" for c, gi in hist[int(r)])
            print(f"  ref {int(r):2d} cov {cov[r]:4.0f}x: {row}")


if __name__ == "__main__":
    main()
