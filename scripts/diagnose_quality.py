"""Diagnose residual consensus errors behind quality_bench near-misses.

For each detectable ref in a scenario, aligns the best-matching assembled gene
to the truth sequence (exact NW) and classifies every discrepant column:
  - substitution vs indel;
  - truth-read depth at the column (how many simulated reads actually cover it);
  - whether the column distinguishes the ref from its sibling strain (a
    polymorphic strain column) or is backbone;
  - what base the gene called vs truth.

Usage: python scripts/diagnose_quality.py [scenario-name ...]
"""

import sys

import numpy as np

from rambl_tpu.config import PipelineConfig
from rambl_tpu.data.simulate import simulate_dataset
from rambl_tpu.index.colmap import _nw_map
from rambl_tpu.index.taxonomy import build_taxonomy_tables
from rambl_tpu.io.pack import decode_seq
from rambl_tpu.oracle.pipeline import assemble

SCENARIOS = {
    "uniform-2strain": dict(n_species=5, refs_per_species=2, n_reads=1500,
                            seed=1, skewed_abundance=False),
    "skewed-2strain": dict(n_species=5, refs_per_species=2, n_reads=1500,
                           seed=2, skewed_abundance=True),
    "single-strain": dict(n_species=8, refs_per_species=1, n_reads=2000,
                          seed=3, skewed_abundance=False),
    "deep-uniform": dict(n_species=3, refs_per_species=1, n_reads=3000,
                         seed=4, skewed_abundance=False),
}

BASES = "ACGTN"


def kmers(s, k=25):
    return set(s[i: i + k] for i in range(len(s) - k + 1))


def truth_depth(ds, ref, read_len=100):
    """Per-column depth from reads truly simulated from `ref`."""
    L = int(ds.ref_lens[ref])
    depth = np.zeros(L, np.int32)
    for i in np.nonzero(ds.true_ref == ref)[0]:
        p = int(ds.true_pos[i])
        depth[p: p + read_len] += 1
    return depth


def main():
    names = sys.argv[1:] or list(SCENARIOS)
    cfg = PipelineConfig(max_assembly_iters=4, batch_size=512)
    for name in names:
        ds = simulate_dataset(**SCENARIOS[name])
        tax = build_taxonomy_tables(ds.tax_parent, ds.tax_depth, ds.ref_taxon)
        res = assemble(ds.reads, ds.read_lens, ds.ref_seqs, ds.ref_lens, tax, cfg)
        refk = [kmers(decode_seq(ds.ref_seqs[r, : ds.ref_lens[r]]))
                for r in range(ds.n_refs)]
        cov = np.bincount(ds.true_ref, minlength=ds.n_refs) * 100 / ds.ref_lens
        detectable = np.nonzero(cov >= 5)[0]
        print(f"=== {name}: {len(res.genes)} genes, rounds {res.n_rounds} ===")
        # best gene per ref
        best_gene = {}
        for gi, g in enumerate(res.genes):
            gk = kmers(decode_seq(g.seq))
            best = max(range(ds.n_refs), key=lambda r: len(gk & refk[r]))
            c = len(gk & refk[best]) / max(len(gk), 1)
            if best not in best_gene or c > best_gene[best][0]:
                best_gene[best] = (c, gi)
        for r in detectable:
            r = int(r)
            if r not in best_gene:
                print(f"  ref {r} ({ds.ref_names[r]}) cov {cov[r]:.0f}x: NO GENE")
                continue
            c, gi = best_gene[r]
            if c > 0.95:
                print(f"  ref {r} ({ds.ref_names[r]}) cov {cov[r]:.0f}x: ok "
                      f"cont {c:.3f}")
                continue
            g = res.genes[gi]
            ref = ds.ref_seqs[r, : ds.ref_lens[r]]
            # map gene positions onto ref positions
            m = _nw_map(ref, g.seq)
            depth = truth_depth(ds, r)
            # sibling strain (same species prefix)
            sp = ds.ref_names[r].split("_")[0]
            sib = [j for j in range(ds.n_refs)
                   if j != r and ds.ref_names[j].startswith(sp + "_")]
            sib_seq = ds.ref_seqs[sib[0], : ds.ref_lens[sib[0]]] if sib else None
            sib_map = _nw_map(ref, sib_seq) if sib_seq is not None else None
            sib_base = np.full(len(ref), -1, np.int8)
            if sib_map is not None:
                okm = sib_map >= 0
                sib_base[sib_map[okm]] = sib_seq[okm]
            print(f"  ref {r} ({ds.ref_names[r]}) cov {cov[r]:.0f}x: MISS "
                  f"cont {c:.3f} gene len {len(g.seq)} (gene #{gi}, "
                  f"leaf {g.leaf} clus {g.cluster} n_reads {g.n_reads} "
                  f"off {g.offset})")
            # coverage of ref positions by the gene
            covered = np.zeros(len(ref), bool)
            okm = m >= 0
            covered[m[okm]] = True
            nsub = 0
            for gp in range(len(g.seq)):
                rp = m[gp]
                if rp < 0:
                    print(f"    gene[{gp}] INSERTION base {BASES[g.seq[gp]]} "
                          f"(between ref {m[:gp][m[:gp]>=0][-1] if (m[:gp]>=0).any() else -1}..)")
                    continue
                if g.seq[gp] != ref[rp]:
                    nsub += 1
                    tag = ("STRAIN-COL" if sib_base[rp] >= 0
                           and sib_base[rp] != ref[rp] else "backbone")
                    sibinfo = (f" sib={BASES[sib_base[rp]]}"
                               if sib_base[rp] >= 0 else "")
                    called_sib = (sib_base[rp] >= 0
                                  and g.seq[gp] == sib_base[rp])
                    print(f"    ref[{rp}] SUB truth {BASES[ref[rp]]} -> called "
                          f"{BASES[g.seq[gp]]}{sibinfo} depth {depth[rp]} "
                          f"{tag}{' (=sibling base!)' if called_sib else ''}")
            # deletions: ref positions inside gene span not covered
            lo = int(m[okm].min()) if okm.any() else 0
            hi = int(m[okm].max()) if okm.any() else -1
            ndel = 0
            for rp in range(lo, hi + 1):
                if not covered[rp]:
                    ndel += 1
                    tag = ("STRAIN-COL" if sib_base[rp] >= 0
                           and sib_base[rp] != ref[rp] else "backbone")
                    print(f"    ref[{rp}] DELETED truth {BASES[ref[rp]]} "
                          f"depth {depth[rp]} {tag}")
            miss_head = lo
            miss_tail = len(ref) - 1 - hi
            print(f"    -> {nsub} subs, {ndel} dels, uncovered ends "
                  f"head {miss_head} tail {miss_tail}")


if __name__ == "__main__":
    main()
