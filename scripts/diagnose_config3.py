"""Classify the config-3 misses (VERDICT r4 weak #6 / next-round #5).

Loads the panel dumped by run_config3.py (/tmp/config3_genes.pkl) plus the
dataset cache and, for every detectable-but-missed reference, reports what
the panel DOES hold for its taxon: best gene containment, wrong-base count
and positions (via the exact NW map onto the ref), gene length vs ref
length, and the sibling-strain containment (is the miss a phasing error -
the gene matches the OTHER strain of the same species?).

  PYTHONPATH=/root/repo python scripts/diagnose_config3.py
"""

import pickle
import sys
from collections import Counter

import numpy as np

from rambl_tpu.config import PipelineConfig
from rambl_tpu.index.colmap import _nw_map_batch
from rambl_tpu.io.pack import decode_seq


def kmers(s, k=25):
    return set(s[i: i + k] for i in range(len(s) - k + 1))


def main():
    genes_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/config3_genes.pkl"
    with open(genes_path, "rb") as f:
        st = pickle.load(f)
    genes, recovered, detectable = st["genes"], st["recovered"], st["detectable"]
    k = PipelineConfig().k
    cache = f"/tmp/config3_cache_10000000_100000_k{k}_v2_seed13.pkl"
    with open(cache, "rb") as f:
        ds, _ = pickle.load(f)

    missed = [int(r) for r in detectable if int(r) not in recovered]
    print(f"{len(missed)} missed / {detectable.size} detectable", flush=True)
    by_taxon = {}
    for g in genes:
        by_taxon.setdefault(int(g.taxon), []).append(g)
    # ref -> taxon (leaf_per_ref: identity-ish, but use the mapping)
    ref_taxon = np.asarray(ds.ref_taxon)

    classes = Counter()
    rows = []
    nw_jobs = []
    for r in missed:
        t = int(ref_taxon[r])
        ref = np.asarray(ds.ref_seqs[r, : ds.ref_lens[r]])
        refk = kmers(decode_seq(ref))
        cands = by_taxon.get(t, [])
        if not cands:
            classes["no-gene-for-taxon"] += 1
            rows.append((r, t, None, 0.0, None))
            continue
        best, cont = None, -1.0
        for g in cands:
            gk = kmers(decode_seq(g.seq))
            c = len(gk & refk) / max(len(gk), 1)
            if c > cont:
                best, cont = g, c
        rows.append((r, t, best, cont, ref))
        nw_jobs.append((len(rows) - 1, ref, best.seq))

    maps = _nw_map_batch([j[1] for j in nw_jobs], [j[2] for j in nw_jobs])
    for (i, ref, gseq), m in zip(nw_jobs, maps):
        r, t, best, cont, _ = rows[i]
        ok = m >= 0
        aligned = int(ok.sum())
        wrong = int((ref[np.clip(m, 0, len(ref) - 1)][ok]
                     != gseq[ok]).sum())
        unmapped = int((~ok).sum())
        span = (int(m[ok].min()), int(m[ok].max())) if aligned else (0, 0)
        short = len(ref) - (span[1] - span[0] + 1)
        if cont > 0.90:
            cls = "near-miss(>.90)"
        elif wrong <= 8 and short < 100:
            cls = "few-wrong-bases"
        elif short >= 100:
            cls = "short/truncated"
        else:
            cls = "many-wrong-bases"
        classes[cls] += 1
        print(f"ref {r} taxon {t}: cont {cont:.3f} len(g)={len(gseq)} "
              f"len(ref)={len(ref)} wrong={wrong} ins={unmapped} "
              f"missing_span={short} reads={best.n_reads} "
              f"cluster={best.cluster} born={best.round_born} [{cls}]",
              flush=True)
    print("\nclass counts:", dict(classes), flush=True)


if __name__ == "__main__":
    main()
